"""Sliding-window attention (Mistral-style) — fwd + grad parity vs naive.

North-star extension: no reference counterpart (the reference's masking
features are causal/kpad/pair only, attention.jl:59-79). Window semantics:
q_pos - k_pos < window, self included, always combined with causal.
"""

import jax
import jax.numpy as jnp
import pytest

from nnop_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_chunked,
)
from nnop_tpu.ops import naive


def _mk(B, QH, KH, QL, KL, E, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (B, QH, QL, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, KH, KL, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, KH, KL, E), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("window", [1, 17, 64, 200, 10_000])
def test_window_fwd(window):
    q, k, v = _mk(2, 2, 2, 256, 256, 32)
    o = flash_attention(q, k, v, causal=True, window=window)
    on = naive.naive_attention(q, k, v, causal=True, window=window)
    assert jnp.allclose(o, on, atol=2e-3, rtol=2e-3), (
        jnp.abs(o - on).max()
    )


def test_window_equals_causal_when_large():
    q, k, v = _mk(1, 2, 2, 257, 257, 32, seed=1)
    o_w = flash_attention(q, k, v, causal=True, window=257)
    o_c = flash_attention(q, k, v, causal=True)
    assert jnp.allclose(o_w, o_c, atol=1e-5)


@pytest.mark.parametrize("QL", [255, 512])
def test_window_gqa_ragged(QL):
    q, k, v = _mk(2, 4, 2, QL, QL, 32, seed=2)
    o = flash_attention(q, k, v, causal=True, window=100)
    on = naive.naive_attention(q, k, v, causal=True, window=100)
    assert jnp.allclose(o, on, atol=2e-3, rtol=2e-3)


def test_window_with_kpad():
    q, k, v = _mk(2, 2, 2, 256, 256, 32, seed=3)
    kpad = jnp.arange(256)[None, :] < jnp.array([200, 256])[:, None]
    o = flash_attention(q, k, v, causal=True, window=90, kpad_mask=kpad)
    on = naive.naive_attention(
        q, k, v, causal=True, window=90, kpad_mask=kpad
    )
    assert jnp.allclose(o, on, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("window", [33, 128])
def test_window_grads(window):
    q, k, v = _mk(1, 2, 1, 256, 256, 32, seed=4)

    def loss_fused(q, k, v):
        return flash_attention(q, k, v, causal=True, window=window).sum()

    def loss_naive(q, k, v):
        return naive.naive_attention(
            q, k, v, causal=True, window=window
        ).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gn, "qkv"):
        assert jnp.allclose(a, b, atol=2e-2, rtol=2e-3), (
            name,
            jnp.abs(a - b).max(),
        )


def test_window_chunked_prefill():
    """Chunked prefill with a window must match one-shot windowed attention
    on the rows the chunk covers."""
    B, H, L, E, W = 1, 2, 384, 32, 100
    q, k, v = _mk(B, H, H, L, L, E, seed=5)
    full = naive.naive_attention(q, k, v, causal=True, window=W)
    off = 256
    chunk = flash_attention_chunked(
        q[:, :, off:, :], k, v, causal_offset=off, window=W
    )
    assert jnp.allclose(chunk, full[:, :, off:, :], atol=2e-3, rtol=2e-3)


def test_window_requires_causal():
    q, k, v = _mk(1, 1, 1, 128, 128, 32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, causal=False, window=8)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, causal=True, window=0)


# ---------------- decode kernels: the query is the LAST live key --------


def _naive_window_decode(q, k, v, lengths, window):
    """Oracle: key col c is live iff total-window <= c < total, where
    total = lengths[b] (the query token is key total-1)."""
    import numpy as np

    S = k.shape[2]
    cols = jnp.arange(S)[None, :]
    mask = jnp.logical_and(
        cols < lengths[:, None], cols >= lengths[:, None] - window
    )
    return naive.naive_attention(q, k, v, kpad_mask=mask)


@pytest.mark.parametrize("window", [16, 100, 4096])
def test_window_decode(window):
    from nnop_tpu.ops.attention_decode import decode_attention

    ks = jax.random.split(jax.random.key(7), 4)
    B, QH, KH, S, E = 3, 8, 2, 320, 64
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, KH, S, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, KH, S, E), jnp.float32)
    lengths = jnp.array([S, 130, 1], jnp.int32)
    got = decode_attention(q, k, v, lengths, window=window)
    want = _naive_window_decode(q, k, v, lengths, window)
    assert jnp.allclose(got, want, atol=1e-3, rtol=1e-3), (
        jnp.abs(got - want).max()
    )


def test_window_decode_staged():
    """Window straddling the staging buffer: flushed cache cols die first."""
    from nnop_tpu.ops.attention_decode import decode_attention

    ks = jax.random.split(jax.random.key(8), 6)
    B, QH, KH, S, E, W_STAGE = 2, 4, 2, 128, 64, 32
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, KH, S, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, KH, S, E), jnp.float32)
    kst = jax.random.normal(ks[3], (B, KH, W_STAGE, E), jnp.float32)
    vst = jax.random.normal(ks[4], (B, KH, W_STAGE, E), jnp.float32)
    lengths = jnp.array([100, 40], jnp.int32)
    n_st, window = 7, 20  # window covers 13 cache cols + 7 staged
    got = decode_attention(
        q, k, v, lengths,
        k_stage=kst, v_stage=vst, staged_n=n_st, window=window,
    )
    # oracle over the concatenated [cache | staged] keys
    kcat = jnp.concatenate(
        [k, jnp.zeros_like(k[:, :, :W_STAGE])], axis=2
    )
    vcat = jnp.concatenate(
        [v, jnp.zeros_like(v[:, :, :W_STAGE])], axis=2
    )
    for b in range(B):
        L = int(lengths[b])
        kcat = kcat.at[b, :, L : L + n_st].set(kst[b, :, :n_st])
        vcat = vcat.at[b, :, L : L + n_st].set(vst[b, :, :n_st])
    total = lengths + n_st
    cols = jnp.arange(kcat.shape[2])[None, :]
    mask = jnp.logical_and(
        cols < total[:, None], cols >= total[:, None] - window
    )
    want = naive.naive_attention(q, kcat, vcat, kpad_mask=mask)
    # staging tokens ride in bf16 by design: tolerance is bf16-level
    assert jnp.allclose(got, want, atol=1e-2, rtol=1e-2), (
        jnp.abs(got - want).max()
    )


@pytest.mark.parametrize("window", [16, 100])
def test_window_paged_decode(window):
    from nnop_tpu.ops.attention_decode_paged import paged_decode_attention
    from nnop_tpu.runtime.paged_cache import PagedKVCache

    KH, E, page = 2, 64, 64
    cache = PagedKVCache.create(16, KH, page, E, dtype=jnp.float32)
    key = jax.random.key(11)
    seqs = {0: 150, 1: 37}
    dense = {}
    for sid, n in seqs.items():
        cache.alloc_seq(sid)
        kt, vt = [], []
        for _ in range(n):
            key, k1, k2 = jax.random.split(key, 3)
            a = jax.random.normal(k1, (KH, E), jnp.float32)
            b = jax.random.normal(k2, (KH, E), jnp.float32)
            cache.append_token(sid, a, b)
            kt.append(a)
            vt.append(b)
        dense[sid] = (jnp.stack(kt, axis=1), jnp.stack(vt, axis=1))

    B, QH = len(seqs), 4
    q = jax.random.normal(jax.random.key(12), (B, QH, 1, E), jnp.float32)
    table, lens = cache.batch_views(list(seqs), max_pages=4)
    got = paged_decode_attention(
        q, cache.pool_k, cache.pool_v, table, lens, window=window
    )
    S = 256
    for i, sid in enumerate(seqs):
        kd, vd = dense[sid]
        n = seqs[sid]
        kfull = jnp.zeros((1, KH, S, E)).at[0, :, :n].set(kd)
        vfull = jnp.zeros((1, KH, S, E)).at[0, :, :n].set(vd)
        cols = jnp.arange(S)[None]
        mask = jnp.logical_and(cols < n, cols >= n - window)
        want = naive.naive_attention(
            q[i : i + 1], kfull, vfull, kpad_mask=mask
        )
        assert jnp.allclose(got[i : i + 1], want, atol=1e-3, rtol=1e-3), (
            sid,
            jnp.abs(got[i : i + 1] - want).max(),
        )
