"""Flash-decode kernel: fp and INT8-KV paths vs naive attention with
per-sequence lengths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu.ops.attention_decode import decode_attention
from nnop_tpu.ops.naive import naive_attention


def _mk(B, QH, KH, S, E, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 4)
    q = jax.random.normal(ks[0], (B, QH, 1, E), dtype)
    k = jax.random.normal(ks[1], (B, KH, S, E), dtype)
    v = jax.random.normal(ks[2], (B, KH, S, E), dtype)
    lengths = jax.random.randint(ks[3], (B,), 1, S + 1)
    return q, k, v, lengths


def _naive_decode(q, k, v, lengths):
    S = k.shape[2]
    mask = jnp.arange(S)[None, :] < lengths[:, None]  # (B, S)
    return naive_attention(q, k, v, kpad_mask=mask)


@pytest.mark.parametrize("S", [64, 100, 256, 1000])
@pytest.mark.parametrize("QH,KH", [(4, 4), (8, 2), (4, 1)])
def test_decode_fp(S, QH, KH):
    q, k, v, lengths = _mk(3, QH, KH, S, 64)
    got = decode_attention(q, k, v, lengths)
    want = _naive_decode(q, k, v, lengths)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_decode_full_length():
    q, k, v, _ = _mk(2, 4, 2, 128, 64)
    lengths = jnp.full((2,), 128, jnp.int32)
    got = decode_attention(q, k, v, lengths)
    want = _naive_decode(q, k, v, lengths)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("S", [64, 96])
def test_decode_int8(S):
    q, k, v, lengths = _mk(2, 8, 2, S, 64, seed=1)

    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        vals = jnp.clip(jnp.round(x / scale[..., None]), -127, 127).astype(jnp.int8)
        return vals, scale

    kq, ks = quant(k)
    vq, vs = quant(v)
    got = decode_attention(q, kq, vq, lengths, ks, vs)
    # oracle: dequantized fp attention
    want = _naive_decode(
        q, kq.astype(jnp.float32) * ks[..., None],
        vq.astype(jnp.float32) * vs[..., None], lengths,
    )
    # int8 path computes on the MXU in bf16 by design: tolerance is
    # bf16-level, not f32-level
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)
    # int8 stays close to the unquantized result
    ref = _naive_decode(q, k, v, lengths)
    rel = jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)
    assert rel < 0.05, rel


@pytest.mark.parametrize("S", [64, 96])
def test_decode_int8_dots(S):
    """Native int8 MXU dots (q quantized per (seq, head), P per row)
    track the dequant path within the int8 noise floor."""
    q, k, v, lengths = _mk(2, 8, 2, S, 64, seed=1)

    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1)
        scale = jnp.maximum(amax, 1e-8) / 127.0
        vals = jnp.clip(jnp.round(x / scale[..., None]), -127,
                        127).astype(jnp.int8)
        return vals, scale

    kq, ks = quant(k)
    vq, vs = quant(v)
    got = decode_attention(q, kq, vq, lengths, ks, vs, int8_dots=True)
    want = _naive_decode(
        q, kq.astype(jnp.float32) * ks[..., None],
        vq.astype(jnp.float32) * vs[..., None], lengths,
    )
    # q/P quantization adds ~0.4% on top of bf16-level error
    np.testing.assert_allclose(got, want, atol=4e-2, rtol=4e-2)
    ref = decode_attention(q, kq, vq, lengths, ks, vs)
    rel = jnp.linalg.norm(
        got.astype(jnp.float32) - ref.astype(jnp.float32)
    ) / jnp.linalg.norm(ref.astype(jnp.float32))
    # ~1.2% vs the dequant path (q per-head-group + P per-row requant),
    # well under the ~5% the int8 cache itself costs vs fp attention
    assert rel < 0.02, rel


def test_decode_int8_dots_staged_stacked():
    """int8_dots composes with the engine layout (stacked caches, bf16
    staging, block_b, multi-token spec verify)."""
    B, QH, KH, S, E, W, nl = 4, 8, 2, 96, 64, 8, 2
    ks = jax.random.split(jax.random.key(5), 7)
    T = 2
    q = jax.random.normal(ks[0], (B, QH, T, E), jnp.bfloat16)
    kc = jax.random.randint(ks[1], (nl, B, KH, S, E), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[2], (nl, B, KH, S, E), -127, 128, jnp.int8)
    ksc = jnp.abs(jax.random.normal(ks[3], (nl, B, KH, S))) * 0.05
    vsc = jnp.abs(jax.random.normal(ks[4], (nl, B, KH, S))) * 0.05
    kst = jax.random.normal(ks[5], (B, nl, KH, W, E), jnp.bfloat16)
    vst = jax.random.normal(ks[6], (B, nl, KH, W, E), jnp.bfloat16)
    lengths = jnp.asarray([5, 96, 31, 64], jnp.int32)
    stn = jnp.asarray(4, jnp.int32)
    want = decode_attention(
        q, kc, vc, lengths, ksc, vsc,
        k_stage=kst, v_stage=vst, staged_n=stn, layer=1, block_b=2,
    )
    got = decode_attention(
        q, kc, vc, lengths, ksc, vsc,
        k_stage=kst, v_stage=vst, staged_n=stn, layer=1, block_b=2,
        int8_dots=True,
    )
    rel = jnp.linalg.norm(
        got.astype(jnp.float32) - want.astype(jnp.float32)
    ) / jnp.linalg.norm(want.astype(jnp.float32))
    assert rel < 0.015, rel


@pytest.mark.parametrize("block_b", [2, 4])
def test_decode_block_b_matches(block_b):
    """block_b > 1 (multiple sequences per grid step) is exactly the
    per-sequence kernel: ragged lengths still masked per sequence."""
    q, k, v, lengths = _mk(4, 8, 2, 256, 64, seed=3)
    want = decode_attention(q, k, v, lengths)
    got = decode_attention(q, k, v, lengths, block_b=block_b)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(
        got, _naive_decode(q, k, v, lengths), atol=1e-3, rtol=1e-3
    )


def test_decode_block_b_int8_staged_stacked():
    """Engine-layout path (stacked int8 caches + bf16 staging) with
    block_b=4 equals block_b=1."""
    B, QH, KH, S, E, W, nl = 4, 8, 2, 96, 64, 8, 3
    ks = jax.random.split(jax.random.key(5), 7)
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.bfloat16)
    kc = jax.random.randint(ks[1], (nl, B, KH, S, E), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[2], (nl, B, KH, S, E), -127, 128, jnp.int8)
    ksc = jnp.abs(jax.random.normal(ks[3], (nl, B, KH, S))) * 0.05
    vsc = jnp.abs(jax.random.normal(ks[4], (nl, B, KH, S))) * 0.05
    kst = jax.random.normal(ks[5], (B, nl, KH, W, E), jnp.bfloat16)
    vst = jax.random.normal(ks[6], (B, nl, KH, W, E), jnp.bfloat16)
    lengths = jnp.asarray([5, 96, 31, 64], jnp.int32)
    stn = jnp.asarray(4, jnp.int32)

    for layer in range(nl):
        want = decode_attention(
            q, kc, vc, lengths, ksc, vsc,
            k_stage=kst, v_stage=vst, staged_n=stn, layer=layer,
        )
        got = decode_attention(
            q, kc, vc, lengths, ksc, vsc,
            k_stage=kst, v_stage=vst, staged_n=stn, layer=layer,
            block_b=4,
        )
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            atol=1e-6, rtol=1e-6,
        )


def test_decode_block_b_window():
    """Sliding window + block_b: per-sequence window masking intact
    (the group-min low clamp may read more blocks, never fewer)."""
    q, k, v, lengths = _mk(4, 4, 2, 512, 64, seed=7)
    want = decode_attention(q, k, v, lengths, window=128, block_k=128)
    got = decode_attention(q, k, v, lengths, window=128, block_k=128,
                           block_b=2)
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("flat", [True, False])
@pytest.mark.parametrize("block_b", [1, 2])
def test_decode_flat_vs_loop_parity(flat, block_b):
    """The block-diagonal flat path and the per-head loop must agree
    (both against naive): the launcher auto-dispatches between them by
    measured shape heuristics, so both stay load-bearing."""
    q, k, v, lengths = _mk(4, 8, 2, 160, 64, seed=3)
    got = decode_attention(q, k, v, lengths, flat_dots=flat,
                           block_b=block_b)
    want = _naive_decode(q, k, v, lengths)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_decode_flat_col_cap(monkeypatch):
    """KH*bk over NNOP_DECODE_FLAT_COLS splits the KV stream into
    narrower blocks (the flat score block's (R, C) temporaries must fit
    VMEM next to the double-buffered windows)."""
    monkeypatch.setenv("NNOP_DECODE_FLAT_COLS", "64")
    q, k, v, lengths = _mk(2, 4, 2, 256, 64, seed=4)
    got = decode_attention(q, k, v, lengths, flat_dots=True)
    want = _naive_decode(q, k, v, lengths)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
