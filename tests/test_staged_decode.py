"""Staged decode: cache + bf16 staging attention, and the flush kernel.

The staged path must agree with a plain decode over a cache that already
contains the staged tokens (exactly for fp caches; within int8 quant
tolerance after a flush).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu.ops.attention_decode import decode_attention
from nnop_tpu.ops.kv_write import flush_staging

B, KH, G, E, S, W = 3, 2, 4, 64, 128, 32
NL = 2
QH = KH * G


def _quant(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    sc = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / sc[..., None]), -127, 127)
    return q.astype(jnp.int8), sc


@pytest.mark.parametrize("staged_n", [1, 7, 32])
def test_staged_equals_materialized(staged_n):
    ks = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.float32)
    kfull = jax.random.normal(ks[1], (B, KH, S, E), jnp.float32)
    vfull = jax.random.normal(ks[2], (B, KH, S, E), jnp.float32)
    lengths = jnp.array([5, 40, 0], jnp.int32)

    # staged tokens sit at [lengths[b], lengths[b]+staged_n)
    kst = jnp.stack(
        [
            jax.lax.dynamic_slice(kfull[b], (0, int(lengths[b]), 0), (KH, W, E))
            for b in range(B)
        ]
    ).astype(jnp.bfloat16)
    vst = jnp.stack(
        [
            jax.lax.dynamic_slice(vfull[b], (0, int(lengths[b]), 0), (KH, W, E))
        for b in range(B)
        ]
    ).astype(jnp.bfloat16)

    o_staged = decode_attention(
        q, kfull.astype(jnp.bfloat16), vfull.astype(jnp.bfloat16), lengths,
        k_stage=kst, v_stage=vst, staged_n=staged_n,
    )

    # oracle: plain decode over a cache already holding the staged tokens
    # (bf16-rounded to match the staging precision)
    kb = kfull.astype(jnp.bfloat16).astype(jnp.float32)
    vb = vfull.astype(jnp.bfloat16).astype(jnp.float32)
    o_ref = decode_attention(
        q, kb.astype(jnp.bfloat16), vb.astype(jnp.bfloat16),
        lengths + staged_n * (lengths > 0),
    )
    np.testing.assert_allclose(
        np.asarray(o_staged[:2]), np.asarray(o_ref[:2]), atol=2e-2, rtol=2e-2
    )
    # inactive slot (length 0) produces zeros
    np.testing.assert_array_equal(np.asarray(o_staged[2]), 0.0)


def test_staged_int8_cache():
    ks = jax.random.split(jax.random.key(1), 5)
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.bfloat16)
    kfull = jax.random.normal(ks[1], (B, KH, S, E), jnp.float32)
    vfull = jax.random.normal(ks[2], (B, KH, S, E), jnp.float32)
    kq, ksc = _quant(kfull)
    vq, vsc = _quant(vfull)
    lengths = jnp.array([16, 64, 33], jnp.int32)
    kst = jax.random.normal(ks[3], (B, KH, W, E), jnp.bfloat16)
    vst = jax.random.normal(ks[4], (B, KH, W, E), jnp.bfloat16)
    n = 5

    o = decode_attention(
        q, kq, vq, lengths, ksc, vsc, k_stage=kst, v_stage=vst, staged_n=n
    )

    # oracle in fp: dequantized cache prefix + staged tokens
    kd = np.asarray(kq, np.float32) * np.asarray(ksc)[..., None]
    vd = np.asarray(vq, np.float32) * np.asarray(vsc)[..., None]
    qn = np.asarray(q, np.float32)
    out = np.zeros((B, QH, E), np.float32)
    for b in range(B):
        L = int(lengths[b])
        kk = np.concatenate([kd[b, :, :L], np.asarray(kst, np.float32)[b, :, :n]], 1)
        vv = np.concatenate([vd[b, :, :L], np.asarray(vst, np.float32)[b, :, :n]], 1)
        for h in range(QH):
            kh = h // G
            s = qn[b, h, 0] @ kk[kh].T / np.sqrt(E)
            p = np.exp(s - s.max())
            p /= p.sum()
            out[b, h] = p @ vv[kh]
    np.testing.assert_allclose(
        np.asarray(o)[:, :, 0], out, atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("quantized", [True, False])
def test_flush_staging(quantized):
    ks = jax.random.split(jax.random.key(2), 3)
    dtype = jnp.int8 if quantized else jnp.bfloat16
    kc = jnp.zeros((NL, B, KH, S, E), dtype)
    vc = jnp.zeros((NL, B, KH, S, E), dtype)
    ksc = jnp.zeros((NL, B, KH, S), jnp.float32) if quantized else None
    vsc = jnp.zeros((NL, B, KH, S), jnp.float32) if quantized else None
    kst = jax.random.normal(ks[0], (B, NL, KH, W, E), jnp.bfloat16)
    vst = jax.random.normal(ks[1], (B, NL, KH, W, E), jnp.bfloat16)
    base = jnp.array([0, 17, 50], jnp.int32)

    kc2, vc2, ksc2, vsc2 = flush_staging(kc, vc, ksc, vsc, kst, vst, base)

    for b in range(B):
        p = int(base[b])
        want_k = np.asarray(kst, np.float32)[b].transpose(0, 1, 2, 3)
        for li in range(NL):
            if quantized:
                got = (
                    np.asarray(kc2, np.float32)[li, b, :, p : p + W]
                    * np.asarray(ksc2)[li, b, :, p : p + W][..., None]
                )
                np.testing.assert_allclose(
                    got, want_k[li], atol=2e-2, rtol=2e-2
                )
                gotv = (
                    np.asarray(vc2, np.float32)[li, b, :, p : p + W]
                    * np.asarray(vsc2)[li, b, :, p : p + W][..., None]
                )
                np.testing.assert_allclose(
                    gotv,
                    np.asarray(vst, np.float32)[b, li],
                    atol=2e-2,
                    rtol=2e-2,
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(kc2, np.float32)[li, b, :, p : p + W],
                    want_k[li],
                    atol=1e-6,
                )
    # untouched region stays zero (RMW preserved it)
    if int(base[0]) == 0:
        np.testing.assert_array_equal(
            np.asarray(kc2, np.float32)[:, 0, :, W + 32 :], 0.0
        )


def test_flush_preserves_neighbors():
    """RMW must not clobber cache rows outside [base, base+W)."""
    kc = jnp.ones((NL, B, KH, S, E), jnp.int8)
    vc = jnp.ones((NL, B, KH, S, E), jnp.int8)
    ksc = jnp.ones((NL, B, KH, S), jnp.float32)
    vsc = jnp.ones((NL, B, KH, S), jnp.float32)
    kst = jnp.zeros((B, NL, KH, W, E), jnp.bfloat16)
    vst = jnp.zeros((B, NL, KH, W, E), jnp.bfloat16)
    base = jnp.array([7, 33, 64], jnp.int32)
    kc2, _, _, _ = flush_staging(kc, vc, ksc, vsc, kst, vst, base)
    a = np.asarray(kc2)
    for b in range(B):
        p = int(base[b])
        np.testing.assert_array_equal(a[:, b, :, :p], 1)
        np.testing.assert_array_equal(a[:, b, :, p : p + W], 0)
        np.testing.assert_array_equal(a[:, b, :, p + W :], 1)


# ---------------------------------------------------------------------------
# multi-token (speculative verify) decode


@pytest.mark.parametrize("T,staged_n", [(2, 2), (4, 4), (4, 9), (3, 32)])
def test_multitoken_verify_vs_naive(T, staged_n):
    """T query tokens = the last T staged entries; the cache part is
    position-uniform, staging gets the intra-draft causal mask."""
    ks = jax.random.split(jax.random.key(1), 5)
    q = jax.random.normal(ks[0], (B, QH, T, E), jnp.float32)
    kfull = jax.random.normal(ks[1], (B, KH, S, E), jnp.float32)
    vfull = jax.random.normal(ks[2], (B, KH, S, E), jnp.float32)
    kst = jax.random.normal(ks[3], (B, KH, W, E), jnp.float32).astype(
        jnp.bfloat16
    )
    vst = jax.random.normal(ks[4], (B, KH, W, E), jnp.float32).astype(
        jnp.bfloat16
    )
    lengths = jnp.array([5, 40, 0], jnp.int32)

    got = decode_attention(
        q,
        kfull.astype(jnp.bfloat16),
        vfull.astype(jnp.bfloat16),
        lengths,
        k_stage=kst,
        v_stage=vst,
        staged_n=staged_n,
    )

    # naive oracle over [cache ++ staged] with the per-row causal bound
    kc = kfull.astype(jnp.bfloat16).astype(jnp.float32)
    vc = vfull.astype(jnp.bfloat16).astype(jnp.float32)
    kall = jnp.concatenate([kc, kst.astype(jnp.float32)], axis=2)
    vall = jnp.concatenate([vc, vst.astype(jnp.float32)], axis=2)
    scale = 1.0 / (E**0.5)
    want = np.zeros((B, QH, T, E), np.float32)
    for b in range(B):
        L = int(lengths[b])
        for h in range(QH):
            kh = h // G
            s = (q[b, h] @ kall[b, kh].T) * scale  # (T, S+W)
            cols = np.arange(S + W)
            for t in range(T):
                ok = (cols < L) | (
                    (cols >= S)
                    & (cols - S <= staged_n - T + t)
                    & (L > 0)
                )
                srow = np.where(ok, np.asarray(s[t]), -1e30)
                if L == 0:
                    want[b, h, t] = 0.0
                    continue
                p = np.exp(srow - srow.max())
                p = p / p.sum()
                want[b, h, t] = p @ np.asarray(vall[b, kh])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-2, rtol=2e-2)


def test_multitoken_t1_unchanged():
    """T=1 must be bit-identical to the original single-token path."""
    ks = jax.random.split(jax.random.key(2), 5)
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.float32)
    kfull = jax.random.normal(ks[1], (B, KH, S, E), jnp.bfloat16)
    vfull = jax.random.normal(ks[2], (B, KH, S, E), jnp.bfloat16)
    kst = jax.random.normal(ks[3], (B, KH, W, E), jnp.bfloat16)
    vst = jax.random.normal(ks[4], (B, KH, W, E), jnp.bfloat16)
    lengths = jnp.array([5, 40, 0], jnp.int32)
    a = decode_attention(q, kfull, vfull, lengths, k_stage=kst, v_stage=vst,
                         staged_n=3)
    b2 = decode_attention(q[:, :, :1], kfull, vfull, lengths, k_stage=kst,
                          v_stage=vst, staged_n=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
