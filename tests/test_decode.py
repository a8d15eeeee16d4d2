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
