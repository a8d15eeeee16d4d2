"""INT8/FP8 quantization + fused-dequant matmul (north-star features,
BASELINE.json — no reference counterpart)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu.ops.quantization import dequantize, quantize
from nnop_tpu.ops.quantized_matmul import quantized_matmul


def test_quant_roundtrip_int8():
    w = jax.random.normal(jax.random.key(0), (256, 512), jnp.float32)
    q = quantize(w, axis=0)
    assert q.values.dtype == jnp.int8
    assert q.scale.shape == (512,)
    back = dequantize(q)
    # int8 symmetric: error bounded by scale/2 per element
    err = jnp.abs(back - w)
    bound = q.scale[None, :] * 0.51
    assert jnp.all(err <= bound)


def test_quant_roundtrip_fp8():
    w = jax.random.normal(jax.random.key(1), (128, 256), jnp.float32)
    q = quantize(w, axis=0, dtype=jnp.float8_e4m3fn)
    back = dequantize(q)
    rel = jnp.linalg.norm(back - w) / jnp.linalg.norm(w)
    assert rel < 0.05


@pytest.mark.parametrize("M,K,N", [(128, 256, 512), (100, 300, 200), (8, 512, 128)])
def test_qmm_int8(M, K, N):
    x = jax.random.normal(jax.random.key(2), (M, K), jnp.float32)
    w = jax.random.normal(jax.random.key(3), (K, N), jnp.float32)
    wq = quantize(w, axis=0)
    got = quantized_matmul(x, wq)
    want = x @ dequantize(wq).astype(jnp.float32)
    np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-2)
    # end-to-end quantization error vs full precision stays small
    rel = jnp.linalg.norm(got - x @ w) / jnp.linalg.norm(x @ w)
    assert rel < 0.02


def test_qmm_batched_bf16():
    x = jax.random.normal(jax.random.key(4), (2, 64, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(5), (256, 512), jnp.float32)
    wq = quantize(w, axis=0)
    got = quantized_matmul(x, wq)
    assert got.shape == (2, 64, 512)
    assert got.dtype == jnp.bfloat16
    want = (x.astype(jnp.float32).reshape(-1, 256) @ dequantize(wq)).reshape(
        2, 64, 512
    )
    rel = jnp.linalg.norm(got.astype(jnp.float32) - want) / jnp.linalg.norm(want)
    assert rel < 0.02
