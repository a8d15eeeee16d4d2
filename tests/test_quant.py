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


# ---------------------------------------------------------------------------
# INT4 (packed nibbles, group scales)

from nnop_tpu.ops.quantization import QTensor4, dequantize4, quantize4
from nnop_tpu.ops.quantized_matmul import quantized_matmul4


def test_quant4_roundtrip():
    w = jax.random.normal(jax.random.key(6), (1024, 384), jnp.float32)
    q = quantize4(w)
    assert q.packed.dtype == jnp.int8
    assert q.packed.shape == (512, 384)
    assert q.scale.shape == (1024 // 128, 384)
    back = dequantize4(q)
    # int4 symmetric: error bounded by half a quantization step per group
    bound = jnp.repeat(q.scale, 128, axis=0) * 0.51
    assert jnp.all(jnp.abs(back - w) <= bound)


def test_quant4_padded_k():
    """K not a multiple of the pack block: zero-padded, matmul pads x."""
    w = jax.random.normal(jax.random.key(7), (1000, 256), jnp.float32)
    q = quantize4(w)
    assert q.k_dim % q.pack_block == 0
    back = dequantize4(q)
    assert back.shape[0] == q.k_dim
    np.testing.assert_array_equal(back[1000:], 0.0)
    x = jax.random.normal(jax.random.key(8), (4, 1000), jnp.float32)
    got = quantized_matmul4(x, q)
    want = x @ back[:1000]
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("M,K,N", [(64, 1024, 512), (8, 2048, 384), (16, 768, 256)])
def test_qmm4(M, K, N):
    x = jax.random.normal(jax.random.key(9), (M, K), jnp.float32)
    w = jax.random.normal(jax.random.key(10), (K, N), jnp.float32) * 0.05
    q = quantize4(w)
    got = quantized_matmul4(x, q)
    want = x @ dequantize4(q)[:K]
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    # int4 group-128 noise on Gaussian weights: step = amax/7 ~ 0.4 sigma
    # (group amax ~ 2.8 sigma), noise rms = step/sqrt(12) ~ 0.115 sigma
    rel = jnp.linalg.norm(got - x @ w) / jnp.linalg.norm(x @ w)
    assert rel < 0.15


def test_qmm4_bf16_batched():
    x = jax.random.normal(jax.random.key(11), (2, 32, 1024), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(12), (1024, 256), jnp.float32)
    q = quantize4(w)
    got = quantized_matmul4(x, q)
    assert got.shape == (2, 32, 256)
    assert got.dtype == jnp.bfloat16
    want = (x.astype(jnp.float32).reshape(-1, 1024) @ dequantize4(q)).reshape(
        2, 32, 256
    )
    rel = jnp.linalg.norm(got.astype(jnp.float32) - want) / jnp.linalg.norm(want)
    assert rel < 0.02


def test_quantize_params_int4_model():
    """Model-level: the int4 fused-dequant forward matches the SAME model
    with weights explicitly dequantized (kernel correctness), and stays in
    the same ballpark as fp32 (random weights compound int4 noise layer by
    layer — real checkpoints track far closer)."""
    from nnop_tpu.models.llama import LlamaConfig, forward, init_params
    from nnop_tpu.models.quantized import qmatmul, quantize_params

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(jax.random.key(13), cfg)
    qparams = quantize_params(params, wbits=4)

    deq = {k: v for k, v in qparams.items()}
    deq["lm_head"] = dequantize4(qparams["lm_head"])[: cfg.dim]
    deq["layers"] = [
        {
            k: (dequantize4(v)[: layer_k_dim(k, cfg)] if isinstance(v, QTensor4) else v)
            for k, v in layer.items()
        }
        for layer in qparams["layers"]
    ]

    tokens = jax.random.randint(jax.random.key(14), (1, 16), 0, cfg.vocab_size)
    got = forward(qparams, tokens, cfg, matmul=qmatmul)
    exact = forward(deq, tokens, cfg)
    np.testing.assert_allclose(got, exact, atol=2e-3, rtol=2e-3)
    want = forward(params, tokens, cfg)
    rel = jnp.linalg.norm(got - want) / jnp.linalg.norm(want)
    assert rel < 0.6


def layer_k_dim(key, cfg):
    """Original (unpadded) K of each projection, to strip quantize4's pad."""
    return {
        "wq": cfg.dim, "wk": cfg.dim, "wv": cfg.dim,
        "wo": cfg.n_heads * cfg.head_dim,
        "w_gate": cfg.dim, "w_up": cfg.dim, "w_down": cfg.hidden_dim,
    }[key]
