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


# ---------------------------------------------------------------------------
# W8A8: native int8-MXU matmul with per-token activation quantization


@pytest.mark.parametrize("M,K,N", [(256, 256, 512), (300, 300, 200), (512, 1000, 384)])
def test_qmm_w8a8_exact_vs_integer_reference(M, K, N):
    # int32 accumulation is exact: the kernel must match the integer
    # reference to f32 rounding
    from nnop_tpu.ops.quantized_matmul import quantize_act, quantized_matmul_w8a8

    x = jax.random.normal(jax.random.key(6), (M, K), jnp.float32)
    w = jax.random.normal(jax.random.key(7), (K, N), jnp.float32)
    wq = quantize(w, axis=0)
    got = quantized_matmul_w8a8(x, wq, block_m=128, block_n=128, block_k=256)
    xq, xs = quantize_act(x)
    acc = xq.astype(jnp.int32) @ wq.values.astype(jnp.int32)
    want = acc.astype(jnp.float32) * xs * wq.scale[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # and the activation rounding keeps the result close to full precision
    rel = jnp.linalg.norm(got - x @ w) / jnp.linalg.norm(x @ w)
    assert rel < 0.02


def test_qmm_w8a8_prequantized_tuple_and_batched():
    from nnop_tpu.ops.quantized_matmul import quantize_act, quantized_matmul_w8a8

    x = jax.random.normal(jax.random.key(8), (2, 160, 256), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(9), (256, 512), jnp.float32)
    wq = quantize(w, axis=0)
    got = quantized_matmul_w8a8(x, wq, block_m=128, block_n=256, block_k=128)
    assert got.shape == (2, 160, 512)
    assert got.dtype == jnp.bfloat16
    pair = quantize_act(x)
    got2 = quantized_matmul_w8a8(pair, wq, block_m=128, block_n=256, block_k=128)
    np.testing.assert_allclose(
        got.astype(jnp.float32), got2.astype(jnp.float32), rtol=1e-2, atol=1e-2
    )
    want = (
        x.astype(jnp.float32).reshape(-1, 256) @ dequantize(wq)
    ).reshape(2, 160, 512)
    rel = jnp.linalg.norm(got.astype(jnp.float32) - want) / jnp.linalg.norm(want)
    assert rel < 0.02


def test_qmatmul_w8a8_dispatch():
    # large M + int8 -> w8a8 path; small M and int4 fall back to weight-only
    from nnop_tpu.models.quantized import qmatmul, qmatmul_w8a8

    w = jax.random.normal(jax.random.key(10), (256, 512), jnp.float32)
    wq = quantize(w, axis=0)
    big = jax.random.normal(jax.random.key(11), (1, 512, 256), jnp.bfloat16)
    small = big[:, :8]
    out_big = qmatmul_w8a8(big, wq)
    want_big = qmatmul(big, wq)
    rel = jnp.linalg.norm(
        out_big.astype(jnp.float32) - want_big.astype(jnp.float32)
    ) / jnp.linalg.norm(want_big.astype(jnp.float32))
    assert rel < 0.02  # act-quant noise only
    out_small = qmatmul_w8a8(small, wq)
    np.testing.assert_array_equal(
        np.asarray(out_small), np.asarray(qmatmul(small, wq))
    )  # fell back: bitwise identical


def test_engine_prefill_w8a8_matches():
    # the w8a8 engine produces the same greedy tokens as weight-only on a
    # tiny model (activation rounding must not flip argmaxes on this input)
    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.models.quantized import quantize_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig(
        vocab_size=64, dim=64, n_layers=2, n_heads=2, n_kv_heads=2,
        head_dim=32, hidden_dim=128, max_seq_len=128, dtype=jnp.float32,
    )
    params = quantize_params(init_params(jax.random.key(12), cfg))
    prompts = [list(range(1, 34)), [5, 9, 2, 7] * 8]
    outs = []
    for w8a8 in (False, True):
        eng = Engine(params, cfg, max_batch=2, max_seq=128, w8a8=w8a8)
        reqs = [eng.submit(p, max_new_tokens=8) for p in prompts]
        eng.run()
        outs.append([r.out for r in reqs])
    assert outs[0] == outs[1]
