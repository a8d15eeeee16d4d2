"""Weight-only quantized matmul with dequant fused into the MXU tiles.

North-star feature (BASELINE.json: "fusing dequant into the attention and
matmul tiles") — no reference counterpart. Design:

  out[M, N] = x[M, K] @ (w_q[K, N] * scale[N])

The int8/fp8 weight block is upcast to the compute dtype inside the kernel
(VMEM -> VPU cast -> MXU), and the per-output-channel scale is applied ONCE
to the fp32 accumulator at the final K step — the scale factors out of the
K contraction, so dequant costs O(M·N) instead of O(K·N) and the weights
stream from HBM at int8 width (the whole point: decode is HBM-bound, int8
halves/quarters the weight traffic vs bf16/f32).

Grid (N/bn, M/bm, K/bk), K innermost + sequential, fp32 accumulator in
VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.ops.quantization import QTensor
from nnop_tpu.utils.platform import cdiv, interpret_default, round_up, sublane_tile


def _qmm_kernel(
    x_ref,
    w_ref,
    s_ref,
    o_ref,
    acc,
    *,
    n_k: int,
    block_k: int,
    k_dim: int,
    compute_dtype,
):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    w = w_ref[...]
    if k_dim % block_k != 0:
        rows = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        valid = rows < k_dim
        x = jnp.where(valid.reshape(1, block_k), x, jnp.zeros_like(x))
        w = jnp.where(valid, w, jnp.zeros_like(w))
    acc[...] += jax.lax.dot_general(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = (acc[...] * s_ref[...]).astype(o_ref.dtype)


def quantized_matmul(
    x: jax.Array,
    w: QTensor,
    *,
    block_m: int | None = None,
    block_n: int = 512,
    block_k: int = 1024,
    out_dtype=None,
) -> jax.Array:
    """x: (..., K) activations; w: QTensor(values (K, N) int8/fp8, scale (N,)).

    Returns (..., N) in `out_dtype` (defaults to x.dtype). Compute runs on
    the MXU in bf16 (f32 for f32 activations) with an fp32 accumulator.
    """
    if w.axis != 0:
        raise ValueError("quantized_matmul expects scale over axis 0 (per-N)")
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w.values.shape[1]
    if w.values.shape[0] != K:
        raise ValueError(f"K mismatch: x {K} vs w {w.values.shape[0]}")
    x2 = x.reshape(-1, K)
    M = x2.shape[0]
    out_dtype = out_dtype or x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16

    bm = block_m or min(512, round_up(M, sublane_tile(x.dtype)))
    bn = min(block_n, round_up(N, 128))
    bk = min(block_k, round_up(K, 128))

    kernel = functools.partial(
        _qmm_kernel,
        n_k=cdiv(K, bk),
        block_k=bk,
        k_dim=K,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(N, bn), cdiv(M, bm), cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda n, m, k: (m, k)),
            pl.BlockSpec((bk, bn), lambda n, m, k: (k, n)),
            pl.BlockSpec((1, bn), lambda n, m, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, m, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2, w.values, w.scale.reshape(1, N))
    return out.reshape(*lead, N)
