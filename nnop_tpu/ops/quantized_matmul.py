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

from nnop_tpu.ops.quantization import QTensor, QTensor4
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


# ---------------------------------------------------------------------------
# INT4: packed nibbles unpacked on the VPU inside the K loop
#
# Layout contract with ops/quantization.quantize4: the packed (P/2, bn)
# byte tile holds low nibbles = block rows [0, P/2), high nibbles = block
# rows [P/2, P). Group scales (group | P/2) are folded into the weight
# planes in VMEM — the dequantized weight tile never exists outside VMEM
# and the weights stream from HBM at nibble width (decode is HBM-bound;
# int4 halves the stream again vs int8).


def _qmm4_kernel(
    x_ref,
    w_ref,
    s_ref,
    o_ref,
    acc,
    *,
    n_k: int,
    groups: int,
    group: int,
    compute_dtype,
):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    # Unpack with NO sublane concat: the low/high nibble planes are used
    # as separate dot operands against the matching x halves (a (P/2,bn)
    # -> (P,bn) concat is a Mosaic relayout; i8 vector shifts don't
    # legalize on Mosaic, so the shifts run in i32). Group scales are
    # folded into the weight planes via a leading-dim reshape multiply —
    # one big dot per half instead of one per group (measured on v5e at
    # 32x4096x28672: per-group accumulator scaling 365 GB/s effective,
    # weight-side scaling + bn=2048 553 GB/s, vs 584 GB/s for int8 at
    # twice the bytes = 1.75x end-to-end).
    b = w_ref[...].astype(jnp.int32)  # (P/2, bn), sign-extended bytes
    half = b.shape[0]
    bn = b.shape[1]
    planes = (
        (b << 28) >> 28,  # rows [0, P/2)
        b >> 4,  # rows [P/2, P)
    )
    x = x_ref[...].astype(compute_dtype)
    s = s_ref[...]  # (groups, bn) f32
    gh = groups // 2  # groups per half (group | P/2)
    for h, w in enumerate(planes):
        sw = s[h * gh : (h + 1) * gh].reshape(gh, 1, bn)
        wsc = (
            (w.astype(jnp.float32).reshape(gh, group, bn) * sw)
            .reshape(half, bn)
            .astype(compute_dtype)
        )
        acc[...] += jax.lax.dot_general(
            x[:, h * half : (h + 1) * half],
            wsc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def quantized_matmul4(
    x: jax.Array,
    w: QTensor4,
    *,
    block_m: int | None = None,
    block_n: int = 2048,
    out_dtype=None,
) -> jax.Array:
    """x: (..., K) activations; w: QTensor4 (packed (Kp/2, N), group scales).

    block_k is pinned to w.pack_block (the packing layout is block-local).
    If quantize4 padded K, x is zero-padded to match — padded weights are
    zero so the tail contributes nothing.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w.packed.shape[1]
    P = w.pack_block
    kp = w.k_dim
    if not (K == kp or (K < kp and kp - K < P)):
        raise ValueError(f"K mismatch: x {K} vs packed {kp} (pack_block {P})")
    x2 = x.reshape(-1, K)
    if kp != K:
        x2 = jnp.pad(x2, ((0, 0), (0, kp - K)))
    M = x2.shape[0]
    out_dtype = out_dtype or x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16

    bm = block_m or min(512, round_up(M, sublane_tile(x.dtype)))
    bn = min(block_n, round_up(N, 128))
    groups = P // w.group

    kernel = functools.partial(
        _qmm4_kernel,
        n_k=kp // P,
        groups=groups,
        group=w.group,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(N, bn), cdiv(M, bm), kp // P),
        in_specs=[
            pl.BlockSpec((bm, P), lambda n, m, k: (m, k)),
            pl.BlockSpec((P // 2, bn), lambda n, m, k: (k, n)),
            pl.BlockSpec((groups, bn), lambda n, m, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, m, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2, w.packed, w.scale)
    return out.reshape(*lead, N)
