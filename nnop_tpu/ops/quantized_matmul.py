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
# W8A8: native int8 MXU dots (activation quantization)
#
# The weight-only kernel above casts the int8 weight block to bf16 and
# runs the MXU at the bf16 rate — right for decode (HBM-bound on the
# weight stream) but leaves half the MXU on the table for prefill, where
# M is large and the matmul is compute-bound. v5e's MXU runs
# int8 x int8 -> int32 at ~2x the bf16 rate; quantizing activations
# per-row (per-token symmetric, the standard W8A8 recipe) keeps the dot
# in int8 end-to-end. Measured (scripts/probe_w8a8.py, M=2048 K=4096
# N=14336, one v5e): 280.7 TF/s vs 157.2 for cast->bf16 (1.79x, past the
# ~200 TF/s bf16 peak); the rowwise activation quant costs 3.6% of the
# matmul at M=2048. Both per-row and per-channel scales factor out of the
# K contraction, so the fp32 fixup is one O(M*N) multiply on the final
# K step.


def _w8a8_kernel(
    x_ref,
    w_ref,
    xs_ref,
    ws_ref,
    o_ref,
    acc,
    *,
    n_k: int,
    block_k: int,
    k_dim: int,
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
        x,
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = (
            acc[...].astype(jnp.float32) * xs_ref[...] * ws_ref[...]
        ).astype(o_ref.dtype)


def quantize_act(x: jax.Array):
    """Per-row symmetric int8 activation quantization.

    x: (..., K) -> (values int8 same shape, scale (..., 1) f32). One XLA
    pass over x; cheap relative to the matmuls it feeds (probe: 3.6% of
    one N=14336 matmul at M=2048, and one quant feeds qkv OR gate+up)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    values = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127.0, 127.0
    ).astype(jnp.int8)
    return values, scale


def quantized_matmul_w8a8(
    x,
    w: QTensor,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    out_dtype=None,
) -> jax.Array:
    """W8A8 matmul: int8 activations x int8 weights on the int8 MXU.

    `x` is either a float array (quantized per-row here) or a pre-
    quantized `(values, scale)` pair from quantize_act — pass the pair
    when one activation tensor feeds several projections. Accumulation is
    exact int32; the per-row and per-channel scales apply once to the
    final accumulator, so the only approximation over the weight-only
    path is the activation rounding itself."""
    if w.axis != 0:
        raise ValueError("quantized_matmul_w8a8 expects scale over axis 0")
    if w.values.dtype != jnp.int8:
        raise ValueError("quantized_matmul_w8a8 requires int8 weights")
    if isinstance(x, tuple):
        xv, xs = x
        out_dtype = out_dtype or jnp.bfloat16
    else:
        xv, xs = quantize_act(x)
        out_dtype = out_dtype or x.dtype
    lead = xv.shape[:-1]
    K = xv.shape[-1]
    N = w.values.shape[1]
    if w.values.shape[0] != K:
        raise ValueError(f"K mismatch: x {K} vs w {w.values.shape[0]}")
    x2 = xv.reshape(-1, K)
    s2 = xs.reshape(-1, 1)
    M = x2.shape[0]

    bm = block_m or min(512, round_up(M, 32))
    # Auto blocks (measured r3, scripts/probe_w8a8_gap.py at M=512 on the
    # 8B shapes): bn=2048 + bk=2048 lift the layer-weighted int8-MXU rate
    # 257 -> ~313 TF/s vs the old 512/1024 — bigger N blocks amortize the
    # per-grid-step fixed cost and the last-K-step scale fixup. Fall back
    # to the smaller blocks when the dims don't divide (tail masking
    # costs more than the big blocks gain at odd shapes).
    if block_n is None:
        block_n = 2048 if N % 2048 == 0 else 512
    if block_k is None:
        block_k = 2048 if K % 2048 == 0 else 1024
    bn = min(block_n, round_up(N, 128))
    bk = min(block_k, round_up(K, 128))

    kernel = functools.partial(
        _w8a8_kernel,
        n_k=cdiv(K, bk),
        block_k=bk,
        k_dim=K,
    )
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(N, bn), cdiv(M, bm), cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda n, m, k: (m, k)),
            pl.BlockSpec((bk, bn), lambda n, m, k: (k, n)),
            pl.BlockSpec((bm, 1), lambda n, m, k: (m, 0)),
            pl.BlockSpec((1, bn), lambda n, m, k: (0, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, m, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2, w.values, s2, w.scale.reshape(1, N))
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
