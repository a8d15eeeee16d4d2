"""Grouped (ragged-expert) matmul: out[m] = x[m] @ w[group(m)].

MoE serving/training fast path (megablox-style; no reference counterpart
— NNop.jl has no MoE, SURVEY.md §2.5). The dispatch-einsum MoE layer
(models/moe.py) computes every expert at full capacity C — O(E*C) rows of
MXU work and O(T*E*C) dispatch-mask traffic. This kernel computes EXACT
work over expert-sorted tokens instead:

- Tokens are sorted by expert and padded so every expert's row range is
  block_m-aligned (sorting glue in models/moe.py:sort_tokens_by_expert).
  Each m-block then belongs to exactly ONE expert.
- The per-block expert id rides in SMEM via scalar prefetch; the weight
  BlockSpec index map selects `w[g[im]]` — the DMA engine streams only
  the experts that actually have tokens (empty experts are never
  fetched), which is what makes this the decode-path win: at B=32, top-2
  routing touches at most 64 expert-blocks of weights, not all E slabs.
- Grid (m, n, k), k innermost, fp32 VMEM accumulator — the same
  structure as ops/quantized_matmul.py. Sorted order means consecutive
  m-blocks of the same expert hit identical weight-block indices, which
  the block pipeliner recognizes and skips the refetch.

Backward (custom_vjp, so the grouped path is trainable):
  dx = grouped dy @ w[g]^T        — this kernel with w transposed
  dw[e] = sum_{m in e} x_m^T dy_m — a revisiting-output kernel: grid
    (k, n, m) with m INNERMOST; the dw output block index g[im] is
    constant across each expert's (sorted, contiguous) run of m-blocks,
    so the block stays VMEM-resident while the run accumulates and is
    flushed when the group changes. Empty experts' blocks are never
    visited — their zeros come from input_output_aliasing with a zeros
    buffer, not from the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import cdiv, interpret_default, round_up

__all__ = ["grouped_matmul", "grouped_matmul_quantized"]


def _gmm_kernel(g_ref, x_ref, w_ref, o_ref, acc, *, n_k, block_k, k_dim,
                compute_dtype):
    del g_ref
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    w = w_ref[0]
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
        o_ref[...] = acc[...].astype(o_ref.dtype)


def _gmm_fwd_impl(x, w, block_groups, *, block_m, block_n, block_k,
                  out_dtype=None):
    Tp, K = x.shape
    E, Kw, N = w.shape
    if Kw != K:
        raise ValueError(f"K mismatch: x {K} vs w {Kw}")
    if Tp % block_m != 0:
        raise ValueError(f"rows {Tp} not a multiple of block_m {block_m}")
    if block_groups.shape != (Tp // block_m,):
        raise ValueError(
            f"block_groups {block_groups.shape} != ({Tp // block_m},)"
        )
    out_dtype = out_dtype or x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    bn = min(block_n, round_up(N, 128))
    bk = min(block_k, round_up(K, 128))

    kernel = functools.partial(
        _gmm_kernel,
        n_k=cdiv(K, bk),
        block_k=bk,
        k_dim=K,
        compute_dtype=compute_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // block_m, cdiv(N, bn), cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda m, n, k, g: (m, k)),
            pl.BlockSpec((1, bk, bn), lambda m, n, k, g: (g[m], k, n)),
        ],
        out_specs=pl.BlockSpec((block_m, bn), lambda m, n, k, g: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(block_groups.astype(jnp.int32), x, w)


def _gmm_dw_kernel(g_ref, x_ref, dy_ref, z_ref, o_ref, acc, *, n_m,
                   compute_dtype):
    del z_ref  # zeros buffer exists only to initialize dw via aliasing
    im = pl.program_id(2)
    first = jnp.logical_or(im == 0, g_ref[im] != g_ref[jnp.maximum(im - 1, 0)])

    @pl.when(first)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...].astype(compute_dtype),
        dy_ref[...].astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),  # x^T @ dy
        preferred_element_type=jnp.float32,
    )
    last = jnp.logical_or(
        im == n_m - 1, g_ref[jnp.minimum(im + 1, n_m - 1)] != g_ref[im]
    )

    @pl.when(last)
    def _():
        o_ref[0] = acc[...].astype(o_ref.dtype)


def _gmm_dw(x, dy, block_groups, *, block_m, block_n, block_k, w_shape,
            w_dtype):
    """dw[e] = sum over expert-e m-blocks of x_m^T @ dy_m."""
    Tp, K = x.shape
    E, _, N = w_shape
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    bn = min(block_n, round_up(N, 128))
    bk = min(block_k, round_up(K, 128))
    n_m = Tp // block_m

    kernel = functools.partial(
        _gmm_dw_kernel, n_m=n_m, compute_dtype=compute_dtype
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cdiv(K, bk), cdiv(N, bn), n_m),
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda k, n, m, g: (m, k)),
            pl.BlockSpec((block_m, bn), lambda k, n, m, g: (m, n)),
            pl.BlockSpec(memory_space=pl.ANY),  # aliased zeros, no DMA
        ],
        out_specs=pl.BlockSpec((1, bk, bn), lambda k, n, m, g: (g[m], k, n)),
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
    )
    # ragged K/N tails: pad dw to block multiples and slice back — the
    # padded x/dy block tails are zero by construction (the sort glue
    # scatters into zeros buffers), so padded rows/cols accumulate zeros.
    Kp, Np = round_up(K, bk), round_up(N, bn)
    zeros = jnp.zeros((E, Kp, Np), w_dtype)
    dw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((E, Kp, Np), w_dtype),
        input_output_aliases={3: 0},  # zeros buffer -> dw (after scalars)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(block_groups.astype(jnp.int32), x, dy, zeros)
    return dw[:, :K, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _grouped_matmul(x, w, block_groups, block_m, block_n, block_k):
    return _gmm_fwd_impl(x, w, block_groups, block_m=block_m,
                         block_n=block_n, block_k=block_k)


def _gmm_fwd(x, w, block_groups, block_m, block_n, block_k):
    y = _gmm_fwd_impl(x, w, block_groups, block_m=block_m, block_n=block_n,
                      block_k=block_k)
    return y, (x, w, block_groups)


def _gmm_bwd(block_m, block_n, block_k, res, dy):
    x, w, block_groups = res
    # dx: grouped dy @ w^T (transpose materialized once per bwd — the
    # expert slabs are contiguous, XLA handles this as a cheap copy)
    dx = _gmm_fwd_impl(
        dy.astype(x.dtype), jnp.swapaxes(w, 1, 2), block_groups,
        block_m=block_m, block_n=block_n, block_k=block_k,
    )
    dw = _gmm_dw(
        x, dy.astype(x.dtype), block_groups, block_m=block_m,
        block_n=block_n, block_k=block_k, w_shape=w.shape, w_dtype=w.dtype,
    )
    return dx, dw, None


_grouped_matmul.defvjp(_gmm_fwd, _gmm_bwd)


def grouped_matmul(x, w, block_groups, *, block_m: int = 128,
                   block_n: int = 512, block_k: int = 512):
    """out[m-block i] = x[block i] @ w[block_groups[i]].

    x: (Tp, K) expert-sorted, block_m-aligned tokens (Tp % block_m == 0);
    w: (E, K, N) stacked expert weights; block_groups: (Tp/block_m,) i32
    expert id per m-block (must be non-decreasing for the backward's
    run-length dw accumulation — the sort glue guarantees it).
    Returns (Tp, N) in x.dtype. Differentiable in x and w.
    """
    return _grouped_matmul(x, w, block_groups, block_m, block_n, block_k)


# ---------------------------------------------------------------------------
# INT8 weight-only quantized variant (the Mixtral serving path): same
# grid/indexing as the bf16 kernel, weights stream from HBM at int8
# width, per-(expert, out-channel) scale applied once to the fp32
# accumulator (see ops/quantized_matmul.py for the dequant-cost argument)


def _gmm_q_kernel(g_ref, x_ref, w_ref, s_ref, o_ref, acc, *, n_k, block_k,
                  k_dim, compute_dtype):
    del g_ref
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    w = w_ref[0]
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
        o_ref[...] = (acc[...] * s_ref[0, 0]).astype(o_ref.dtype)


def grouped_matmul_quantized(x, wq, block_groups, *, block_m: int = 128,
                             block_n: int = 2048, block_k: int = 1024,
                             out_dtype=None):
    """Grouped matmul with int8 stacked expert weights.

    x: (Tp, K) sorted tokens; wq: QTensor(values (E, K, N) int8,
    scale (E, N), axis=1); block_groups: (Tp/block_m,) i32. Weights
    stream at int8 width; scales applied to the fp32 accumulator.
    Forward-only (serving); train with the bf16 grouped_matmul.

    block_n defaults to 2048 (1 MB int8 weight blocks at bk=512): at
    512x512 the 256 KB per-step DMA undershoots the ~1-2 us per-step
    fixed cost and the stream stalls at ~350 GB/s; 1 MB blocks match
    the dense qmm's layout (630 GB/s). VMEM stays ~4 MB double-buffered.
    """
    from nnop_tpu.ops.quantization import QTensor

    if not isinstance(wq, QTensor) or wq.axis != 1:
        raise ValueError("expected QTensor with scale over axis 1 (per-E,N)")
    Tp, K = x.shape
    E, Kw, N = wq.values.shape
    if Kw != K:
        raise ValueError(f"K mismatch: x {K} vs w {Kw}")
    if Tp % block_m != 0:
        raise ValueError(f"rows {Tp} not a multiple of block_m {block_m}")
    out_dtype = out_dtype or x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    bn = min(block_n, round_up(N, 128))
    bk = min(block_k, round_up(K, 128))

    kernel = functools.partial(
        _gmm_q_kernel,
        n_k=cdiv(K, bk),
        block_k=bk,
        k_dim=K,
        compute_dtype=compute_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // block_m, cdiv(N, bn), cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda m, n, k, g: (m, k)),
            pl.BlockSpec((1, bk, bn), lambda m, n, k, g: (g[m], k, n)),
            # scale is (E, 1, N): the singleton middle axis keeps the
            # block's second-to-last dim equal to the array dim (Mosaic
            # tiling forbids a (1, bn) block over an (E, N) array when
            # E is not the block's sublane count)
            pl.BlockSpec((1, 1, bn), lambda m, n, k, g: (g[m], 0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, bn), lambda m, n, k, g: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(block_groups.astype(jnp.int32), x, wq.values, wq.scale[:, None, :])


# ---------------------------------------------------------------------------
# W8A8 variant: native int8 x int8 -> int32 MXU dots (activation
# quantization; see ops/quantized_matmul.py quantized_matmul_w8a8 for the
# measured 1.66-1.8x over cast->bf16 at compute-bound shapes). MoE
# PREFILL is the consumer: at T>=2048 the grouped int8 kernel is
# MXU-bound (104 TF/s at T=8192), so int8 dots raise the ceiling; decode
# (T~=2*B) stays on the weight-only kernel.


def _gmm_w8a8_kernel(g_ref, x_ref, w_ref, xs_ref, s_ref, o_ref, acc, *,
                     n_k, block_k, k_dim):
    del g_ref
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    x = x_ref[...]
    w = w_ref[0]
    if k_dim % block_k != 0:
        rows = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        valid = rows < k_dim
        x = jnp.where(valid.reshape(1, block_k), x, jnp.zeros_like(x))
        w = jnp.where(valid, w, jnp.zeros_like(w))
    acc[...] += jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = (
            acc[...].astype(jnp.float32) * xs_ref[...] * s_ref[0, 0]
        ).astype(o_ref.dtype)


def grouped_matmul_w8a8(x, wq, block_groups, *, block_m: int = 128,
                        block_n: int = 2048, block_k: int = 1024,
                        out_dtype=None):
    """Grouped W8A8 matmul: int8 tokens x int8 stacked experts.

    x: (Tp, K) float (quantized per-row here) or a pre-quantized
    (values int8, scale (Tp, 1) f32) pair; wq: QTensor(values (E, K, N)
    int8, scale (E, N), axis=1); block_groups as in grouped_matmul.
    int32 accumulation is exact; the per-row x per-(expert, channel)
    scale fixup applies once on the final K step. Forward-only."""
    from nnop_tpu.ops.quantization import QTensor
    from nnop_tpu.ops.quantized_matmul import quantize_act

    if not isinstance(wq, QTensor) or wq.axis != 1:
        raise ValueError("expected QTensor with scale over axis 1 (per-E,N)")
    if wq.values.dtype != jnp.int8:
        raise ValueError("grouped_matmul_w8a8 requires int8 weights")
    if isinstance(x, tuple):
        xv, xs = x
        out_dtype = out_dtype or jnp.bfloat16
    else:
        xv, xs = quantize_act(x)
        out_dtype = out_dtype or x.dtype
    Tp, K = xv.shape
    E, Kw, N = wq.values.shape
    if Kw != K:
        raise ValueError(f"K mismatch: x {K} vs w {Kw}")
    if Tp % block_m != 0:
        raise ValueError(f"rows {Tp} not a multiple of block_m {block_m}")
    bn = min(block_n, round_up(N, 128))
    bk = min(block_k, round_up(K, 128))

    kernel = functools.partial(
        _gmm_w8a8_kernel,
        n_k=cdiv(K, bk),
        block_k=bk,
        k_dim=K,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // block_m, cdiv(N, bn), cdiv(K, bk)),
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda m, n, k, g: (m, k)),
            pl.BlockSpec((1, bk, bn), lambda m, n, k, g: (g[m], k, n)),
            pl.BlockSpec((block_m, 1), lambda m, n, k, g: (m, 0)),
            pl.BlockSpec((1, 1, bn), lambda m, n, k, g: (g[m], 0, n)),
        ],
        out_specs=pl.BlockSpec((block_m, bn), lambda m, n, k, g: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.int32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(block_groups.astype(jnp.int32), xv, wq.values, xs,
      wq.scale[:, None, :])


# ---------------------------------------------------------------------------
# INT4 variant: packed-nibble stacked experts (see ops/quantized_matmul.py
# _qmm4_kernel for the unpack strategy — i32 shifts, group scales folded
# into the weight planes in VMEM, no sublane concat). Halves the expert
# weight stream again vs int8 — Mixtral decode is weight-bound.


def _gmm_q4_kernel(g_ref, x_ref, w_ref, s_ref, o_ref, acc, *, n_k, groups,
                   group, compute_dtype):
    del g_ref
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    b = w_ref[0].astype(jnp.int32)  # (P/2, bn)
    half, bn = b.shape
    planes = ((b << 28) >> 28, b >> 4)
    x = x_ref[...].astype(compute_dtype)
    s = s_ref[0]  # (groups, bn) f32
    gh = groups // 2
    for h, w in enumerate(planes):
        sw = s[h * gh:(h + 1) * gh].reshape(gh, 1, bn)
        wsc = (
            (w.astype(jnp.float32).reshape(gh, group, bn) * sw)
            .reshape(half, bn)
            .astype(compute_dtype)
        )
        acc[...] += jax.lax.dot_general(
            x[:, h * half:(h + 1) * half],
            wsc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def quantize4_experts(w, *, group: int = 128, pack_block: int = 1024):
    """Stacked (E, K, N) -> QTensor4 with (E, Kp/2, N) packed planes."""
    from nnop_tpu.ops.quantization import quantize4

    return jax.vmap(
        lambda we: quantize4(we, group=group, pack_block=pack_block)
    )(w)


def _grouped_matmul_q4(x, wq, block_groups, *, block_m, block_n,
                       out_dtype=None):
    Tp, K = x.shape
    E = wq.packed.shape[0]
    N = wq.packed.shape[2]
    P = wq.pack_block
    kp = 2 * wq.packed.shape[1]
    if not (K == kp or (K < kp and kp - K < P)):
        raise ValueError(f"K mismatch: x {K} vs packed {kp} (pack {P})")
    if kp != K:
        x = jnp.pad(x, ((0, 0), (0, kp - K)))
    if Tp % block_m != 0:
        raise ValueError(f"rows {Tp} not a multiple of block_m {block_m}")
    out_dtype = out_dtype or x.dtype
    compute_dtype = jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16
    bn = min(block_n, round_up(N, 128))
    groups = P // wq.group

    kernel = functools.partial(
        _gmm_q4_kernel,
        n_k=kp // P,
        groups=groups,
        group=wq.group,
        compute_dtype=compute_dtype,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // block_m, cdiv(N, bn), kp // P),
        in_specs=[
            pl.BlockSpec((block_m, P), lambda m, n, k, g: (m, k)),
            pl.BlockSpec((1, P // 2, bn), lambda m, n, k, g: (g[m], k, n)),
            pl.BlockSpec((1, groups, bn), lambda m, n, k, g: (g[m], k, n)),
        ],
        out_specs=pl.BlockSpec((block_m, bn), lambda m, n, k, g: (m, n)),
        scratch_shapes=[pltpu.VMEM((block_m, bn), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Tp, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(block_groups.astype(jnp.int32), x, wq.packed, wq.scale)
