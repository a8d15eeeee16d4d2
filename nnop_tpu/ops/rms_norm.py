"""Fused RMS norm (Pallas TPU) with fused backward and custom VJP.

Re-derivation of /root/reference/src/rms_norm.jl: forward caches rstd per
row for the backward (rms_norm.jl:27-29), all accumulation in fp32
regardless of input dtype (rms_norm.jl:21,77,92), and the Gemma-style
`offset` kwarg ((offset + w) scaling, rms_norm.jl:117). The reference's
backward accumulates partial dw in shared memory over 4 columns per
workgroup and finishes with a host-side `sum(dw; dims=1)`
(rms_norm.jl:139-167, TODO "dedicated kernel"); here the TPU grid is
iterated sequentially on one core, so dw accumulates across ALL row blocks
in a VMEM scratch and is written once at the final grid step — no second
pass, closing that TODO.

Math (x̂ = x·rstd, g = offset + w):
  y  = x̂ · g
  dx = rstd · (g·dy − x̂ · mean(g·dy·x̂))
  dw = Σ_rows dy · x̂
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import (
    norm_impl,
    VMEM_BUDGET_BYTES,
    cdiv,
    interpret_default,
    round_up,
)


def _fwd_kernel(x_ref, w_ref, y_ref, rstd_ref, *, eps: float, offset: float):
    x = x_ref[...].astype(jnp.float32)
    g = offset + w_ref[...].astype(jnp.float32)
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(ms + eps)
    y_ref[...] = (x * rstd * g).astype(y_ref.dtype)
    if rstd_ref is not None:
        rstd_ref[...] = rstd


def _fwd_kernel_noresid(x_ref, w_ref, y_ref, *, eps: float, offset: float):
    _fwd_kernel(x_ref, w_ref, y_ref, None, eps=eps, offset=offset)


def _bwd_kernel(
    x_ref,
    w_ref,
    rstd_ref,
    dy_ref,
    dx_ref,
    dw_ref,
    dw_acc,
    *,
    offset: float,
    n_rows: int,
    block_rows: int,
):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = offset + w_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...]
    dy = dy_ref[...].astype(jnp.float32)

    xhat = x * rstd
    gdy = g * dy
    c = jnp.mean(gdy * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (gdy - xhat * c)).astype(dx_ref.dtype)

    # dw partial: mask tail rows of the ragged last block so garbage rows
    # don't poison the weight gradient (mirrors the reference's ragged-row
    # guard, rms_norm.jl:129 / attention.jl:25).
    rows = i * block_rows + jax.lax.broadcasted_iota(
        jnp.int32, xhat.shape, dimension=0
    )
    contrib = jnp.where(rows < n_rows, dy * xhat, 0.0)
    part = jnp.sum(contrib, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)

    dw_acc[...] += part

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = dw_acc[...]


def _pick_block_rows(n_rows: int, n_cols: int, n_bufs: int) -> int:
    per_row = n_cols * 4 * n_bufs
    bm = max(8, VMEM_BUDGET_BYTES // 2 // max(per_row, 1))
    bm = min(bm, round_up(n_rows, 8), 4096)
    return round_up(bm, 8)


def _rms_fwd_impl(x2, w, eps, offset, want_rstd=True):
    n, e = x2.shape
    bm = _pick_block_rows(n, e, 2)
    if want_rstd:
        kernel = functools.partial(_fwd_kernel, eps=eps, offset=offset)
        out_specs = [
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n, e), x2.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ]
    else:
        kernel = functools.partial(_fwd_kernel_noresid, eps=eps, offset=offset)
        out_specs = pl.BlockSpec((bm, e), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((n, e), x2.dtype)
    out = pl.pallas_call(
        kernel,
        grid=(cdiv(n, bm),),
        in_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2, w.reshape(1, e))
    if want_rstd:
        return out
    return out, None


def _rms_bwd_impl(x2, w, rstd, dy2, offset):
    n, e = x2.shape
    bm = _pick_block_rows(n, e, 4)
    kernel = functools.partial(
        _bwd_kernel, offset=offset, n_rows=n, block_rows=bm
    )
    dx, dw = pl.pallas_call(
        kernel,
        grid=(cdiv(n, bm),),
        in_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, e), x2.dtype),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2, w.reshape(1, e), rstd, dy2)
    return dx, dw.reshape(e)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rms_norm_pallas(x, w, eps: float = 1e-6, offset: float = 0.0):
    x2 = x.reshape(-1, x.shape[-1])
    n, e = x2.shape
    # fast path: manual double-buffered streaming (overlapped in/out DMA —
    # the automatic pipeline serializes them on this stack, see
    # ops/streaming.py)
    if n % 8 == 0 and n >= 256:
        from nnop_tpu.ops.streaming import streaming_rowop

        def f(xb, wb):
            xf = xb.astype(jnp.float32)
            g = offset + wb.astype(jnp.float32)
            ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
            return (xf * jax.lax.rsqrt(ms + eps) * g,)

        (y,) = streaming_rowop(
            f, [x2], [jax.ShapeDtypeStruct((n, e), x2.dtype)],
            const_xs=[w.reshape(1, e)],
        )
        return y.reshape(x.shape)
    y, _ = _rms_fwd_impl(x2, w, eps, offset, want_rstd=False)
    return y.reshape(x.shape)


def _vjp_fwd(x, w, eps, offset):
    x2 = x.reshape(-1, x.shape[-1])
    y, rstd = _rms_fwd_impl(x2, w, eps, offset)
    return y.reshape(x.shape), (x, w, rstd)


def _vjp_bwd(eps, offset, res, dy):
    x, w, rstd = res
    x2 = x.reshape(-1, x.shape[-1])
    dx, dw = _rms_bwd_impl(x2, w, rstd, dy.reshape(x2.shape), offset)
    return dx.reshape(x.shape), dw.astype(w.dtype)


_rms_norm_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def rms_norm(x, w, eps: float = 1e-6, offset: float = 0.0):
    """RMS norm over the last axis, fp32 accumulation.

    Equivalent of /root/reference/src/rms_norm.jl:171-185 (public API +
    rrule). `offset=1.0` gives Gemma-style (1+w) scaling.

    Implementation dispatch (platform.norm_impl): the Pallas kernels
    (fused fwd with cached rstd + fused bwd with in-kernel dw) or the XLA
    formulation, whichever is faster on the running stack — on v5e the
    XLA fusion wins at every benchmarked shape (NOTES.md), so compiled
    TPU uses it and the library is never slower than naive.
    """
    if norm_impl() == "xla":
        xf = x.astype(jnp.float32)
        g = offset + w.astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(ms + eps) * g).astype(x.dtype)
    return _rms_norm_pallas(x, w, eps, offset)
