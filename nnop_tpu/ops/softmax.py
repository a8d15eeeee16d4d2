"""Fused online softmax (Pallas TPU) with custom VJP.

Re-derivation of /root/reference/src/softmax.jl: the reference runs one
workgroup per column with an online (max, denom) monoid reduction
(`MD`/`md_reduce`, softmax.jl:1-16) because a GPU workgroup must stride a
column in gsz-chunks. On TPU a whole row block sits in VMEM, so the
single-pass "online" property comes for free: one HBM read, max/exp/sum on
the VPU, one HBM write — the fusion (not the monoid) is what the reference
is buying, and Pallas gives it in one kernel.

The backward matches the reference's broadcast-only backward
(softmax.jl:70-80): dx = (dy - sum(dy*y)) * y, fused into a second Pallas
kernel here so fwd+bwd are both single-pass over HBM.

API softmaxes over the LAST axis of a 2-D+ input (the reference is
column-major dims=1 over (emb, n); row-major last-axis over (n, emb) is the
identical memory access pattern).
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
    sublane_tile,
)

NEG_INF = float("-inf")


def _fwd_kernel(x_ref, y_ref, *, n_rows: int, block_rows: int):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    # NaN guard mirroring softmax.jl:11 (`isnan(m) ? -Inf : m`): a fully
    # -inf row (or the garbage tail block) must not poison exp().
    m = jnp.where(jnp.isnan(m) | (m == NEG_INF), 0.0, m)
    e = jnp.exp(x - m)
    d = jnp.sum(e, axis=-1, keepdims=True)
    y_ref[...] = (e / d).astype(y_ref.dtype)
    del i, n_rows, block_rows


def _bwd_kernel(y_ref, dy_ref, dx_ref):
    y = y_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    t = jnp.sum(dy * y, axis=-1, keepdims=True)
    dx_ref[...] = ((dy - t) * y).astype(dx_ref.dtype)


def _pick_block_rows(n_rows: int, n_cols: int, itemsize: int) -> int:
    # fwd holds x block + y block (+f32 temps); budget ~1/4 VMEM for the
    # pipelined operands so Mosaic can double-buffer.
    per_row = n_cols * max(itemsize, 4) * 2
    bm = max(8, VMEM_BUDGET_BYTES // 2 // max(per_row, 1))
    bm = min(bm, round_up(n_rows, 8), 4096)
    return round_up(bm, 8) if bm >= 8 else 8


def _softmax_fwd_impl(x2: jax.Array) -> jax.Array:
    n, e = x2.shape
    bm = _pick_block_rows(n, e, x2.dtype.itemsize)
    kernel = functools.partial(_fwd_kernel, n_rows=n, block_rows=bm)
    return pl.pallas_call(
        kernel,
        grid=(cdiv(n, bm),),
        in_specs=[pl.BlockSpec((bm, e), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((bm, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, e), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2)


def _softmax_bwd_impl(y2: jax.Array, dy2: jax.Array) -> jax.Array:
    n, e = y2.shape
    bm = _pick_block_rows(n, e, y2.dtype.itemsize)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(cdiv(n, bm),),
        in_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, e), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, e), y2.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(y2, dy2)


@jax.custom_vjp
def _online_softmax_pallas(x: jax.Array) -> jax.Array:
    shape = x.shape
    y = _softmax_fwd_impl(x.reshape(-1, shape[-1]))
    return y.reshape(shape)


def _vjp_fwd(x):
    y = _online_softmax_pallas(x)
    return y, y


def _vjp_bwd(y, dy):
    shape = y.shape
    dx = _softmax_bwd_impl(
        y.reshape(-1, shape[-1]), dy.reshape(-1, shape[-1])
    )
    return (dx.reshape(shape),)


_online_softmax_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def online_softmax(x: jax.Array) -> jax.Array:
    """Numerically-stable softmax over the last axis.

    Equivalent of /root/reference/src/softmax.jl:60-68 `online_softmax`
    (launcher) + :82-86 (rrule). Accepts any rank >= 1; leading axes are
    flattened into rows. Implementation dispatch as in rms_norm
    (platform.norm_impl).
    """
    if norm_impl() == "xla":
        xf = x.astype(jnp.float32)
        m = jnp.max(xf, axis=-1, keepdims=True)
        e = jnp.exp(xf - m)
        return (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
    return _online_softmax_pallas(x)
