"""Fused layer norm (Pallas TPU) with fused backward and custom VJP.

Re-derivation of /root/reference/src/layer_norm.jl: forward caches μ and
Σ = 1/sqrt(σ²+eps) per row (layer_norm.jl:36-40), fp32 accumulation
(layer_norm.jl:26), backward fuses the two row statistics c1 = mean(w·dy·x̂)
and c2 = mean(w·dy) (the reference's C12 pair-monoid, layer_norm.jl:1-6)
and produces dx, dw, db. The reference's per-group shmem dw/db partials +
host-side `sum(;dims=1)` (layer_norm.jl:172-202) become a single VMEM
scratch accumulated across the sequential TPU grid, written at the last
step.

Math (x̂ = (x−μ)·Σ):
  y  = x̂·w + b
  dx = Σ · (w·dy − mean(w·dy) − x̂ · mean(w·dy·x̂))
  dw = Σ_rows dy·x̂        db = Σ_rows dy
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


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, mu_ref, sigma_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    sigma = jax.lax.rsqrt(var + eps)
    y_ref[...] = (xc * sigma * w + b).astype(y_ref.dtype)
    mu_ref[...] = mu
    sigma_ref[...] = sigma


def _bwd_kernel(
    x_ref,
    w_ref,
    mu_ref,
    sigma_ref,
    dy_ref,
    dx_ref,
    dw_ref,
    db_ref,
    dw_acc,
    db_acc,
    *,
    n_rows: int,
    block_rows: int,
):
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)
    mu = mu_ref[...]
    sigma = sigma_ref[...]
    dy = dy_ref[...].astype(jnp.float32)

    xhat = (x - mu) * sigma
    wdy = w * dy
    c1 = jnp.mean(wdy * xhat, axis=-1, keepdims=True)
    c2 = jnp.mean(wdy, axis=-1, keepdims=True)
    dx_ref[...] = (sigma * (wdy - c2 - xhat * c1)).astype(dx_ref.dtype)

    rows = i * block_rows + jax.lax.broadcasted_iota(
        jnp.int32, xhat.shape, dimension=0
    )
    valid = rows < n_rows
    dw_part = jnp.sum(jnp.where(valid, dy * xhat, 0.0), axis=0, keepdims=True)
    db_part = jnp.sum(jnp.where(valid, dy, 0.0), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_acc[...] = jnp.zeros_like(dw_acc)
        db_acc[...] = jnp.zeros_like(db_acc)

    dw_acc[...] += dw_part
    db_acc[...] += db_part

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = dw_acc[...]
        db_ref[...] = db_acc[...]


def _pick_block_rows(n_rows: int, n_cols: int, n_bufs: int) -> int:
    per_row = n_cols * 4 * n_bufs
    bm = max(8, VMEM_BUDGET_BYTES // 2 // max(per_row, 1))
    bm = min(bm, round_up(n_rows, 8), 4096)
    return round_up(bm, 8)


def _ln_fwd_impl(x2, w, b, eps):
    n, e = x2.shape
    bm = _pick_block_rows(n, e, 2)
    kernel = functools.partial(_fwd_kernel, eps=eps)
    return pl.pallas_call(
        kernel,
        grid=(cdiv(n, bm),),
        in_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, e), x2.dtype),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2, w.reshape(1, e), b.reshape(1, e))


def _ln_bwd_impl(x2, w, mu, sigma, dy2):
    n, e = x2.shape
    bm = _pick_block_rows(n, e, 4)
    kernel = functools.partial(_bwd_kernel, n_rows=n, block_rows=bm)
    dx, dw, db = pl.pallas_call(
        kernel,
        grid=(cdiv(n, bm),),
        in_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((bm, 1), lambda i: (i, 0)),
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, e), lambda i: (i, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
            pl.BlockSpec((1, e), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, e), x2.dtype),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, e), jnp.float32),
            pltpu.VMEM((1, e), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x2, w.reshape(1, e), mu, sigma, dy2)
    return dx, dw.reshape(e), db.reshape(e)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_pallas(x, w, b, eps: float = 1e-6):
    y, _, _ = _ln_fwd_impl(x.reshape(-1, x.shape[-1]), w, b, eps)
    return y.reshape(x.shape)


def _vjp_fwd(x, w, b, eps):
    x2 = x.reshape(-1, x.shape[-1])
    y, mu, sigma = _ln_fwd_impl(x2, w, b, eps)
    return y.reshape(x.shape), (x, w, mu, sigma)


def _vjp_bwd(eps, res, dy):
    x, w, mu, sigma = res
    x2 = x.reshape(-1, x.shape[-1])
    dx, dw, db = _ln_bwd_impl(x2, w, mu, sigma, dy.reshape(x2.shape))
    return dx.reshape(x.shape), dw.astype(w.dtype), db.astype(w.dtype)


_layer_norm_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def layer_norm(x, w, b, eps: float = 1e-6):
    """Layer norm over the last axis, fp32 accumulation.

    Equivalent of /root/reference/src/layer_norm.jl:206-220 (public API +
    rrule). Implementation dispatch as in rms_norm (platform.norm_impl):
    compiled TPU uses the XLA formulation, which meets or beats the
    pallas kernels at every benchmarked shape on this stack.
    """
    if norm_impl() == "xla":
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
        return y.astype(x.dtype)
    return _layer_norm_pallas(x, w, b, eps)
