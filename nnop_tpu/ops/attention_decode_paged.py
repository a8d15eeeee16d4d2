"""Paged flash-decode attention: KV lives in a shared page pool, per
sequence page tables resolve blocks at DMA time.

North-star scope (BASELINE.json: "paged or ring-buffer KV-cache ...
continuous batching"). TPU-native design: the page table rides in SMEM via
scalar prefetch, and the K/V BlockSpec index maps perform the indirection
— `pool[page_table[b, j]]` — so the gather happens in the DMA engine, not
as a compute-side copy. Blocks past a sequence's length clamp to its last
live page (repeated index -> DMA skipped) and their compute is predicated
off. Supports fp and INT8 pools (per-token scales, folded into score rows
/ P columns exactly like the contiguous-cache kernel).

Pool layout: (n_pages, KH, page_size, E); page_size is the KV block size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import interpret_default

MASK_VALUE = -1e30


def _paged_kernel(
    table_ref,    # scalar prefetch: (B, max_pages) int32 page ids
    lengths_ref,  # scalar prefetch: (B,) int32
    q_ref,        # (1, 1, G, E)
    k_ref,        # (1, 1, page, E) — one page, via table indirection
    v_ref,
    *rest,
    scale: float,
    page_size: int,
    quantized: bool,
    num_pages_grid: int,
):
    if quantized:
        ks_ref, vs_ref, o_ref, acc, m_scr, l_scr = rest
    else:
        o_ref, acc, m_scr, l_scr = rest

    b = pl.program_id(0)
    j = pl.program_id(2)  # page slot within the sequence
    length = lengths_ref[b]

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    @pl.when(j * page_size < length)
    def _step():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        G = q.shape[0]
        s = jax.lax.dot_general(
            q.astype(jnp.bfloat16) if quantized else q,
            k.astype(jnp.bfloat16) if quantized else k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
        if quantized:
            s = s * ks_ref[0, 0]

        cols = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (G, page_size), 1
        )
        mask = cols < length
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_scr[...] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

        if quantized:
            p = p * vs_ref[0, 0]
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                v_ref[0, 0].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            pv = jax.lax.dot_general(
                p.astype(v_ref.dtype),
                v_ref[0, 0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc[...] = acc[...] * alpha + pv

    @pl.when(j == num_pages_grid - 1)
    def _finish():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc[...] / l_safe).astype(o_ref.dtype)


def paged_decode_attention(
    q,
    pool_k,
    pool_v,
    page_table,
    lengths,
    pool_k_scale=None,
    pool_v_scale=None,
    *,
    scale: float | None = None,
):
    """Single-token decode over a paged KV pool.

    Args:
      q: (B, QH, 1, E).
      pool_k/pool_v: (n_pages, KH, page_size, E), fp or int8.
      page_table: (B, max_pages) int32 — page ids per sequence, in order;
        unused entries may be any valid id (they're clamped/predicated).
      lengths: (B,) int32 valid token counts.
      pool_k_scale/pool_v_scale: (n_pages, KH, page_size) fp32 for int8.
    Returns (B, QH, 1, E).
    """
    B, QH, _, E = q.shape
    n_pages, KH, page_size, _ = pool_k.shape
    G = QH // KH
    max_pages = page_table.shape[1]
    quantized = pool_k.dtype == jnp.int8
    if scale is None:
        scale = 1.0 / (E**0.5)

    q_r = q.reshape(B, KH, G, E)

    def page_idx(b, kh, j, table, lens):
        last = jnp.maximum((lens[b] + page_size - 1) // page_size - 1, 0)
        jj = jnp.minimum(j, last)
        return (table[b, jj], kh, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, G, E), lambda b, kh, j, table, lens: (b, kh, 0, 0)),
        pl.BlockSpec((1, 1, page_size, E), page_idx),
        pl.BlockSpec((1, 1, page_size, E), page_idx),
    ]
    operands = [q_r, pool_k, pool_v]
    if quantized:
        sc_spec = pl.BlockSpec(
            (1, 1, 1, page_size),
            lambda b, kh, j, table, lens: (
                page_idx(b, kh, j, table, lens)[0], kh, 0, 0
            ),
        )
        in_specs += [sc_spec, sc_spec]
        operands += [
            pool_k_scale[:, :, None, :],
            pool_v_scale[:, :, None, :],
        ]

    kernel = functools.partial(
        _paged_kernel,
        scale=scale,
        page_size=page_size,
        quantized=quantized,
        num_pages_grid=max_pages,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KH, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, G, E), lambda b, kh, j, table, lens: (b, kh, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((G, E), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
        ],
    )
    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH, G, E), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret_default(),
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), *operands)
    return o.reshape(B, QH, 1, E)
