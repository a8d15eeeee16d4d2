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

v2 (VERDICT r1 #7): grid is (B, max_pages) with ALL KV heads riding in
each grid step via an in-kernel head loop — the same fewer-larger-steps
layout that took the contiguous kernel to 85% of HBM roofline (a per-
(B, KH, page) grid spends more time on ~2us/step fixed cost than on the
KV stream). One step now moves KH*page_size*E bytes per pool operand.
Also supports `k_stage`/`v_stage` bf16 staging buffers like the
contiguous kernel, so the engine's staged-append design works paged too.

Pool layout: (n_pages, KH, page_size, E); page_size is the KV block size.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import interpret_default

MASK_VALUE = -1e30


def _paged_kernel(
    table_ref,    # scalar prefetch: (B, max_pages) int32 page ids
    lengths_ref,  # scalar prefetch: (B,) int32
    q_ref,        # (1, KH, G, E)
    k_ref,        # (1, KH, page, E) — one page, all heads
    v_ref,
    *rest,
    scale: float,
    page_size: int,
    n_kv_heads: int,
    group: int,
    quantized: bool,
    staged: bool,
    num_pages_grid: int,
    stacked: bool = False,
    window: int | None = None,
    softcap: float | None = None,
    flat_dots: bool = True,
):
    rest = list(rest)
    ks_ref = vs_ref = kst_ref = vst_ref = stn_ref = None
    if quantized:
        ks_ref = rest.pop(0)
        vs_ref = rest.pop(0)
    if staged:
        kst_ref = rest.pop(0)
        vst_ref = rest.pop(0)
        stn_ref = rest.pop(0)
    o_ref, acc, m_scr, l_scr = rest
    lead = (0, 0) if stacked else (0,)

    b = pl.program_id(0)
    j = pl.program_id(1)  # page slot within the sequence
    length = lengths_ref[b]
    G = group
    # total live keys incl. staging; the query token is the LAST of them,
    # so with a sliding window only cols >= total - window attend
    n_st = stn_ref[0] if staged else 0

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    def online_update(kh, s, mask, v_src, fp_dtype=None):
        sl = slice(kh * G, (kh + 1) * G)
        m_prev = m_scr[sl, :1]
        l_prev = l_scr[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_scr[sl, :] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), (G, 128)
        )
        m_scr[sl, :] = jnp.broadcast_to(m_new, (G, 128))
        mm_dtype = fp_dtype or jnp.bfloat16
        pv = jax.lax.dot_general(
            p.astype(mm_dtype),
            v_src.astype(mm_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc[sl, :] = acc[sl, :] * alpha + pv

    live = j * page_size < length
    if window is not None:
        live = jnp.logical_and(
            live, j * page_size + page_size - 1 >= length + n_st - window
        )

    @pl.when(live)
    def _step():
        if flat_dots:
            # block-diagonal flat dots: ALL KV heads' scores for this
            # page in one MXU call pair with ONE (R, C) state update —
            # same rewrite as ops/attention_decode.py's
            # _decode_step_b_flat (the per-head loop under-fills the
            # 8-sublane VPU tile at G=4 and its op-issue overhead
            # dominates short pages). C = KH*page_size is small (<=2 k
            # at page 256), so no VMEM col cap is needed here.
            R = n_kv_heads * G
            C = n_kv_heads * page_size
            E = q_ref.shape[-1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            colsf = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            same_head = (rows // G) == (colsf // page_size)
            pos = j * page_size + (colsf % page_size)
            mask = jnp.logical_and(same_head, pos < length)
            if window is not None:
                mask = jnp.logical_and(mask, pos >= length + n_st - window)
            qf = q_ref[0].reshape(R, E)
            kf = k_ref[(*lead,)].reshape(C, E)
            s = jax.lax.dot_general(
                qf.astype(jnp.bfloat16) if quantized else qf,
                kf.astype(jnp.bfloat16) if quantized else kf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
            if quantized:
                ks_cols = jnp.concatenate(
                    [ks_ref[(*lead, kh)] for kh in range(n_kv_heads)],
                    axis=1,
                )  # (1, C)
                s = s * ks_cols
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            s = jnp.where(mask, s, MASK_VALUE)
            m_prev = m_scr[:, :1]
            l_prev = l_scr[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l_scr[...] = jnp.broadcast_to(
                l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True),
                (R, 128),
            )
            m_scr[...] = jnp.broadcast_to(m_new, (R, 128))
            vf = v_ref[(*lead,)].reshape(C, E)
            if quantized:
                vs_cols = jnp.concatenate(
                    [vs_ref[(*lead, kh)] for kh in range(n_kv_heads)],
                    axis=1,
                )  # (1, C)
                p = p * vs_cols
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16), vf.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            else:
                pv = jax.lax.dot_general(
                    p.astype(vf.dtype), vf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc[...] = acc[...] * alpha + pv
            return
        cols = j * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (G, page_size), 1
        )
        mask = cols < length
        if window is not None:
            mask = jnp.logical_and(mask, cols >= length + n_st - window)
        for kh in range(n_kv_heads):
            q = q_ref[0, kh]
            k = k_ref[(*lead, kh)]
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16) if quantized else q,
                k.astype(jnp.bfloat16) if quantized else k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
            if quantized:
                s = s * ks_ref[(*lead, kh)]
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            s = jnp.where(mask, s, MASK_VALUE)
            if quantized:
                vsc = vs_ref[(*lead, kh)]
                v_src = v_ref[(*lead, kh)]
                # fold per-token V scale into P via the mask path
                sl = slice(kh * G, (kh + 1) * G)
                m_prev = m_scr[sl, :1]
                l_prev = l_scr[sl, :1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s, axis=-1, keepdims=True)
                )
                alpha = jnp.exp(m_prev - m_new)
                p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
                l_scr[sl, :] = jnp.broadcast_to(
                    l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True),
                    (G, 128),
                )
                m_scr[sl, :] = jnp.broadcast_to(m_new, (G, 128))
                pv = jax.lax.dot_general(
                    (p * vsc).astype(jnp.bfloat16),
                    v_src.astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc[sl, :] = acc[sl, :] * alpha + pv
            else:
                online_update(kh, s, mask, v_ref[(*lead, kh)], fp_dtype=v_ref.dtype)

    if staged:

        @pl.when(j == num_pages_grid - 1)
        def _staging():
            # one block-diagonal (R, KH*W) dot pair for ALL heads
            # (cross-head terms masked) instead of 2*KH tiny dots +
            # KH state RMW rounds — same rewrite as attention_decode
            # (~30 us/layer at engine shapes)
            W = kst_ref.shape[-2]
            R = n_kv_heads * G
            C = n_kv_heads * W
            rows = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            w_col = cols % W
            same_head = (rows // G) == (cols // W)
            mask = jnp.logical_and(
                same_head, jnp.logical_and(w_col < n_st, length > 0)
            )
            if window is not None:
                # staging col c is global position length + c
                mask = jnp.logical_and(mask, w_col >= n_st - window)
            q = q_ref[0].reshape(R, q_ref.shape[-1]).astype(jnp.bfloat16)
            kst = kst_ref[(*lead,)].reshape(C, kst_ref.shape[-1])
            s = jax.lax.dot_general(
                q, kst,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            s = jnp.where(mask, s, MASK_VALUE)
            m_prev = m_scr[:, :1]
            l_prev = l_scr[:, :1]
            m_new = jnp.maximum(
                m_prev, jnp.max(s, axis=-1, keepdims=True)
            )
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l_scr[...] = jnp.broadcast_to(
                l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True),
                (R, 128),
            )
            m_scr[...] = jnp.broadcast_to(m_new, (R, 128))
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                vst_ref[(*lead,)].reshape(C, vst_ref.shape[-1]),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc[...] = acc[...] * alpha + pv

    @pl.when(j == num_pages_grid - 1)
    def _finish():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc[...] / l_safe).astype(o_ref.dtype)


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
    k_stage=None,
    v_stage=None,
    staged_n=None,
    layer: int | None = None,
    window: int | None = None,
    softcap: float | None = None,
):
    """Single-token decode over a paged KV pool.

    Args:
      q: (B, QH, 1, E).
      pool_k/pool_v: (n_pages, KH, page_size, E), fp or int8.
      page_table: (B, max_pages) int32 — page ids per sequence, in order;
        unused entries may be any valid id (they're clamped/predicated).
      lengths: (B,) int32 valid token counts (in the POOL; staged tokens
        counted separately).
      pool_k_scale/pool_v_scale: (n_pages, KH, page_size) fp32 for int8.
      k_stage/v_stage/staged_n: optional bf16 staging of recent un-flushed
        tokens, (B, KH, W, E) — as in ops/attention_decode.py.
      window: optional sliding-window size (Mistral serving): the query
        attends only the last `window` keys. Window-dead pages are skipped
        (predicate + conservative low page clamp), so the pool read per
        step is O(window) regardless of context length.
    Returns (B, QH, 1, E).
    """
    B, QH, _, E = q.shape
    stacked = layer is not None
    n_pages, KH, page_size, _ = pool_k.shape[-4:]
    G = QH // KH
    max_pages = page_table.shape[1]
    quantized = pool_k.dtype == jnp.int8
    staged = k_stage is not None
    if scale is None:
        scale = 1.0 / (E**0.5)

    q_r = q.reshape(B, KH, G, E)

    def page_of(b, j, table, lens):
        last = jnp.maximum((lens[b] + page_size - 1) // page_size - 1, 0)
        if window is None:
            return table[b, jnp.minimum(j, last)]
        # conservative low clamp (ignores staging occupancy, which only
        # moves the window start right): window-dead left pages reuse the
        # first live page's DMA
        lo = jnp.minimum(
            jnp.maximum((lens[b] - window) // page_size, 0), last
        )
        return table[b, jnp.clip(j, lo, last)]

    if stacked:
        def page_idx(b, j, table, lens):
            return (layer, page_of(b, j, table, lens), 0, 0, 0)

        kv_block = (1, 1, KH, page_size, E)
    else:
        def page_idx(b, j, table, lens):
            return (page_of(b, j, table, lens), 0, 0, 0)

        kv_block = (1, KH, page_size, E)

    in_specs = [
        pl.BlockSpec((1, KH, G, E), lambda b, j, table, lens: (b, 0, 0, 0)),
        pl.BlockSpec(kv_block, page_idx),
        pl.BlockSpec(kv_block, page_idx),
    ]
    operands = [q_r, pool_k, pool_v]
    if quantized:
        if stacked:
            sc_spec = pl.BlockSpec(
                (1, 1, KH, 1, page_size),
                lambda b, j, table, lens: (
                    layer, page_of(b, j, table, lens), 0, 0, 0
                ),
            )
            nl = pool_k.shape[0]
            operands += [
                pool_k_scale.reshape(nl, n_pages, KH, 1, page_size),
                pool_v_scale.reshape(nl, n_pages, KH, 1, page_size),
            ]
        else:
            sc_spec = pl.BlockSpec(
                (1, KH, 1, page_size),
                lambda b, j, table, lens: (
                    page_of(b, j, table, lens), 0, 0, 0
                ),
            )
            operands += [
                pool_k_scale[:, :, None, :],
                pool_v_scale[:, :, None, :],
            ]
        in_specs += [sc_spec, sc_spec]
    if staged:
        W = k_stage.shape[-2]
        if stacked:
            st_spec = pl.BlockSpec(
                (1, 1, KH, W, E), lambda b, j, table, lens: (b, layer, 0, 0, 0)
            )
        else:
            st_spec = pl.BlockSpec(
                (1, KH, W, E), lambda b, j, table, lens: (b, 0, 0, 0)
            )
        in_specs += [st_spec, st_spec, pl.BlockSpec(memory_space=pltpu.SMEM)]
        operands += [
            k_stage.astype(jnp.bfloat16),
            v_stage.astype(jnp.bfloat16),
            jnp.asarray(staged_n, jnp.int32).reshape(1),
        ]

    kernel = functools.partial(
        _paged_kernel,
        scale=scale,
        page_size=page_size,
        n_kv_heads=KH,
        group=G,
        quantized=quantized,
        staged=staged,
        num_pages_grid=max_pages,
        stacked=stacked,
        window=window,
        softcap=softcap,
        flat_dots=os.environ.get("NNOP_DECODE_FLAT", "auto") != "0",
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, KH * G, E), lambda b, j, table, lens: (b, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((KH * G, E), jnp.float32),
            pltpu.VMEM((KH * G, 128), jnp.float32),
            pltpu.VMEM((KH * G, 128), jnp.float32),
        ],
    )
    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KH * G, E), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(page_table.astype(jnp.int32), lengths.astype(jnp.int32), *operands)
    return o.reshape(B, QH, 1, E)
