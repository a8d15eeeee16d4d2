"""Flash-decode attention with INT8 KV-cache dequant fused in-loop.

North-star headline path (BASELINE.json: "INT8 KV-cache with dequant fused
into the attention inner loop ... ≥85% of per-chip HBM roofline") — no
reference counterpart (the reference has no KV cache or decode path at
all; SURVEY.md §5).

Decode is HBM-bandwidth-bound: one query token attends a long cache, so
the whole K/V stream is read once per step. Storing K/V as int8 halves/
quarters the bytes vs bf16/f32 — but only if dequant doesn't materialize
fp copies. Key observation: with per-token scales s_j,

    scores[g, j] = (q_g · k_j^int8) * s_j        (scale factors out of E)
    out = (p ⊙ s^v) @ v^int8                      (fold v scale into p)

so dequant costs O(block_k) multiplies per block instead of O(block_k·E),
and the int8 values go straight from VMEM through a cast into the MXU.

Grid layout: (B, num_kv_blocks) with ALL KV heads riding in each block —
an unrolled in-kernel head loop. Per-grid-step fixed cost on this part is
~20 us, so fewer, larger steps win (an earlier (B, KH, num_kv) grid spent
more time on step overhead than on the KV stream).

Per-sequence cache lengths ride in SMEM via PrefetchScalarGridSpec: index
maps clamp the KV block index past each sequence's length (repeated index
-> DMA skipped) and compute is predicated off for dead blocks.

Measured (v5e, B8 QH32 KH8 S4096 E128 int8): 698 GB/s = 85% of the HBM
roofline — at the chip's achievable copy bandwidth (the pure-HBM-copy
calibration measures 670 GB/s).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import cdiv, interpret_default

MASK_VALUE = -1e30


def _decode_kernel(
    lengths_ref,  # scalar prefetch: (B,) int32
    q_ref,        # (NB, KH, G, E)
    k_ref,        # (NB, KH, bk, E) int8 or fp
    v_ref,
    *rest,
    scale: float,
    block_k: int,
    n_kv_heads: int,
    group: int,
    quantized: bool,
    num_kv: int,
    cache_len: int,
    staged: bool = False,
    stacked: bool = False,
    window: int | None = None,
    softcap: float | None = None,
    n_draft: int = 1,
    block_b: int = 1,
    int8_dots: bool = False,
    flat_dots: bool = True,
):
    rest = list(rest)
    ks_ref = vs_ref = kst_ref = vst_ref = stn_ref = qs_ref = None
    if quantized:
        ks_ref = rest.pop(0)
        vs_ref = rest.pop(0)
    if int8_dots:
        qs_ref = rest.pop(0)  # SMEM (B, KH) f32 per-(seq, head) q scale
    if staged:
        # un-flushed recent tokens (bf16): (NB, KH, W, E) + valid count
        kst_ref = rest.pop(0)
        vst_ref = rest.pop(0)
        stn_ref = rest.pop(0)
    o_ref, acc, m_scr, l_scr = rest

    b = pl.program_id(0)
    ik = pl.program_id(1)
    # R rows per KV head: `group` query heads x n_draft query tokens
    # (row r = t * group + g). The n_draft query tokens are the LAST
    # n_draft staged entries; row t's global position is
    # length + n_st - n_draft + t, so the cache part (cols < length) is
    # position-uniform and only staging needs the intra-draft causal mask.
    G = group * n_draft
    n_st = stn_ref[0] if staged else 0
    # per-sequence lengths of the block_b sequences riding this step
    lens = [lengths_ref[b * block_b + bi] for bi in range(block_b)]

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    len_max = lens[0]
    len_min = lens[0]
    for x in lens[1:]:
        len_max = jnp.maximum(len_max, x)
        len_min = jnp.minimum(len_min, x)
    live_any = ik * block_k < len_max
    if window is not None:
        # left edge from the group MIN: the shortest sequence's window
        # reaches furthest left
        live_any = jnp.logical_and(
            live_any, ik * block_k + block_k - 1 >= len_min + n_st - window
        )

    @pl.when(live_any)
    def _step():
        if flat_dots:
            # rows/cols geometry is bi-independent: build once per step
            KH, bk = n_kv_heads, block_k
            R, C = KH * G, KH * bk
            rows = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
            geom = (
                (rows // G) == (cols // bk),      # same_head
                ik * bk + (cols % bk),            # global cache position
                (rows % G) // group,              # draft-row index
            )
        for bi in range(block_b):
            if flat_dots:
                _decode_step_b_flat(
                    bi, lens[bi], ik, geom, q_ref, k_ref, v_ref, ks_ref,
                    vs_ref, acc, m_scr, l_scr, scale=scale,
                    block_k=block_k, n_kv_heads=n_kv_heads, group=group,
                    quantized=quantized, cache_len=cache_len,
                    stacked=stacked, window=window, softcap=softcap,
                    n_draft=n_draft, n_st=n_st, G=G, qs_ref=qs_ref, b=b,
                    block_b=block_b,
                )
            else:
                _decode_step_b(
                    bi, lens[bi], ik, q_ref, k_ref, v_ref, ks_ref,
                    vs_ref, acc, m_scr, l_scr, scale=scale,
                    block_k=block_k, n_kv_heads=n_kv_heads, group=group,
                    quantized=quantized, cache_len=cache_len,
                    stacked=stacked, window=window, softcap=softcap,
                    n_draft=n_draft, n_st=n_st, G=G, qs_ref=qs_ref, b=b,
                    block_b=block_b,
                )

    if staged:

        @pl.when(ik == num_kv - 1)
        def _staging():
            for bi in range(block_b):
                _staging_step_b(
                    bi, lens[bi], q_ref, kst_ref, vst_ref, acc, m_scr,
                    l_scr, scale=scale, n_kv_heads=n_kv_heads,
                    group=group, stacked=stacked, window=window,
                    softcap=softcap, n_draft=n_draft, n_st=n_st, G=G,
                    qs_ref=qs_ref, b=b, block_b=block_b,
                )

    @pl.when(ik == num_kv - 1)
    def _finish():
        l = l_scr[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        R = n_kv_heads * G
        o_ref[...] = (acc[...] / l_safe).astype(o_ref.dtype).reshape(
            block_b, R, o_ref.shape[-1]
        )


def _decode_step_b(
    bi, length, ik, q_ref, k_ref, v_ref, ks_ref, vs_ref, acc, m_scr,
    l_scr, *, scale, block_k, n_kv_heads, group, quantized, cache_len,
    stacked, window, softcap, n_draft, n_st, G, qs_ref=None, b=None,
    block_b=1,
):
    """One sequence's online-softmax update for KV block ik (scratch
    rows [bi][kh][r])."""
    lead = (0, bi) if stacked else (bi,)
    R = n_kv_heads * G
    cols = ik * block_k + jax.lax.broadcasted_iota(
        jnp.int32, (G, block_k), 1
    )
    mask = cols < length
    if window is not None:
        # row t (= r // group) sits at global position
        # length + n_st - n_draft + t; its window starts one past
        # position - window
        row_t = (
            jax.lax.broadcasted_iota(jnp.int32, (G, block_k), 0)
            // group
        )
        mask = jnp.logical_and(
            mask,
            cols >= length + n_st - n_draft + row_t + 1 - window,
        )
    int8_dots = qs_ref is not None
    for kh in range(n_kv_heads):
        sl = slice(bi * R + kh * G, bi * R + (kh + 1) * G)
        q = q_ref[bi, kh]
        k = k_ref[(*lead, kh)]
        if int8_dots:
            # native int8 MXU dot: no per-element K cast (the cast is
            # what makes the dequant path compute-bound at short
            # windows — measured 4x cheaper, scripts/probe_int8_dot.py)
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            s = s * (scale * qs_ref[b * block_b + bi, kh])
        else:
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16) if quantized else q,
                k.astype(jnp.bfloat16) if quantized else k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s * scale
        if quantized:
            s = s * ks_ref[(*lead, kh)]  # (1, bk) per-token K scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        s = jnp.where(mask, s, MASK_VALUE)

        m_prev = m_scr[sl, :1]
        l_prev = l_scr[sl, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        l_scr[sl, :] = jnp.broadcast_to(
            l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), (G, 128)
        )
        m_scr[sl, :] = jnp.broadcast_to(m_new, (G, 128))

        if quantized:
            vs = vs_ref[(*lead, kh)]
            if cache_len % block_k != 0:
                vcols = ik * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, vs.shape, 1
                )
                vs = jnp.where(vcols < cache_len, vs, 0.0)
            p = p * vs  # fold per-token V scale into P
            if int8_dots:
                # quantize P per row (p >= 0) and keep V int8: the V
                # cast is replaced by O(G*bk) quantization VPU work
                pmax = jnp.maximum(
                    jnp.max(p, axis=-1, keepdims=True), 1e-20
                )
                pi = jnp.round(p * (127.0 / pmax)).astype(jnp.int8)
                pv = jax.lax.dot_general(
                    pi, v_ref[(*lead, kh)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * (pmax * (1.0 / 127.0))
            else:
                pv = jax.lax.dot_general(
                    p.astype(jnp.bfloat16),
                    v_ref[(*lead, kh)].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        else:
            v_blk = v_ref[(*lead, kh)]
            if cache_len % block_k != 0:
                vrows = ik * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, 1), 0
                )
                v_blk = jnp.where(
                    vrows < cache_len, v_blk, jnp.zeros_like(v_blk)
                )
            pv = jax.lax.dot_general(
                p.astype(v_blk.dtype),
                v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc[sl, :] = acc[sl, :] * alpha + pv


def _decode_step_b_flat(
    bi, length, ik, geom, q_ref, k_ref, v_ref, ks_ref, vs_ref, acc,
    m_scr, l_scr, *, scale, block_k, n_kv_heads, group, quantized,
    cache_len, stacked, window, softcap, n_draft, n_st, G, qs_ref=None,
    b=None, block_b=1,
):
    """One sequence's update for KV block ik with ALL KV heads in one
    block-diagonal MXU call pair (the _staging_step_b trick applied to
    the cache stream): rows R = KH*G score against C = KH*bk flattened
    key columns, cross-head terms masked out, ONE softmax state update
    on the (R, C) block. The per-(bi, kh) loop this replaces issued
    2*KH tiny (G, bk) dots + ~10*KH small-tile VPU ops per sequence per
    grid step — at G=4 each VPU op under-fills the 8-sublane tile, and
    op-issue overhead dominates the short-window path (the r4 decode
    bound table's 2.7x-over-byte-bound attribution). The masked
    cross-head MACs are free next to the byte bound: R*C*E MACs per
    sequence ~ 2.7 us/grid-step at engine shapes vs 13.3 us of KV DMA
    (int8, block_b=8, bk=4096)."""
    lead = (0, bi) if stacked else (bi,)
    KH = n_kv_heads
    R = KH * G
    bk = block_k
    C = KH * bk
    E = q_ref.shape[-1]
    sl = slice(bi * R, (bi + 1) * R)
    same_head, pos, row_t = geom

    mask = jnp.logical_and(same_head, pos < length)
    if window is not None:
        # row t's global position is length + n_st - n_draft + t; its
        # window starts one past position - window
        mask = jnp.logical_and(
            mask, pos >= length + n_st - n_draft + row_t + 1 - window
        )

    q = q_ref[bi].reshape(R, E)          # (KH, G, E) -> (R, E)
    k = k_ref[(*lead,)].reshape(C, E)    # (KH, bk, E) -> (C, E)
    int8_dots = qs_ref is not None
    if int8_dots:
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        # per-row q scale: row r belongs to KV head r // G (SMEM scalars
        # broadcast per G-row band, lane-0 column vector)
        qs_rows = jnp.concatenate(
            [
                jnp.full((G, 1), qs_ref[b * block_b + bi, kh],
                         jnp.float32)
                for kh in range(KH)
            ],
            axis=0,
        )
        s = s * (qs_rows * scale)
    else:
        qd = q.astype(jnp.bfloat16) if quantized else q
        kd = k.astype(jnp.bfloat16) if quantized else k
        s = jax.lax.dot_general(
            qd, kd, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale
    if quantized:
        # per-token K scale, flattened across heads on the lane axis
        ks_cols = jnp.concatenate(
            [ks_ref[(*lead, kh)] for kh in range(KH)], axis=1
        )  # (1, C)
        s = s * ks_cols
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    s = jnp.where(mask, s, MASK_VALUE)

    m_prev = m_scr[sl, :1]
    l_prev = l_scr[sl, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    l_scr[sl, :] = jnp.broadcast_to(
        l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), (R, 128)
    )
    m_scr[sl, :] = jnp.broadcast_to(m_new, (R, 128))

    if quantized:
        vs_cols = jnp.concatenate(
            [vs_ref[(*lead, kh)] for kh in range(KH)], axis=1
        )  # (1, C)
        if cache_len % block_k != 0:
            vs_cols = jnp.where(pos[:1] < cache_len, vs_cols, 0.0)
        p = p * vs_cols  # fold per-token V scale into P
        if int8_dots:
            # quantize P per row (p >= 0) and keep V int8; cross-head
            # entries are exact zeros so they survive quantization
            pmax = jnp.maximum(jnp.max(p, axis=-1, keepdims=True), 1e-20)
            pi = jnp.round(p * (127.0 / pmax)).astype(jnp.int8)
            pv = jax.lax.dot_general(
                pi, v_ref[(*lead,)].reshape(C, E),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (pmax * (1.0 / 127.0))
        else:
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                v_ref[(*lead,)].reshape(C, E).astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        v_blk = v_ref[(*lead,)].reshape(C, E)
        if cache_len % block_k != 0:
            vrows = ik * bk + (
                jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0) % bk
            )
            v_blk = jnp.where(vrows < cache_len, v_blk,
                              jnp.zeros_like(v_blk))
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc[sl, :] = acc[sl, :] * alpha + pv


def _staging_step_b(
    bi, length, q_ref, kst_ref, vst_ref, acc, m_scr, l_scr, *, scale,
    n_kv_heads, group, stacked, window, softcap, n_draft, n_st, G,
    qs_ref=None, b=None, block_b=1,
):
    """One sequence's update for the un-flushed staging tokens (bf16,
    no dequant): global positions [length, length + n_st).

    Single flattened block-diagonal dot pair per sequence: all heads'
    rows (R = KH*G) score against all heads' staged keys (KH*W columns)
    in ONE MXU call, with cross-head terms masked out, then one state
    update and one PV dot. The per-head loop this replaces issued
    2*KH tiny dots + KH scratch RMW rounds per sequence per grid step —
    ~30 us/layer at engine shapes, ~30% of decode-attention time. The
    masked cross-head MACs are free (the (R, KH*W) score block is tiny
    next to the KV stream)."""
    lead = (bi, 0) if stacked else (bi,)
    R = n_kv_heads * G
    W = kst_ref.shape[-2]
    C = n_kv_heads * W
    sl = slice(bi * R, (bi + 1) * R)
    # rows: [head][draft t][group g]; cols: [head][staged w]
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1)
    row_t = (rows % G) // group
    w_col = cols % W
    same_head = (rows // G) == (cols // W)
    # intra-draft causal: row t attends staged cols up to its own
    # position (n_st - n_draft + t); degenerates to cols < n_st
    # at n_draft = 1
    mask = jnp.logical_and(
        same_head,
        jnp.logical_and(w_col <= n_st - n_draft + row_t, length > 0),
    )
    if window is not None:
        # staging col j is global position length + j
        mask = jnp.logical_and(
            mask, w_col >= n_st - n_draft + row_t + 1 - window
        )
    if qs_ref is not None:
        # int8_dots mode: dequantize the int8 q for the bf16 staging K
        # (R*E elements — negligible); scales are per (seq, head)
        q = jnp.concatenate(
            [
                (q_ref[bi, kh].astype(jnp.float32)
                 * qs_ref[b * block_b + bi, kh]).astype(jnp.bfloat16)
                for kh in range(n_kv_heads)
            ],
            axis=0,
        )
    else:
        q = q_ref[bi].reshape(R, q_ref.shape[-1]).astype(jnp.bfloat16)
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
    m_prev = m_scr[sl, :1]
    l_prev = l_scr[sl, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    l_scr[sl, :] = jnp.broadcast_to(
        l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), (R, 128)
    )
    m_scr[sl, :] = jnp.broadcast_to(m_new, (R, 128))
    pv = jax.lax.dot_general(
        p.astype(jnp.bfloat16),
        vst_ref[(*lead,)].reshape(C, vst_ref.shape[-1]),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc[sl, :] = acc[sl, :] * alpha + pv


def pick_block_b(B, KH, bk, E, itemsize, budget=32 * 1024 * 1024):
    """Largest block_b in (8, 4, 2, 1) dividing B whose K+V block DMA
    fits the VMEM budget (the block is double-buffered by the pipeline;
    32 MB leaves room for staging/scales/scratch under the 100 MB cap)."""
    for nb in (8, 4, 2):
        if B % nb == 0 and nb * KH * bk * E * 2 * itemsize <= budget:
            return nb
    return 1


def decode_attention(
    q,
    k_cache,
    v_cache,
    lengths,
    k_scale=None,
    v_scale=None,
    *,
    scale: float | None = None,
    block_k: int = 4096,
    k_stage=None,
    v_stage=None,
    staged_n=None,
    layer: int | None = None,
    window: int | None = None,
    softcap: float | None = None,
    block_b: int = 1,
    int8_dots: bool = False,
    flat_dots: bool | None = None,
):
    """Single-token decode attention over a (possibly INT8) KV cache.

    Args:
      q: (B, QH, 1, E). k_cache/v_cache: (B, KH, S, E), fp or int8.
      lengths: (B,) int32 — valid prefix length per sequence (cache only;
        staged tokens are counted separately).
      k_scale/v_scale: (B, KH, S) fp32 per-token scales (int8 caches).
      k_stage/v_stage: optional (B, KH, W, E) bf16 staging buffers holding
        the last `staged_n` un-flushed tokens (global positions
        [lengths[b], lengths[b]+staged_n)); attended without dequant.
        When `layer` is given, staging is (B, n_layers, KH, W, E).
      staged_n: scalar int32, uniform across the batch (the engine
        advances all live slots together within a flush window).
      layer: when caches are STACKED 5D (n_layers, B, KH, S, E) — the
        engine's layout — pass the static layer index. The layer slice is
        taken by the BlockSpec index maps, so no per-layer slice copy of
        the cache is ever materialized.
      window: optional sliding-window size (Mistral serving): the query
        attends only the last `window` keys. Window-dead cache blocks are
        skipped (predicate + conservative low index clamp), so the KV
        stream read per step is O(window), not O(length) — the cache
        layout stays linear (memory is still O(length); a rolling-buffer
        cache is a possible future optimization).
    Returns (B, QH, T, E) in q.dtype.

    Multi-token (T > 1) is the SPECULATIVE-VERIFY mode: the T query
    tokens must be the last T staged entries (positions
    [lengths[b] + staged_n - T, lengths[b] + staged_n)); the kernel
    applies the intra-draft causal mask in the staging step while the
    cache part stays position-uniform.

    block_b: sequences per grid step. At serving shapes (short caches:
    one KV block per sequence) the (B, 1) grid pays its per-step fixed
    cost B times for ~1.3 MB DMAs; block_b=8 cuts the step count 8x
    with one bigger DMA per step (per-sequence lengths still masked
    exactly; block skipping degrades to the group max). Requires
    B % block_b == 0.

    int8_dots (int8 caches only): run both MXU contractions natively in
    int8 instead of casting K/V to bf16. q is quantized per (seq, head)
    on the host (scalar scales ride SMEM); P is re-quantized per row
    in-kernel against its own max (P >= 0). The per-element K/V casts
    are what make the dequant path compute-bound at short windows
    (measured 453 vs 722 GB/s at S=640; the cast-free QK dot is 4x
    cheaper — scripts/probe_int8_dot.py). Adds ~0.4% relative noise to
    logits and output rows — below the int8 cache quantization noise
    itself; the staging (bf16) side is computed from the dequantized q.

    flat_dots: score all KV heads per sequence in one block-diagonal
    MXU call pair instead of a per-head loop (see _decode_step_b_flat).
    Default on; NNOP_DECODE_FLAT=0 restores the per-head loop.
    """
    B, QH, T, E = q.shape
    stacked = layer is not None
    if block_b == 0:  # auto: batch sequences up to the VMEM budget
        sub0 = 32 if k_cache.dtype == jnp.int8 else 8
        bk0 = min(block_k, ((S0 := k_cache.shape[-2]) + sub0 - 1)
                  // sub0 * sub0)
        block_b = pick_block_b(B, k_cache.shape[-3], bk0, E,
                               k_cache.dtype.itemsize)
    if B % block_b != 0:
        raise ValueError(f"B={B} not divisible by block_b={block_b}")
    _, KH, S, _ = k_cache.shape[-4:]
    if flat_dots is None:
        # measured dispatch (v5e, NOTES.md round 5): flat wins 30%+ at
        # short caches any block_b (75.8 vs 110.8 us/layer at S=640)
        # and 13% at long caches when block_b > 1 (327 vs 376 us at
        # S=4096, block_b=2); the per-head loop keeps a ~8% edge only
        # at long-S block_b=1 where per-step overhead is already
        # amortized over one full-width block (86.1 vs 92.8 us).
        env = os.environ.get("NNOP_DECODE_FLAT", "auto")
        if env in ("0", "1"):
            flat_dots = env == "1"
        else:
            flat_dots = block_b > 1 or S <= 2048
    G = QH // KH
    quantized = k_cache.dtype == jnp.int8
    staged = k_stage is not None
    if T > 1 and not staged:
        raise ValueError(
            "multi-token decode (speculative verify) requires the draft "
            "tokens' K/V in the staging buffer"
        )
    if scale is None:
        scale = 1.0 / (E**0.5)
    sub = 32 if quantized else 8
    bk = min(block_k, ((S + sub - 1) // sub) * sub)
    if flat_dots:
        # cap the flat score block's columns (C = KH*bk): its (R, C)
        # f32 temporaries live per-sequence alongside the double-
        # buffered KV windows, and an uncapped bk=4096 at KH=8 OOMs
        # VMEM (166 MB) at block_b=8. More, narrower KV steps stream
        # the same bytes; measured at S=4096 int8 the capped flat path
        # BEATS the per-head loop (327 vs 376 us/layer at block_b=2,
        # bk=1024 — NOTES.md round 5 flat-dots section).
        max_cols = int(os.environ.get("NNOP_DECODE_FLAT_COLS", 8192))
        kh_ = k_cache.shape[-3]
        if kh_ * bk > max_cols:
            bk = max((max_cols // kh_) // sub * sub, sub)
    num_kv = cdiv(S, bk)

    # (B, KH*T*G, E): rows grouped per KV head, row r = t * G + g so the
    # kernel recovers the draft index as r // G
    q_r = (
        q.reshape(B, KH, G, T, E)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, KH, T * G, E)
    )
    q_scales = None
    if int8_dots:
        if not quantized:
            raise ValueError("int8_dots requires an int8 KV cache")
        qf = q_r.astype(jnp.float32)
        q_scales = jnp.maximum(
            jnp.max(jnp.abs(qf), axis=(2, 3)), 1e-8
        ) / 127.0  # (B, KH): per-(seq, head-group) symmetric scale
        q_r = jnp.clip(
            jnp.round(qf / q_scales[:, :, None, None]), -127, 127
        ).astype(jnp.int8)

    def _group_len(b, lens, red):
        # reduce the block_b lengths riding grid step b (index maps see
        # the raw (B,) prefetch array)
        out = lens[b * block_b]
        for i in range(1, block_b):
            out = red(out, lens[b * block_b + i])
        return out

    def kv_last(b, lens):
        # clamp past the last live block: repeated index -> DMA skipped
        gmax = _group_len(b, lens, jnp.maximum)
        return jnp.maximum((gmax + bk - 1) // bk - 1, 0)

    def kv_clamp(b, ik, lens):
        hi = kv_last(b, lens)
        if window is None:
            return jnp.minimum(ik, hi)
        # conservative low clamp (ignores staging occupancy <= flush
        # window; group MIN so no live block is skipped for any member)
        gmin = _group_len(b, lens, jnp.minimum)
        lo = jnp.minimum(jnp.maximum((gmin - window) // bk, 0), hi)
        return jnp.clip(ik, lo, hi)

    if stacked:
        def kv_idx(b, ik, lens):
            return (layer, b, 0, kv_clamp(b, ik, lens), 0)

        kv_block = (1, block_b, KH, bk, E)
    else:
        def kv_idx(b, ik, lens):
            return (b, 0, kv_clamp(b, ik, lens), 0)

        kv_block = (block_b, KH, bk, E)

    in_specs = [
        pl.BlockSpec((block_b, KH, T * G, E),
                     lambda b, ik, lens: (b, 0, 0, 0)),
        pl.BlockSpec(kv_block, kv_idx),
        pl.BlockSpec(kv_block, kv_idx),
    ]
    operands = [q_r, k_cache, v_cache]
    if quantized:
        if stacked:
            sc_spec = pl.BlockSpec(
                (1, block_b, KH, 1, bk),
                lambda b, ik, lens: (
                    layer, b, 0, 0, kv_clamp(b, ik, lens)
                ),
            )
            operands += [
                k_scale.reshape(k_scale.shape[0], B, KH, 1, S),
                v_scale.reshape(v_scale.shape[0], B, KH, 1, S),
            ]
        else:
            sc_spec = pl.BlockSpec(
                (block_b, KH, 1, bk),
                lambda b, ik, lens: (
                    b, 0, 0, kv_clamp(b, ik, lens)
                ),
            )
            operands += [k_scale[:, :, None, :], v_scale[:, :, None, :]]
        in_specs += [sc_spec, sc_spec]
    if int8_dots:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        operands += [q_scales]
    if staged:
        W = k_stage.shape[-2]
        if stacked:
            st_spec = pl.BlockSpec(
                (block_b, 1, KH, W, E),
                lambda b, ik, lens: (b, layer, 0, 0, 0),
            )
        else:
            st_spec = pl.BlockSpec(
                (block_b, KH, W, E), lambda b, ik, lens: (b, 0, 0, 0)
            )
        in_specs += [
            st_spec,
            st_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        operands += [
            k_stage.astype(jnp.bfloat16),
            v_stage.astype(jnp.bfloat16),
            jnp.asarray(staged_n, jnp.int32).reshape(1),
        ]

    kernel = functools.partial(
        _decode_kernel,
        scale=scale,
        block_k=bk,
        n_kv_heads=KH,
        group=G,
        quantized=quantized,
        num_kv=num_kv,
        cache_len=S,
        staged=staged,
        stacked=stacked,
        window=window,
        softcap=softcap,
        n_draft=T,
        block_b=block_b,
        int8_dots=int8_dots,
        flat_dots=flat_dots,
    )
    R = KH * T * G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block_b, num_kv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_b, R, E), lambda b, ik, lens: (b, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b * R, E), jnp.float32),
            pltpu.VMEM((block_b * R, 128), jnp.float32),
            pltpu.VMEM((block_b * R, 128), jnp.float32),
        ],
    )
    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, E), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(lengths.astype(jnp.int32), *operands)
    return (
        o.reshape(B, KH, T, G, E)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, QH, T, E)
    )
