"""Flash attention forward (Pallas TPU) + public API with custom VJP.

Re-derivation of /root/reference/src/attention.jl (+ attention_crc.jl) as a
TPU-first kernel — not a translation:

* The reference is FA-1 style (in-loop output rescaling via p_scale/o_scale,
  attention.jl:102-110). This build is FA-2 style: the accumulator carries
  un-normalized partial sums and normalization is deferred to the final KV
  step — identical outputs, fewer VPU ops per tile.
* The reference's hand-written register-tiled `mma!` + shared-memory
  choreography (mma.jl, attention.jl:17-20) disappear: tiles live in VMEM
  via BlockSpecs and contractions are `jnp.dot` on the MXU.
* The reference saves separate row-max `ms` and denominator `ls`
  (attention.jl:128-129); this build saves the single standard
  LSE = m + log(l) residual.
* Two kernel families (round 2). FAST PATH for featureless aligned
  shapes: fully STATIC strip kernels — one pallas_call per causal q-block
  strip with a static KV width (`_fwd_causal_multicall`, realizing the 2x
  causal flop saving: 27.6 -> 59.6 TF/s measured), and a full-width
  static kernel for non-causal (`_fwd_rect_static`). Softmax state lives
  in VALUES (no scratch, no pl.when, no dynamic addressing) — at E=64
  the per-grid-step fixed machinery otherwise dominates (NOTES.md).
  GENERAL PATH (`_fwd_kernel_rect`): grid (B, QH, q_blocks, kv_blocks)
  with scratch online state, serving pair bias / kpad / segments /
  ragged tails / chunked-prefill offsets; causal tile-skip via clamped
  index maps + predicates (the reference's `end_iter`, attention.jl:47).
* GQA folds into the K/V index maps (kv_head = q_head // group,
  mirroring attention.jl:14,28).

Feature parity (SURVEY.md §2.6): causal mask by absolute position
(attention.jl:67-72), key-padding mask for varlen (attention.jl:73-79),
GQA/MQA (QH % KH == 0), additive pair bias with gradient
(attention.jl:59-64), cross-attention QL != KL, arbitrary (non-tile-
multiple) lengths via iota masking (vs. the reference's `in_seq_bounds`
Val, attention.jl:153), plus a `scale` kwarg the reference lacks (it fixes
1/sqrt(E), attention.jl:154 — same default here).

Layouts (TPU row-major; reference is column-major (E,L,H,B) — same logical
axes): q (B, QH, QL, E), k/v (B, KH, KL, E), pair (B, QH, QL, KL),
kpad_mask (B, KL) with True = valid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import (
    cdiv,
    interpret_default,
    round_up,
    sublane_tile,
)

MASK_VALUE = -1e30  # large-negative instead of -inf: avoids inf-inf=NaN


def _ref2d(ref):
    """Load a whole block whose leading dims are all 1 as a 2-D value —
    lets the same strip kernel serve 4-D and 5-D (chunk-folded) specs."""
    x = ref[...]
    return x.reshape(x.shape[-2], x.shape[-1])


def _attn_step(
    q_ref,
    k_ref,
    v_ref,
    pair_blk,
    kpad_blk,
    qseg_blk,
    kseg_blk,
    acc,
    m_scr,
    l_scr,
    *,
    iq,
    ik,
    scale,
    causal,
    block_q,
    block_k,
    kv_len,
    num_kv_static,
    precision,
    row_offset=0,
    block_k_inner=None,
    window=None,
    softcap=None,
):
    """One online-softmax step over a KV block.

    BRANCH-FREE by design: measured on v5e, lax.cond / pl.when regions
    inside the step stall Mosaic's software pipeline and cost far more
    than the masking passes they save (branch-free always-masked causal at
    (512, 2048) runs 1.7x faster than the branched interior-fast-path
    variant). Masking is applied unconditionally whenever any masking
    feature is active; block-level skipping is done by the CALLER's
    pl.when around the whole step (worth it only for fully-dead blocks).
    """
    del block_k_inner  # single-level: inner sub-tiling measured no gain
    ragged_kv = kv_len % block_k != 0
    has_kpad = kpad_blk is not None
    has_seg = qseg_blk is not None

    # fold the softmax scale into q: O(bq*E) instead of O(bq*bk)
    q = (q_ref[0, 0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    s = jax.lax.dot_general(
        q,
        k_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if softcap is not None:
        # Gemma-2 attention logit softcapping: s -> c * tanh(s / c),
        # applied to the scaled scores before any mask/bias
        s = softcap * jnp.tanh(s / softcap)
    if pair_blk is not None:
        s = s + pair_blk.astype(jnp.float32)

    m_prev = m_scr[:, :1]
    mask = None
    if ragged_kv:
        cols0 = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        mask = cols0 < kv_len
    if has_kpad:
        kp = kpad_blk != 0
        mask = kp if mask is None else jnp.logical_and(mask, kp)
    if has_seg:
        # multi-document packing: only same-segment positions attend
        # (segment masking, a la the official JAX flash kernel)
        sm = qseg_blk == kseg_blk  # (bq, 1) == (1, bk) -> (bq, bk)
        mask = sm if mask is None else jnp.logical_and(mask, sm)
    if causal:
        rows = row_offset + iq * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        cols = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        cm = rows >= cols
        if window is not None:
            # sliding window (Mistral): q attends only the last `window`
            # keys — rows - cols < window, self included
            cm = jnp.logical_and(cm, rows - cols < window)
        mask = cm if mask is None else jnp.logical_and(mask, cm)

    if mask is not None:
        s = jnp.where(mask, s, MASK_VALUE)
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    if mask is not None:
        # Hard-zero through the mask (not just exp underflow): a fully
        # masked row has m_new == MASK_VALUE and would otherwise get p == 1.
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    else:
        p = jnp.exp(s - m_new)

    l_prev = l_scr[:, :1]
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)
    v = v_ref[0, 0]
    if ragged_kv:
        # Ragged tail: undefined padding (NaN in interpret mode) must not
        # reach the matmul (0 * NaN = NaN) — zero the invalid rows (TPU
        # analogue of the reference's `in_seq_bounds` guards,
        # attention.jl:153).
        kv_rows = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        v = jnp.where(kv_rows < kv_len, v, jnp.zeros_like(v))
    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    acc[...] = acc[...] * alpha + pv


def _attn_finish(o_ref, lse_ref, acc, m_scr, l_scr):
    l = l_scr[:, :1]
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc[...] / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = m_scr[:, :1] + jnp.log(l_safe)


def _fwd_kernel_rect(
    *refs,
    scale,
    causal,
    has_pair,
    has_kpad,
    has_seg,
    has_offset,
    block_q,
    block_k,
    block_k_inner=None,
    kv_len,
    precision,
    window=None,
    softcap=None,
):
    idx = 0
    offset_ref = None
    if has_offset:
        offset_ref = refs[idx]; idx += 1
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    pair_ref = kpad_ref = qseg_ref = kseg_ref = None
    if has_pair:
        pair_ref = refs[idx]; idx += 1
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    o_ref, lse_ref, acc, m_scr, l_scr = refs[idx : idx + 5]

    iq = pl.program_id(2)
    ik = pl.program_id(3)
    num_kv = pl.num_programs(3)
    row_offset = offset_ref[0] if has_offset else 0

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc[...] = jnp.zeros_like(acc)

    # Causal tile skip: clamped index maps (in _fwd_impl) already avoid
    # the DMA for fully-masked blocks; this predicate skips their compute
    # (reference `end_iter`, attention.jl:47). With a dynamic row offset
    # (chunked prefill) the index maps can't clamp, but the predicate
    # still skips compute above the shifted diagonal.
    active = True
    if causal:
        active = ik * block_k <= iq * block_q + row_offset + block_q - 1
        if window is not None:
            # block fully left of every row's window -> dead
            live_left = (
                ik * block_k + block_k - 1
                >= iq * block_q + row_offset - (window - 1)
            )
            active = jnp.logical_and(active, live_left)

    @pl.when(active)
    def _step():
        _attn_step(
            q_ref,
            k_ref,
            v_ref,
            pair_ref[0, 0] if has_pair else None,
            kpad_ref[0] if has_kpad else None,
            qseg_ref[0] if has_seg else None,
            kseg_ref[0] if has_seg else None,
            acc,
            m_scr,
            l_scr,
            iq=iq,
            ik=ik,
            scale=scale,
            causal=causal,
            block_q=block_q,
            block_k=block_k,
            kv_len=kv_len,
            num_kv_static=cdiv(kv_len, block_k),
            precision=precision,
            row_offset=row_offset,
            block_k_inner=block_k_inner,
            window=window,
            softcap=softcap,
        )

    @pl.when(ik == num_kv - 1)
    def _finish():
        _attn_finish(o_ref, lse_ref, acc, m_scr, l_scr)


def _strip_subtile_mask(
    j, sk, block_q, row0, col0, causal, window, kpad_j, qseg_blk, kseg_j
):
    """Combined mask for one static sub-tile of a strip kernel, or None.

    All offsets are Python ints, so the causal/window components are
    compile-time patterns; kpad/segment components are cheap VPU compares.
    `kpad_j`/`kseg_j` are the sub-tile's own (1, sk) rows — callers keep
    the mask operands laid out (n_sub, sk) so per-sub-tile selection is a
    SUBLANE slice (a lane slice of a (1, kw) row produces an offset
    vector layout Mosaic cannot re-broadcast). Masking only p (not s) is
    exact: an unmasked (too-large) running max rescales p and l
    identically, so the normalized o and the m+log(l) residual are
    unchanged.
    """
    c0 = col0 + j * sk  # global column of the sub-tile's first key
    mask = None
    rows = cols = None

    def iotas():
        nonlocal rows, cols
        if rows is None:
            rows = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block_q, sk), 1)
        return rows, cols

    if causal and row0 < c0 + sk - 1:  # sub-tile touches the diagonal
        r, c = iotas()
        mask = r + (row0 - c0) >= c
    if window is not None and row0 + block_q - 1 - c0 >= window:
        r, c = iotas()
        wm = (r + (row0 - c0)) - c < window
        mask = wm if mask is None else jnp.logical_and(mask, wm)
    if kpad_j is not None:
        kp = kpad_j != 0
        mask = kp if mask is None else jnp.logical_and(mask, kp)
    if qseg_blk is not None:
        sm = qseg_blk == kseg_j
        mask = sm if mask is None else jnp.logical_and(mask, sm)
    return mask


def _chain_update(q, k, v, mask, state, fexp, precision, softcap=None):
    """One value-carried online-softmax sub-tile update for one chain.

    `state` is (m, l, acc) or None for the first sub-tile. q is expected
    pre-scaled (with log2(e) folded in when fexp is exp2)."""
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    if softcap is not None:
        s = softcap * jnp.tanh(s / softcap)
    if state is None:
        m_new = jnp.max(s, axis=-1, keepdims=True)
        p = fexp(s - m_new)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    else:
        m, l, acc = state
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = fexp(s - m_new)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        alpha = fexp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    return m_new, l, acc


def _chain_finish(state, exp2, out_dtype):
    """Normalize a chain's (m, l, acc) into (o, lse-in-nats)."""
    m, l, acc = state
    if exp2:
        m = m * LN2  # lse stays in nats for bwd/ring consumers
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o = (acc / l_safe).astype(out_dtype)
    return o, m + jnp.log(l_safe)


def _causal_strip_kernel(
    *refs,
    scale,
    row0,
    col0,
    block_q,
    sk,
    precision,
    causal=True,
    has_kpad=False,
    has_seg=False,
    window=None,
    softcap=None,
):
    """One q-block strip of causal attention, FULLY STATIC.

    Processes q rows [row0, row0+block_q) against K cols [col0, col0+kw)
    as a Python-unrolled sequence of sk-wide sub-tiles: sub-tiles wholly
    below the diagonal run with zero masking passes; the diagonal
    sub-tile(s) use a compile-time triangular mask (row0/col0 and j are
    Python ints, so the row/col iota offset is a constant). Softmax state
    (m, l, acc) lives in VALUES — no scratch buffers, no pl.when, no
    dynamic addressing — so Mosaic gets straight-line vector code per grid
    step. The 2x causal flop saving is realized by the CALLER launching
    one such call per q block with a static KV width (the below-diagonal
    prefix).

    Round 3: optional kpad / segment masks (one extra VPU compare per
    sub-tile), Gemma-2 softcap, and a static `window` mask + `col0` KV
    offset — these only ADD masking passes to otherwise identical
    straight-line code, keeping packed-document / Mistral / Gemma-2
    training on the fast path (VERDICT r2 item 3).
    """
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    kpad_ref = qseg_ref = kseg_ref = None
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    o_ref, lse_ref = refs[idx : idx + 2]

    exp2 = softcap is None  # see _rect_static_kernel's exp2-fold note
    qscale = scale * LOG2E if exp2 else scale
    fexp = jnp.exp2 if exp2 else jnp.exp
    q = (_ref2d(q_ref).astype(jnp.float32) * qscale).astype(q_ref.dtype)
    qseg = _ref2d(qseg_ref) if has_seg else None  # (bq, 1)
    kpad = _ref2d(kpad_ref) if has_kpad else None  # (n_sub, sk)
    kseg = _ref2d(kseg_ref) if has_seg else None  # (n_sub, sk)
    k_all = _ref2d(k_ref)
    v_all = _ref2d(v_ref)
    kw = k_all.shape[0]
    n_sub = kw // sk
    state = None
    for j in range(n_sub):
        k = k_all[j * sk : (j + 1) * sk, :]
        v = v_all[j * sk : (j + 1) * sk, :]
        mask = _strip_subtile_mask(
            j, sk, block_q, row0, col0, causal, window,
            kpad[j : j + 1, :] if has_kpad else None,
            qseg,
            kseg[j : j + 1, :] if has_seg else None,
        )
        state = _chain_update(
            q, k, v, mask, state, fexp, precision, softcap
        )
    o, lse = _chain_finish(state, exp2, o_ref.dtype)
    o_ref[...] = o.reshape(o_ref.shape)
    lse_ref[...] = lse.astype(lse_ref.dtype).reshape(lse_ref.shape)


_CAUSAL_STRIP_SK = 512
# Strip-call count cap: measured at L=8192 (16 calls, B2 H4 E64 bf16) the
# strip path runs 80.2 TF/s vs the rect fallback's 45.9 — per-call
# dispatch overhead stays negligible while the static sub-tiles keep the
# MXU busy. bq=1024 (8 calls) OOMs scoped VMEM at kw=8192; bq stays 512.
_CAUSAL_STRIP_MAX_CALLS = 16
# K+V blocks at the widest strip are double-buffered by the pipeline;
# bound their footprint so the widest strip compiles (measured: 4.2 MB
# at L=8192 E=64 bf16 fits with ~2 MB of score/p temps on top).
_CAUSAL_STRIP_KV_BYTES = 9 * 1024 * 1024
# Per-sub-window width cap for the chunked path's off-diagonal
# rectangles (r5: no longer a dispatch gate — oversized prefixes stream
# as equal sub-windows merged via lse_merge/summed dQ partials, so the
# path serves ANY L the chunk divides). Sized against the 100 MB scoped
# vmem limit with the kernel's measured non-KV overhead: a 65536-wide
# (67 MB double-buffered K+V) window at E=128 bf16 needed 110.7 MB
# scoped (Mosaic OOM, r5 probe) — ~44 MB of q/out/score temps on top —
# so the cap keeps K+V under 50 MB: scoped total ~= 1.9x the double-
# buffered K+V bytes (110.7 M at 58.7 M K+V, still OOM), i.e. <= 6
# 8192-token sub-windows at the 8B geometry (~95 MB scoped, fits).
_CHUNKED_RECT_KV_BYTES = 50 * 1024 * 1024
# Stacked-window transient HBM cap (ADVICE r3): the windowed strip path
# materializes ~kw/bq copies of K and V; 2 GB admits the 8B geometry
# (B2 KH8 L8192 window=4096 bf16 = 0.6 GB) while bounding the spike on
# long-L/large-window calls, which take the general pipeline instead.
_WINDOW_STACK_HBM_BYTES = 2 * 1024**3


LOG2E = 1.4426950408889634  # 1/ln(2)
LN2 = 0.6931471805599453


def _rect_static_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, sk, precision,
    softcap=None,
):
    """Non-causal forward with the whole KV range per grid step, statically
    unrolled over sk-wide sub-tiles with value-carried softmax state —
    same straight-line structure as _causal_strip_kernel (measured ~2x
    faster than the scratch+pl.when rectangular pipeline at E=64, where
    per-grid-step fixed machinery dominates). Also serves the mask-free
    off-diagonal pieces of the chunked long-context causal decomposition
    (_fwd_causal_chunked).

    exp2 fold (r4): exp(x) lowers to exp2(x * log2e) — folding log2e
    into the one-time q pre-scale deletes one full (bq, sk) VPU multiply
    per sub-tile (these kernels are VPU-pass-bound, probe_attn_prod_gap).
    Scores then live in log2 units; p/l/acc are bit-compatible and the
    lse residual converts back to nats once per strip. softcap needs
    true-scale scores, so it keeps the exp path."""
    exp2 = softcap is None
    qscale = scale * LOG2E if exp2 else scale
    fexp = jnp.exp2 if exp2 else jnp.exp
    q = (_ref2d(q_ref).astype(jnp.float32) * qscale).astype(q_ref.dtype)
    k_all = _ref2d(k_ref)
    v_all = _ref2d(v_ref)
    kw = k_all.shape[0]
    state = None
    for j in range(kw // sk):
        k = k_all[j * sk : (j + 1) * sk, :]
        v = v_all[j * sk : (j + 1) * sk, :]
        state = _chain_update(q, k, v, None, state, fexp, precision, softcap)
    o, lse = _chain_finish(state, exp2, o_ref.dtype)
    o_ref[...] = o.reshape(o_ref.shape)
    lse_ref[...] = lse.reshape(lse_ref.shape)


def _fwd_rect_static(q, k, v, scale, precision, bq):
    """Non-causal featureless forward: grid (B, QH, num_q), full-KL
    blocks, static kernel."""
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    num_q = QL // bq
    o, lse = pl.pallas_call(
        functools.partial(
            _rect_static_kernel, scale=scale,
            sk=min(_CAUSAL_STRIP_SK, KL), precision=precision,
        ),
        grid=(B, QH, num_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, E), lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, KL, E), lambda b, h, iq: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, KL, E), lambda b, h, iq: (b, h // group, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, E), lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq: (b, h, iq, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, QH, QL, E), q.dtype),
            jax.ShapeDtypeStruct((B, QH, QL, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(q, k, v)
    return o, lse


def _fwd_causal_multicall(
    q, k, v, scale, precision, bq, kpad=None, segment_ids=None, softcap=None
):
    """Causal self-attention as num_q strip calls with static KV widths."""
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    num_q = QL // bq
    has_kpad = kpad is not None
    has_seg = segment_ids is not None
    sk = min(_CAUSAL_STRIP_SK, bq)
    # mask rows laid out (n_sub, sk): per-sub-tile selection inside the
    # kernel is then a sublane slice (see _strip_subtile_mask)
    kpad_arr = (
        kpad.astype(jnp.int32).reshape(B, KL // sk, sk) if has_kpad else None
    )
    if has_seg:
        qseg_arr = segment_ids[0].astype(jnp.int32)[:, :, None]
        kseg_arr = segment_ids[1].astype(jnp.int32).reshape(B, KL // sk, sk)
    os, lses = [], []
    for ci in range(num_q):
        kw = (ci + 1) * bq
        n_sub = kw // sk
        kernel = functools.partial(
            _causal_strip_kernel,
            scale=scale,
            row0=ci * bq,
            col0=0,
            block_q=bq,
            sk=sk,
            precision=precision,
            has_kpad=has_kpad,
            has_seg=has_seg,
            softcap=softcap,
        )
        in_specs = [
            pl.BlockSpec((1, 1, bq, E), lambda b, h, ci=ci: (b, h, ci, 0)),
            pl.BlockSpec((1, 1, kw, E), lambda b, h: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, kw, E), lambda b, h: (b, h // group, 0, 0)),
        ]
        operands = [q, k, v]
        if has_kpad:
            # full-rows block: a (1, n_sub, sk) block with n_sub < 8 hits
            # the TPU (8, 128)-divisibility rule; the whole mask is tiny
            in_specs.append(
                pl.BlockSpec((1, KL // sk, sk), lambda b, h: (b, 0, 0))
            )
            operands.append(kpad_arr)
        if has_seg:
            in_specs.append(
                pl.BlockSpec((1, bq, 1), lambda b, h, ci=ci: (b, ci, 0))
            )
            operands.append(qseg_arr)
            in_specs.append(
                pl.BlockSpec((1, KL // sk, sk), lambda b, h: (b, 0, 0))
            )
            operands.append(kseg_arr)
        o_i, lse_i = pl.pallas_call(
            kernel,
            grid=(B, QH),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, bq, E), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h: (b, h, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, QH, bq, E), q.dtype),
                jax.ShapeDtypeStruct((B, QH, bq, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret_default(),
        )(*operands)
        os.append(o_i)
        lses.append(lse_i)
    return jnp.concatenate(os, axis=2), jnp.concatenate(lses, axis=2)


def _causal_gstrip_kernel(
    *refs,
    scale,
    row0,
    g,
    block_q,
    sk,
    precision,
    has_kpad=False,
    has_seg=False,
    softcap=None,
):
    """g ADJACENT q-block strips fused into one call: g independent
    value-carried softmax chains share a single K/V stream.

    Motivation (round-4 mid-L attribution, NOTES.md): at L=4–8k the
    per-q-block strip multicall averages only ~4.5 sub-tiles per call, so
    per-call ramp (DMA prologue, first dot with no preceding VPU work to
    hide, last softmax chain with no next dot to hide behind) dominates
    the residual over the MXU+DMA bound. Grouping g adjacent q blocks
    (rows [row0, row0 + g·bq)) into one kernel body keeps the EXACT
    per-chain causal widths (chain c stops at n_c = (row0+(c+1)·bq)/sk
    sub-tiles — no wasted MXU work, unlike simply doubling block_q) while
    cutting call count g× and deduplicating the shared KV-prefix DMA
    (chain c's keys are a prefix of chain c+1's). The g chains are
    dataflow-independent, giving Mosaic's scheduler material to fill each
    chain's serial max→exp→rescale latency with another chain's dots."""
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    kpad_ref = qseg_ref = kseg_ref = None
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    o_ref, lse_ref = refs[idx : idx + 2]

    exp2 = softcap is None  # see _rect_static_kernel's exp2-fold note
    qscale = scale * LOG2E if exp2 else scale
    fexp = jnp.exp2 if exp2 else jnp.exp
    q_all = (_ref2d(q_ref).astype(jnp.float32) * qscale).astype(q_ref.dtype)
    kpad = _ref2d(kpad_ref) if has_kpad else None  # (n_sub, sk)
    qseg_all = _ref2d(qseg_ref) if has_seg else None  # (g*bq, 1)
    kseg = _ref2d(kseg_ref) if has_seg else None  # (n_sub, sk)
    k_all = _ref2d(k_ref)
    v_all = _ref2d(v_ref)

    qs = [q_all[c * block_q : (c + 1) * block_q, :] for c in range(g)]
    qsegs = [
        qseg_all[c * block_q : (c + 1) * block_q, :] if has_seg else None
        for c in range(g)
    ]
    n = [(row0 + (c + 1) * block_q) // sk for c in range(g)]
    states = [None] * g
    for j in range(n[-1]):
        k = k_all[j * sk : (j + 1) * sk, :]
        v = v_all[j * sk : (j + 1) * sk, :]
        kpad_j = kpad[j : j + 1, :] if has_kpad else None
        kseg_j = kseg[j : j + 1, :] if has_seg else None
        for c in range(g):
            if j >= n[c]:
                continue
            mask = _strip_subtile_mask(
                j, sk, block_q, row0 + c * block_q, 0, True, None,
                kpad_j, qsegs[c], kseg_j,
            )
            states[c] = _chain_update(
                qs[c], k, v, mask, states[c], fexp, precision, softcap
            )
    os_, lses_ = [], []
    for c in range(g):
        o_c, lse_c = _chain_finish(states[c], exp2, o_ref.dtype)
        os_.append(o_c)
        lses_.append(lse_c)
    o_ref[...] = jnp.concatenate(os_, axis=0).reshape(o_ref.shape)
    lse_ref[...] = (
        jnp.concatenate(lses_, axis=0).astype(lse_ref.dtype)
        .reshape(lse_ref.shape)
    )


def _fwd_causal_gstrips(
    q, k, v, scale, precision, bq, g,
    kpad=None, segment_ids=None, softcap=None,
):
    """Causal self-attention as num_q/g grouped-strip calls (see
    _causal_gstrip_kernel). Requires (QL/bq) % g == 0.

    NOT selected by the dispatcher: measured NEUTRAL on the forward
    (scripts/probe_gstrip.py, L=4096 8B geometry: multicall 2.009 ms vs
    g=2/4/8 all 2.00-2.03 ms — even ONE call holding all 8 chains
    matches 8 separate calls, so the fwd mid-L residual is VPU
    *throughput*, not per-call ramp/boundary exposure). Kept as the
    measured closure of that hypothesis and for cross-stack re-probing;
    the same grouping IS a 23% win on the backward, where call count
    multiplies real DMA (flash_attention_bwd._BWD_GQ/_BWD_GK)."""
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    num_q = QL // bq
    has_kpad = kpad is not None
    has_seg = segment_ids is not None
    sk = min(_CAUSAL_STRIP_SK, bq)
    kpad_arr = (
        kpad.astype(jnp.int32).reshape(B, KL // sk, sk) if has_kpad else None
    )
    if has_seg:
        qseg_arr = segment_ids[0].astype(jnp.int32)[:, :, None]
        kseg_arr = segment_ids[1].astype(jnp.int32).reshape(B, KL // sk, sk)
    os, lses = [], []
    for gi in range(num_q // g):
        row0 = gi * g * bq
        kw = (gi + 1) * g * bq
        kernel = functools.partial(
            _causal_gstrip_kernel,
            scale=scale,
            row0=row0,
            g=g,
            block_q=bq,
            sk=sk,
            precision=precision,
            has_kpad=has_kpad,
            has_seg=has_seg,
            softcap=softcap,
        )
        in_specs = [
            pl.BlockSpec(
                (1, 1, g * bq, E), lambda b, h, gi=gi: (b, h, gi, 0)
            ),
            pl.BlockSpec((1, 1, kw, E), lambda b, h: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, kw, E), lambda b, h: (b, h // group, 0, 0)),
        ]
        operands = [q, k, v]
        if has_kpad:
            in_specs.append(
                pl.BlockSpec((1, KL // sk, sk), lambda b, h: (b, 0, 0))
            )
            operands.append(kpad_arr)
        if has_seg:
            in_specs.append(
                pl.BlockSpec(
                    (1, g * bq, 1), lambda b, h, gi=gi: (b, gi, 0)
                )
            )
            operands.append(qseg_arr)
            in_specs.append(
                pl.BlockSpec((1, KL // sk, sk), lambda b, h: (b, 0, 0))
            )
            operands.append(kseg_arr)
        o_i, lse_i = pl.pallas_call(
            kernel,
            grid=(B, QH),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, g * bq, E), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, g * bq, 1), lambda b, h: (b, h, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, QH, g * bq, E), q.dtype),
                jax.ShapeDtypeStruct((B, QH, g * bq, 1), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret_default(),
        )(*operands)
        os.append(o_i)
        lses.append(lse_i)
    return jnp.concatenate(os, axis=2), jnp.concatenate(lses, axis=2)


def lse_merge(o1, lse1, o2, lse2):
    """Combine two normalized attention partials over disjoint KV ranges
    (the ring-attention (o, lse) monoid — the build's generalization of
    the reference's md_reduce, softmax.jl:6-16)."""
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    den = w1 + w2
    o = (o1.astype(jnp.float32) * w1 + o2.astype(jnp.float32) * w2) / den
    return o.astype(o1.dtype), m + jnp.log(den)


def _strip_call(
    kernel, grid, in_specs, out_specs, out_shape, operands, parallel_dims
):
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * parallel_dims,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(*operands)


def _fwd_causal_window(q, k, v, scale, precision, bq, window, softcap=None):
    """Sliding-window causal attention in O(L*window), all-static.

    Fixed KV width kw = round_up(window-1+bq, bq) makes every q block's
    live KV range a stride-bq sliding slice. The first kw/bq - 1 q blocks
    (whose window still reaches position 0) run as plain causal strips
    with a static window mask; the rest run in ONE pallas_call over
    pre-stacked KV windows (built from bq-frame slices — pure XLA concat,
    ~kw/bq x KV read amplification, no gather). Inside that call the
    row-vs-col offset is the CONSTANT kw - bq, so the causal + window
    masks are compile-time patterns identical across grid steps."""
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    sk = min(_CAUSAL_STRIP_SK, bq)
    num_q = QL // bq
    kw = round_up(window - 1 + bq, bq)
    m_fr = kw // bq
    ci0 = min(m_fr - 1, num_q)

    os, lses = [], []
    for ci in range(ci0):  # head blocks: window reaches position 0
        kwi = (ci + 1) * bq
        kernel = functools.partial(
            _causal_strip_kernel, scale=scale, row0=ci * bq, col0=0,
            block_q=bq, sk=sk, precision=precision, window=window,
            softcap=softcap,
        )
        o_i, lse_i = _strip_call(
            kernel,
            (B, QH),
            [
                pl.BlockSpec((1, 1, bq, E), lambda b, h, ci=ci: (b, h, ci, 0)),
                pl.BlockSpec((1, 1, kwi, E), lambda b, h: (b, h // group, 0, 0)),
                pl.BlockSpec((1, 1, kwi, E), lambda b, h: (b, h // group, 0, 0)),
            ],
            [
                pl.BlockSpec((1, 1, bq, E), lambda b, h: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h: (b, h, 0, 0)),
            ],
            [
                jax.ShapeDtypeStruct((B, QH, bq, E), q.dtype),
                jax.ShapeDtypeStruct((B, QH, bq, 1), jnp.float32),
            ],
            [q, k, v],
            2,
        )
        os.append(o_i)
        lses.append(lse_i)

    if ci0 < num_q:
        n_i = num_q - ci0
        # stacked windows: wnd[i] = kv[(ci0+i+1)*bq - kw : (ci0+i+1)*bq),
        # all in-bounds because ci0+i >= m_fr - 1
        kf = k.reshape(B, KH, num_q, bq, E)
        vf = v.reshape(B, KH, num_q, bq, E)
        kwnd = jnp.concatenate(
            [kf[:, :, j : j + n_i] for j in range(m_fr)], axis=3
        ).reshape(B, KH * n_i, kw, E)
        vwnd = jnp.concatenate(
            [vf[:, :, j : j + n_i] for j in range(m_fr)], axis=3
        ).reshape(B, KH * n_i, kw, E)
        kernel = functools.partial(
            _causal_strip_kernel, scale=scale, row0=kw - bq, col0=0,
            block_q=bq, sk=sk, precision=precision, window=window,
            softcap=softcap,
        )
        o_t, lse_t = _strip_call(
            kernel,
            (B, QH, n_i),
            [
                pl.BlockSpec(
                    (1, 1, bq, E), lambda b, h, i: (b, h, i + ci0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, kw, E),
                    lambda b, h, i: (b, (h // group) * n_i + i, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, kw, E),
                    lambda b, h, i: (b, (h // group) * n_i + i, 0, 0),
                ),
            ],
            [
                pl.BlockSpec((1, 1, bq, E), lambda b, h, i: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, i: (b, h, i, 0)),
            ],
            [
                jax.ShapeDtypeStruct((B, QH, n_i * bq, E), q.dtype),
                jax.ShapeDtypeStruct((B, QH, n_i * bq, 1), jnp.float32),
            ],
            [q, kwnd, vwnd],
            3,
        )
        os.append(o_t)
        lses.append(lse_t)
    return jnp.concatenate(os, axis=2), jnp.concatenate(lses, axis=2)


def _pick_chunk(q_len, bq, head_dim, itemsize):
    """Largest chunk width whose widest diagonal strip fits the strip KV
    budget, divides q_len, and is a multiple of bq."""
    c = _CAUSAL_STRIP_MAX_CALLS * bq
    while c >= 2 * bq:
        if (
            q_len % c == 0
            and 4 * c * head_dim * itemsize <= _CAUSAL_STRIP_KV_BYTES
        ):
            return c
        c //= 2
    return None


def _rect_split(c, chunk, head_dim, itemsize):
    """Number of equal sub-windows an off-diagonal prefix rectangle of
    c chunks streams as: the smallest divisor of c whose (K+V, double-
    buffered) sub-window block fits _CHUNKED_RECT_KV_BYTES. Worst case
    (prime c) degenerates to width = one chunk, which is the same
    geometry as the L=2*chunk rectangle — measured fast (BENCH attn8b
    rows). Always terminates: d = c gives width chunk, which fits
    whenever _pick_chunk returned this chunk size."""
    for d in range(1, c + 1):
        if c % d == 0 and 4 * (c // d) * chunk * head_dim * itemsize \
                <= _CHUNKED_RECT_KV_BYTES:
            return d
    return c


def _chunked_rect_calls(n_c, chunk, head_dim, itemsize):
    """Total off-diagonal pallas calls the chunked decomposition makes."""
    return sum(_rect_split(c, chunk, head_dim, itemsize)
               for c in range(1, n_c))


def _fwd_causal_chunked(q, k, v, scale, precision, bq, chunk, softcap=None):
    """Long-context causal forward: chunk-diagonal strips + mask-free
    off-diagonal rectangles, merged with the (o, lse) monoid.

    causal(L) decomposes into causal(chunk) on each diagonal chunk (the
    existing static strips, batched across chunks via a grid axis) plus,
    for chunk i >= 1, a mask-free rectangle q_chunk_i x kv[0 : i*chunk)
    (the static rect kernel with a full-prefix KV block). This lifts the
    strip path's L <= _CAUSAL_STRIP_MAX_CALLS*bq cap (VERDICT r2 item 4)
    while keeping every kernel fully static; call count is
    chunk/bq + n_chunks - 1 regardless of L."""
    B, QH, QL, E = q.shape
    _, KH, _, _ = k.shape
    group = QH // KH
    sk = min(_CAUSAL_STRIP_SK, bq)
    n_c = QL // chunk
    npc = chunk // bq
    k5 = k.reshape(B, KH, n_c, chunk, E)
    v5 = v.reshape(B, KH, n_c, chunk, E)

    # 1) diagonal: strips per in-chunk q block, batched over chunks
    d_os, d_lses = [], []
    for ci in range(npc):
        kw = (ci + 1) * bq
        kernel = functools.partial(
            _causal_strip_kernel, scale=scale, row0=ci * bq, col0=0,
            block_q=bq, sk=sk, precision=precision, softcap=softcap,
        )
        o_i, lse_i = _strip_call(
            kernel,
            (B, QH, n_c),
            [
                pl.BlockSpec(
                    (1, 1, bq, E),
                    lambda b, h, c, ci=ci: (b, h, c * npc + ci, 0),
                ),
                pl.BlockSpec(
                    (1, 1, 1, kw, E), lambda b, h, c: (b, h // group, c, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 1, 1, kw, E), lambda b, h, c: (b, h // group, c, 0, 0)
                ),
            ],
            [
                pl.BlockSpec((1, 1, 1, bq, E), lambda b, h, c: (b, h, c, 0, 0)),
                pl.BlockSpec((1, 1, 1, bq, 1), lambda b, h, c: (b, h, c, 0, 0)),
            ],
            [
                jax.ShapeDtypeStruct((B, QH, n_c, bq, E), q.dtype),
                jax.ShapeDtypeStruct((B, QH, n_c, bq, 1), jnp.float32),
            ],
            [q, k5, v5],
            3,
        )
        d_os.append(o_i)
        d_lses.append(lse_i)
    o_d = jnp.concatenate(d_os, axis=3).reshape(B, QH, QL, E)
    lse_d = jnp.concatenate(d_lses, axis=3).reshape(B, QH, QL, 1)

    # 2) off-diagonal: chunk c attends kv[0 : c*chunk) mask-free.
    # Oversized prefixes STREAM as n_sub equal-width sub-rectangles
    # merged with the (o, lse) monoid (VERDICT r4 item 3 — this lifts
    # the old `4*(QL-chunk)*E*itemsize <= _CHUNKED_RECT_KV_BYTES`
    # dispatch gate: the cap now bounds one sub-rectangle's VMEM block,
    # never the total prefix). Equal split (n_sub divides c) keeps every
    # sub-window's offset an exact multiple of its width, so the kv
    # BlockSpec index stays a plain block index; widths repeat across c,
    # so distinct compiled programs stay <= max_chunks_per_rect.
    kernel = functools.partial(
        _rect_static_kernel, scale=scale, sk=sk, precision=precision,
        softcap=softcap,
    )
    itemsize = jnp.dtype(q.dtype).itemsize

    def rect(c, widx, wc):
        """q-chunk c vs kv window [widx*wc*chunk, (widx+1)*wc*chunk)."""
        cw = wc * chunk
        return _strip_call(
            kernel,
            (B, QH, npc),
            [
                pl.BlockSpec(
                    (1, 1, bq, E),
                    lambda b, h, iq, c=c: (b, h, c * npc + iq, 0),
                ),
                pl.BlockSpec(
                    (1, 1, cw, E),
                    lambda b, h, iq, widx=widx: (b, h // group, widx, 0),
                ),
                pl.BlockSpec(
                    (1, 1, cw, E),
                    lambda b, h, iq, widx=widx: (b, h // group, widx, 0),
                ),
            ],
            [
                pl.BlockSpec((1, 1, bq, E), lambda b, h, iq: (b, h, iq, 0)),
                pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq: (b, h, iq, 0)),
            ],
            [
                jax.ShapeDtypeStruct((B, QH, chunk, E), q.dtype),
                jax.ShapeDtypeStruct((B, QH, chunk, 1), jnp.float32),
            ],
            [q, k, v],
            3,
        )

    r_os, r_lses = [], []
    for c in range(1, n_c):
        n_sub = _rect_split(c, chunk, E, itemsize)
        wc = c // n_sub  # sub-window width in chunks
        o_r, lse_r = rect(c, 0, wc)
        for i in range(1, n_sub):
            o_i, lse_i = rect(c, i, wc)
            o_r, lse_r = lse_merge(o_r, lse_r, o_i, lse_i)
        r_os.append(o_r)
        r_lses.append(lse_r)
    o_off = jnp.concatenate(r_os, axis=2)
    lse_off = jnp.concatenate(r_lses, axis=2)

    # 3) merge the off-diagonal partials into chunks 1..n_c-1
    o_m, lse_m = lse_merge(
        o_d[:, :, chunk:], lse_d[:, :, chunk:], o_off, lse_off
    )
    o = jnp.concatenate([o_d[:, :, :chunk], o_m], axis=2)
    lse = jnp.concatenate([lse_d[:, :, :chunk], lse_m], axis=2)
    return o, lse


def default_blocks(
    q_len: int, kv_len: int, head_dim: int, dtype, causal: bool = False
) -> tuple[int, int]:
    """VMEM-budget block-size selection — TPU analogue of the reference's
    shared-memory groupsize autotuner (attention.jl:193-205). Grid-step
    overhead (~1us fixed per step) dominates at small blocks, so prefer
    the largest KV block that fits VMEM; causal prefers bk <= 2*bq so most
    triangular steps stay off-diagonal (mask-free)."""
    sub = sublane_tile(dtype)
    # Measured on v5e (L=2048, E=64, bf16): per-grid-step fixed overhead is
    # ~1us, so large KV blocks win; causal prefers bk=1024 with bq=256 so
    # the clamped-index tile skip drops above-diagonal work while most
    # visited blocks stay off-diagonal (mask-free path). A table-driven
    # triangular grid was tried and is 2.5x SLOWER: dynamic index maps
    # defeat the pipeliner's block-reuse analysis.
    if causal:
        # two-level tiling: big DMA-major block, small inner sub-tiles so
        # only true-diagonal sub-tiles pay masking (see _attn_step)
        bq = min(512, round_up(q_len, sub))
        bk = min(2048, round_up(kv_len, 128))
    else:
        bq = min(512, round_up(q_len, sub))
        bk = min(2048, round_up(kv_len, 128))

    def footprint(bq, bk):
        # one live (bq, bk) fp32 score/p temp + double-buffered operand
        # blocks + acc/out (measured: (512, 2048) at E=64 bf16 fits fine)
        return bq * bk * 6 + (bq + 2 * bk) * head_dim * 4 * 2 + 2 * bq * head_dim * 4

    while footprint(bq, bk) > 12 * 1024 * 1024 and (bq > sub or bk > 128):
        if bk >= 2 * bq and bk > 128:
            bk = max(128, bk // 2)
        elif bq > sub:
            bq = max(sub, bq // 2)
        else:
            bk = max(128, bk // 2)
    return bq, bk


def _fwd_impl(q, k, v, pair, kpad, causal, scale, block_q=None, block_k=None, precision=None, causal_offset=None, segment_ids=None, window=None, softcap=None):
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    bq, bk = default_blocks(QL, KL, E, q.dtype, causal=causal)
    if block_q is not None:
        bq = block_q
    if block_k is not None:
        bk = block_k
    num_q, num_kv = cdiv(QL, bq), cdiv(KL, bk)
    has_pair = pair is not None
    has_kpad = kpad is not None
    has_seg = segment_ids is not None

    out_shape = [
        jax.ShapeDtypeStruct((B, QH, QL, E), q.dtype),
        jax.ShapeDtypeStruct((B, QH, QL, 1), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((bq, E), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
        pltpu.VMEM((bq, 128), jnp.float32),
    ]

    has_offset = causal_offset is not None
    itemsize = jnp.dtype(q.dtype).itemsize
    # Static-strip eligibility (round 3): kpad / segments / softcap ride
    # the strip kernels as extra per-sub-tile mask passes (VERDICT r2
    # item 3 — the packed-document / Gemma-2 training paths); `window`
    # gets its own all-static stacked-KV path; pair bias and dynamic
    # chunked-prefill offsets stay on the general rect pipeline.
    strips_ok = (
        causal
        and not has_pair
        and not has_offset
        and QL == KL
        and QL % bq == 0
        and QL // bq > 1
    )
    if strips_ok and window is not None and not (has_kpad or has_seg):
        kw = round_up(window - 1 + bq, bq)
        # transient HBM bound (ADVICE r3): the stacked-window path builds
        # ~kw/bq concatenated copies of K and V; cap that buffer so long
        # sequences with large windows fall back to the general
        # clamped-index pipeline instead of OOMing HBM
        stacked_bytes = 2 * B * KH * (QL // bq) * kw * E * itemsize
        if (
            4 * kw * E * itemsize <= _CAUSAL_STRIP_KV_BYTES
            and kw // bq <= _CAUSAL_STRIP_MAX_CALLS
            and stacked_bytes <= _WINDOW_STACK_HBM_BYTES
        ):
            return _fwd_causal_window(
                q, k, v, scale, precision, bq, int(window), softcap
            )
    if strips_ok and window is None:
        if (
            QL // bq <= _CAUSAL_STRIP_MAX_CALLS
            and 4 * QL * E * itemsize <= _CAUSAL_STRIP_KV_BYTES
        ):
            return _fwd_causal_multicall(
                q, k, v, scale, precision, bq,
                kpad=kpad, segment_ids=segment_ids, softcap=softcap,
            )
        if not (has_kpad or has_seg):
            chunk = _pick_chunk(QL, bq, E, itemsize)
            # no prefix-width gate anymore: oversized prefix rectangles
            # stream as equal sub-windows merged via lse_merge (r5), so
            # the path serves ANY L the chunk divides. The call-count
            # bound keeps the unrolled XLA graph sane at extreme L.
            if chunk is not None and _chunked_rect_calls(
                    QL // chunk, chunk, E, itemsize) <= 256:
                return _fwd_causal_chunked(
                    q, k, v, scale, precision, bq, chunk, softcap
                )
    featureless = not (
        has_pair or has_kpad or has_seg or has_offset
        or window is not None or softcap is not None
    )
    if (
        not causal
        and featureless
        and QL % bq == 0
        and KL % min(_CAUSAL_STRIP_SK, KL) == 0
        and KL * E * itemsize <= 2 * 1024 * 1024
    ):
        return _fwd_rect_static(q, k, v, scale, precision, bq)

    if causal and not has_offset:
        if window is not None:
            # clamp both sides: above-diagonal blocks reuse the diagonal
            # block's DMA, window-dead left blocks reuse the first live one
            def kv_idx(iq, ik):
                lo = jnp.maximum(0, (iq * bq - (window - 1)) // bk)
                return jnp.clip(ik, lo, (iq * bq + bq - 1) // bk)
        else:
            def kv_idx(iq, ik):
                return jnp.minimum(ik, (iq * bq + bq - 1) // bk)
    else:
        def kv_idx(iq, ik):
            return ik

    in_specs = [
        pl.BlockSpec((1, 1, bq, E), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec(
            (1, 1, bk, E),
            lambda b, h, iq, ik: (b, h // group, kv_idx(iq, ik), 0),
        ),
        pl.BlockSpec(
            (1, 1, bk, E),
            lambda b, h, iq, ik: (b, h // group, kv_idx(iq, ik), 0),
        ),
    ]
    operands = [q, k, v]
    if has_offset:
        in_specs.insert(
            0,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        )
        operands.insert(
            0, jnp.asarray(causal_offset, jnp.int32).reshape(1)
        )
    if has_pair:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bq, bk), lambda b, h, iq, ik: (b, h, iq, kv_idx(iq, ik))
            )
        )
        operands.append(pair)
    if has_kpad:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, h, iq, ik: (b, 0, kv_idx(iq, ik)))
        )
        operands.append(kpad.astype(jnp.int32)[:, None, :])
    if has_seg:
        q_seg, kv_seg = segment_ids
        # q segments sublane-oriented (bq, 1); kv segments lane-oriented
        # (1, bk) — the (bq, bk) compare broadcasts with no relayout
        in_specs.append(
            pl.BlockSpec((1, bq, 1), lambda b, h, iq, ik: (b, iq, 0))
        )
        operands.append(q_seg.astype(jnp.int32)[:, :, None])
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, h, iq, ik: (b, 0, kv_idx(iq, ik)))
        )
        operands.append(kv_seg.astype(jnp.int32)[:, None, :])

    kernel = functools.partial(
        _fwd_kernel_rect,
        scale=scale,
        causal=causal,
        has_pair=has_pair,
        has_kpad=has_kpad,
        has_seg=has_seg,
        has_offset=has_offset,
        block_q=bq,
        block_k=bk,
        kv_len=KL,
        precision=precision,
        window=window,
        softcap=softcap,
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=(B, QH, num_q, num_kv),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, bq, E), lambda b, h, iq, ik: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq, ik: (b, h, iq, 0)),
        ],
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(*operands)
    return o, lse


def _validate(q, k, v, pair, kpad_mask):
    """Shape-contract errors mirroring attention.jl:141-144."""
    if q.shape[-1] != k.shape[-1]:
        raise ValueError(f"q head dim {q.shape[-1]} != k head dim {k.shape[-1]}")
    if k.shape != v.shape:
        raise ValueError(f"k shape {k.shape} != v shape {v.shape}")
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(
            f"q heads {q.shape[1]} not a multiple of kv heads {k.shape[1]}"
        )
    if q.shape[0] != k.shape[0]:
        raise ValueError(f"batch mismatch {q.shape[0]} vs {k.shape[0]}")
    if pair is not None:
        expect = (q.shape[0], q.shape[1], q.shape[2], k.shape[2])
        if pair.shape != expect:
            raise ValueError(f"pair shape {pair.shape}, expected {expect}")
    if kpad_mask is not None:
        expect = (k.shape[0], k.shape[2])
        if kpad_mask.shape != expect:
            raise ValueError(f"kpad_mask shape {kpad_mask.shape}, expected {expect}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def _flash_attention(q, k, v, pair, kpad_mask, segment_ids, causal, scale, precision, window, softcap):
    o, _ = _fwd_impl(
        q, k, v, pair, kpad_mask, causal, scale, precision=precision,
        segment_ids=segment_ids, window=window, softcap=softcap,
    )
    return o


def _vjp_fwd(q, k, v, pair, kpad_mask, segment_ids, causal, scale, precision, window, softcap):
    o, lse = _fwd_impl(
        q, k, v, pair, kpad_mask, causal, scale, precision=precision,
        segment_ids=segment_ids, window=window, softcap=softcap,
    )
    return o, (q, k, v, pair, kpad_mask, segment_ids, o, lse)


def _vjp_bwd(causal, scale, precision, window, softcap, res, do):
    from nnop_tpu.ops.flash_attention_bwd import flash_attention_bwd

    q, k, v, pair, kpad_mask, segment_ids, o, lse = res
    dq, dk, dv, dpair = flash_attention_bwd(
        q, k, v, pair, kpad_mask, o, lse, do, causal=causal, scale=scale,
        precision=precision, segment_ids=segment_ids, window=window,
        softcap=softcap,
    )
    return dq, dk, dv, dpair, None, None


_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


def flash_attention_chunked(
    q,
    k,
    v,
    *,
    causal_offset,
    kpad_mask=None,
    scale: float | None = None,
    precision=None,
    window: int | None = None,
    softcap: float | None = None,
):
    """Causal attention for CHUNKED PREFILL: query rows are a chunk whose
    global positions start at `causal_offset` (the live cache length — may
    be a traced scalar); keys span the whole cache. Inference-only (no
    custom VJP). Row i attends cols <= causal_offset + i, intersected with
    kpad_mask (and the sliding `window` / `softcap`, if set)."""
    _validate(q, k, v, None, kpad_mask)
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    o, _ = _fwd_impl(
        q, k, v, None, kpad_mask, True, float(scale),
        precision=precision, causal_offset=causal_offset, window=window,
        softcap=None if softcap is None else float(softcap),
    )
    return o


def flash_attention(
    q,
    k,
    v,
    pair=None,
    *,
    causal: bool = False,
    kpad_mask=None,
    segment_ids=None,
    scale: float | None = None,
    precision=None,
    window: int | None = None,
    softcap: float | None = None,
):
    """Fused multi-head attention with online softmax.

    Equivalent of /root/reference/src/attention_crc.jl:4 `flash_attention`
    (the within_gradient trick is unnecessary: `jax.custom_vjp` separates
    the fwd-with-residuals path structurally, SURVEY.md §2.4).

    Args:
      q: (B, QH, QL, E); k, v: (B, KH, KL, E) with QH % KH == 0 (GQA/MQA).
      pair: optional additive attention bias (B, QH, QL, KL).
      causal: mask by absolute position (q_pos >= k_pos).
      kpad_mask: optional (B, KL) bool, True = valid key (varlen).
      segment_ids: optional ((B, QL), (B, KL)) int pair for multi-document
        packing — only same-segment positions attend.
      scale: score scale, default 1/sqrt(E) (reference fixes this,
        attention.jl:154).
      precision: lax.Precision for the MXU dots (None = default; pass
        "highest" for full-f32 accuracy on TPU at ~3x matmul cost).
      window: optional sliding-window size (requires causal) — each query
        attends only its last `window` keys, q_pos - k_pos < window
        (Mistral convention; north-star extension, no reference
        counterpart). Window-dead KV blocks are skipped via clamped index
        maps + predicates, so long-context cost is O(L * window).
      softcap: optional attention logit softcapping (Gemma-2 convention):
        s -> softcap * tanh(s / softcap) applied to the scaled scores
        before masking. Differentiable (the tanh factor is re-applied in
        the backward recompute). Incompatible with `pair` (the bias would
        have to ride inside the cap to stay meaningful; Gemma-2 has no
        pair bias).
    """
    _validate(q, k, v, pair, kpad_mask)
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        window = int(window)
        if window >= k.shape[2]:
            window = None  # never binds: plain causal (faster dispatch)
    if softcap is not None:
        if pair is not None:
            raise ValueError("softcap is incompatible with pair bias")
        if softcap <= 0:
            raise ValueError(f"softcap must be > 0, got {softcap}")
        softcap = float(softcap)
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    E = q.shape[-1]
    if E & (E - 1):  # non-pow2 head dim: zero-pad lanes (SURVEY.md §7
        # "keep the pow2-E constraint, relax later via padding" — the
        # reference ERRORS here, attention.jl:143). Zero lanes add 0 to
        # every dot product and slice off the output; grads flow through
        # pad/slice outside the custom_vjp. `scale` above uses true E.
        Ep = 1 << (E - 1).bit_length()
        padw = [(0, 0)] * 3 + [(0, Ep - E)]
        q, k, v = (jnp.pad(x, padw) for x in (q, k, v))
        out = _flash_attention(
            q, k, v, pair, kpad_mask, segment_ids, causal, float(scale),
            precision, window, softcap,
        )
        return out[..., :E]
    return _flash_attention(
        q, k, v, pair, kpad_mask, segment_ids, causal, float(scale), precision,
        window, softcap,
    )
