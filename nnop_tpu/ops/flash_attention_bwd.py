"""Flash attention backward (Pallas TPU).

Re-derivation of /root/reference/src/attention_bwd.jl, re-architected for
TPU (SURVEY.md §7 "Design translation"):

* The reference runs ONE workgroup per (head, batch) with a serial
  kv-tile × q-tile double loop (attention_bwd.jl:263, noted in SURVEY §3.2
  as its perf bottleneck) and needs `KA.@atomic` for GQA dK/dV
  (attention_bwd.jl:99-104,137-143). This build uses the standard
  two-kernel split: a dK/dV kernel gridded over KV blocks (accumulating
  over q-blocks AND the q-heads-per-kv-head axis in VMEM scratch — no
  atomics, TPU grids are sequential per core) and a dQ kernel gridded over
  Q blocks.
* The reference's separate preprocess kernel (Δ/ls prescale + δ = Σ Δ̂·o,
  attention_bwd.jl:163-197) collapses to δ = Σ do·o computed in plain XLA
  (it fuses into a single elementwise+reduce pass); the Δ/ls prescale is
  unnecessary because the forward saves LSE, so P = exp(s − lse) is already
  normalized.
* dpair = P·(dP − δ) (reference writes dS/scale, attention_bwd.jl:123-132)
  is emitted by the dQ kernel, where each (q-block, kv-block) pair is
  visited exactly once.
* Causal tile-skip via clamped index maps + predicates, as in the forward.
  When `pair` is present the skip is disabled so every dpair block gets
  written (masked blocks produce exact zeros through p = 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.ops.flash_attention import MASK_VALUE, default_blocks
from nnop_tpu.utils.platform import cdiv, interpret_default


def _recompute_p_ds(
    q,
    k,
    v,
    do,
    lse,
    delta,
    pair_blk,
    kpad_blk,
    qseg_blk,
    kseg_blk,
    *,
    scale,
    causal,
    q_len,
    kv_len,
    row0,
    col0,
    precision=None,
    window=None,
    softcap=None,
):
    """Shared score/P/dS recompute for both backward kernels.

    BRANCH-FREE (see flash_attention._attn_step): masking is applied
    unconditionally whenever any masking feature is active — measured
    faster than lax.cond fast-paths, which stall the Mosaic pipeline.
    Masked entries come out as exact zeros in p and ds so scratch
    accumulation stays clean and NaN padding never propagates (ds is
    zeroed via where, not by multiplying p=0 into possibly-NaN values).
    The dS scale factor is NOT applied here — callers apply it once to
    the accumulated dq/dk at the final grid step.
    """
    bq, bk = q.shape[0], k.shape[0]
    q_s = (q.astype(jnp.float32) * scale).astype(q.dtype)
    s = jax.lax.dot_general(
        q_s,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    cap_t = None
    if softcap is not None:
        # forward applied s -> c * tanh(s/c) BEFORE the pair bias; the
        # tanh value is kept to chain d(s_capped)/ds = 1 - tanh^2 into ds
        cap_t = jnp.tanh(s / softcap)
        s = softcap * cap_t
    if pair_blk is not None:
        s = s + pair_blk.astype(jnp.float32)

    dp = jax.lax.dot_general(
        do,
        v,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

    ragged_q = q_len % bq != 0
    ragged_kv = kv_len % bk != 0

    mask = None
    if ragged_q or ragged_kv:
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        mask = jnp.logical_and(rows < q_len, cols < kv_len)
    if kpad_blk is not None:
        kp = kpad_blk != 0
        mask = kp if mask is None else jnp.logical_and(mask, kp)
    if qseg_blk is not None:
        sm = qseg_blk == kseg_blk
        mask = sm if mask is None else jnp.logical_and(mask, sm)
    if causal:
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        cm = rows >= cols
        if window is not None:
            cm = jnp.logical_and(cm, rows - cols < window)
        mask = cm if mask is None else jnp.logical_and(mask, cm)

    if mask is not None:
        s = jnp.where(mask, s, MASK_VALUE)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        ds = jnp.where(mask, p * (dp - delta), 0.0)
    else:
        p = jnp.exp(s - lse)
        ds = p * (dp - delta)
    if cap_t is not None:
        ds = ds * (1.0 - cap_t * cap_t)
    return p, ds


def _zero_invalid_rows(x, row0, n_valid):
    """Zero block rows at/after `n_valid` (undefined padding in ragged tail
    blocks must not reach a matmul: 0 * NaN = NaN)."""
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1), 0)
    return jnp.where(rows < n_valid, x, jnp.zeros_like(x))


def _dq_kernel(
    *refs,
    scale,
    causal,
    has_pair,
    has_kpad,
    has_seg,
    block_q,
    block_k,
    q_len,
    kv_len,
    precision=None,
    window=None,
    softcap=None,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    pair_ref = kpad_ref = qseg_ref = kseg_ref = None
    if has_pair:
        pair_ref = refs[idx]; idx += 1
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    outs = refs[idx:]
    if has_pair:
        dq_ref, dpair_ref, dq_acc = outs
    else:
        dq_ref, dq_acc = outs

    iq = pl.program_id(2)
    ik = pl.program_id(3)
    num_kv = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    active = True
    if causal and not has_pair:
        active = ik * block_k <= iq * block_q + block_q - 1
        if window is not None:
            active = jnp.logical_and(
                active,
                ik * block_k + block_k - 1 >= iq * block_q - (window - 1),
            )

    @pl.when(active)
    def _step():
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        p, ds = _recompute_p_ds(
            q_ref[0, 0],
            k_ref[0, 0],
            v_ref[0, 0],
            do_ref[0, 0],
            lse,
            delta,
            pair_ref[0, 0] if has_pair else None,
            kpad_ref[0] if has_kpad else None,
            qseg_ref[0] if has_seg else None,
            kseg_ref[0] if has_seg else None,
            scale=scale,
            causal=causal,
            q_len=q_len,
            kv_len=kv_len,
            row0=iq * block_q,
            col0=ik * block_k,
            precision=precision,
            window=window,
            softcap=softcap,
        )
        if has_pair:
            # dpair = dS before the scale factor (attention_bwd.jl:123-132)
            dpair_ref[0, 0] = ds.astype(dpair_ref.dtype)
        k_blk = k_ref[0, 0]
        if kv_len % block_k != 0:
            k_blk = _zero_invalid_rows(k_blk, ik * block_k, kv_len)
        dq_acc[...] += jax.lax.dot_general(
            ds.astype(k_ref.dtype),
            k_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        del p

    @pl.when(ik == num_kv - 1)
    def _finish():
        # dS scale applied once here: O(bq*E) instead of O(bq*bk) per step
        dq_ref[0, 0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    *refs,
    scale,
    causal,
    has_pair,
    has_kpad,
    has_seg,
    block_q,
    block_k,
    q_len,
    kv_len,
    group,
    precision=None,
    window=None,
    softcap=None,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    pair_ref = kpad_ref = qseg_ref = kseg_ref = None
    if has_pair:
        pair_ref = refs[idx]; idx += 1
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    dk_ref, dv_ref, dk_acc, dv_acc = refs[idx:]

    ikv = pl.program_id(2)
    g = pl.program_id(3)
    iq = pl.program_id(4)
    num_g = pl.num_programs(3)
    num_q = pl.num_programs(4)

    @pl.when(jnp.logical_and(g == 0, iq == 0))
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    active = True
    if causal and not has_pair:
        active = iq * block_q + block_q - 1 >= ikv * block_k
        if window is not None:
            # q rows starting past the last col's window -> dead
            active = jnp.logical_and(
                active,
                iq * block_q - (ikv * block_k + block_k - 1) < window,
            )

    @pl.when(active)
    def _step():
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        if q_len % block_q != 0:
            q = _zero_invalid_rows(q, iq * block_q, q_len)
            do = _zero_invalid_rows(do, iq * block_q, q_len)
        p, ds = _recompute_p_ds(
            q,
            k_ref[0, 0],
            v_ref[0, 0],
            do,
            lse,
            delta,
            pair_ref[0, 0] if has_pair else None,
            kpad_ref[0] if has_kpad else None,
            qseg_ref[0] if has_seg else None,
            kseg_ref[0] if has_seg else None,
            scale=scale,
            causal=causal,
            q_len=q_len,
            kv_len=kv_len,
            row0=iq * block_q,
            col0=ikv * block_k,
            precision=precision,
            window=window,
            softcap=softcap,
        )
        dv_acc[...] += jax.lax.dot_general(
            p.astype(do.dtype),
            do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        dk_acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype),
            q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

    @pl.when(jnp.logical_and(g == num_g - 1, iq == num_q - 1))
    def _finish():
        # dS scale applied once here (see _recompute_p_ds)
        dk_ref[0, 0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _dq_subtile(q, k, v, do, lse, delta, mask, precision, softcap):
    """One sub-tile's dq contribution: recompute s -> p, dp = do·vᵀ,
    ds = p(dp - δ) (softcap chain factor + mask on ds), return ds·k.
    Shared by the per-block and grouped dQ strip kernels — the bodies
    must stay bit-identical (test_bwd_causal_grouped_parity)."""
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    cap_t = None
    if softcap is not None:
        cap_t = jnp.tanh(s / softcap)
        s = softcap * cap_t
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )
    ds = p * (dp - delta)
    if cap_t is not None:
        ds = ds * (1.0 - cap_t * cap_t)
    if mask is not None:
        ds = jnp.where(mask, ds, 0.0)
    return jax.lax.dot_general(
        ds.astype(k.dtype), k,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _dq_strip_kernel(
    *refs, scale, row0, block_q, sk, precision, causal=True,
    has_kpad=False, has_seg=False, softcap=None,
):
    """dQ for one q-block strip, FULLY STATIC (see _causal_strip_kernel).

    K width = row0 + block_q (the causal prefix); sub-tiles below the
    diagonal run with no masking passes, diagonal sub-tiles get a
    compile-time triangular mask on dS only (p's unmasked extra columns
    are annihilated by the dS mask before touching dq). Round 3: optional
    kpad / segment masks (applied to dS — p only feeds dS here) and the
    Gemma-2 softcap chain factor, mirroring the forward strips."""
    from nnop_tpu.ops.flash_attention import _ref2d, _strip_subtile_mask

    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    kpad_ref = qseg_ref = kseg_ref = None
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    dq_ref = refs[idx]

    q = (_ref2d(q_ref).astype(jnp.float32) * scale).astype(q_ref.dtype)
    do = _ref2d(do_ref)
    lse = _ref2d(lse_ref)
    delta = _ref2d(delta_ref)
    k_all = _ref2d(k_ref)
    v_all = _ref2d(v_ref)
    qseg = _ref2d(qseg_ref) if has_seg else None  # (bq, 1)
    kpad = _ref2d(kpad_ref) if has_kpad else None  # (n_sub, sk)
    kseg = _ref2d(kseg_ref) if has_seg else None  # (n_sub, sk)
    kw = k_all.shape[0]
    dq_acc = None
    for j in range(kw // sk):
        k = k_all[j * sk : (j + 1) * sk, :]
        v = v_all[j * sk : (j + 1) * sk, :]
        mask = _strip_subtile_mask(
            j, sk, block_q, row0, 0, causal, None,
            kpad[j : j + 1, :] if has_kpad else None,
            qseg,
            kseg[j : j + 1, :] if has_seg else None,
        )
        contrib = _dq_subtile(
            q, k, v, do, lse, delta, mask, precision, softcap
        )
        dq_acc = contrib if dq_acc is None else dq_acc + contrib
    dq_ref[...] = (dq_acc * scale).astype(dq_ref.dtype).reshape(dq_ref.shape)


def _dq_gstrip_kernel(
    *refs, scale, row0, g, block_q, sk, precision,
    has_kpad=False, has_seg=False, softcap=None,
):
    """dQ for g ADJACENT q-block strips in one call (the backward
    analogue of flash_attention._causal_gstrip_kernel): g independent
    dq accumulation chains share a single K/V stream of width
    row0 + g·block_q. Chain c stops at its own causal width, so the MXU
    work stays exact while the per-call ramp and the shared KV-prefix
    DMA are amortized g ways."""
    from nnop_tpu.ops.flash_attention import _ref2d, _strip_subtile_mask

    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    kpad_ref = qseg_ref = kseg_ref = None
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    dq_ref = refs[idx]

    q_all = (_ref2d(q_ref).astype(jnp.float32) * scale).astype(q_ref.dtype)
    do_all = _ref2d(do_ref)
    lse_all = _ref2d(lse_ref)
    delta_all = _ref2d(delta_ref)
    k_all = _ref2d(k_ref)
    v_all = _ref2d(v_ref)
    qseg_all = _ref2d(qseg_ref) if has_seg else None  # (g*bq, 1)
    kpad = _ref2d(kpad_ref) if has_kpad else None  # (n_sub, sk)
    kseg = _ref2d(kseg_ref) if has_seg else None  # (n_sub, sk)

    def blk(x, c):
        return x[c * block_q : (c + 1) * block_q, :]

    n = [(row0 + (c + 1) * block_q) // sk for c in range(g)]
    accs = [None] * g
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
                kpad_j,
                blk(qseg_all, c) if has_seg else None,
                kseg_j,
            )
            contrib = _dq_subtile(
                blk(q_all, c), k, v, blk(do_all, c), blk(lse_all, c),
                blk(delta_all, c), mask, precision, softcap,
            )
            accs[c] = contrib if accs[c] is None else accs[c] + contrib
    dq = jnp.concatenate([a * scale for a in accs], axis=0)
    dq_ref[...] = dq.astype(dq_ref.dtype).reshape(dq_ref.shape)


def _dkv_strip_kernel(
    *refs, scale, col0, block_k, sk, q_len, group, precision, causal=True,
    has_kpad=False, has_seg=False, softcap=None,
):
    """dK/dV for one KV-block strip, FULLY STATIC.

    The KV block at cols [col0, col0+block_k) receives gradients from q
    rows [col0, q_len) only (causal); the strip loops statically over
    those q sub-tiles AND the GQA group axis, accumulating dk/dv in
    values — no scratch, no atomics, no grid-level accumulation phases.
    Round 3: optional kpad / segment masks (applied to p AND dS — p feeds
    dv directly here) and the softcap chain factor."""
    from nnop_tpu.ops.flash_attention import _strip_subtile_mask

    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    kpad_ref = qseg_ref = kseg_ref = None
    if has_kpad:
        kpad_ref = refs[idx]; idx += 1
    if has_seg:
        qseg_ref = refs[idx]; idx += 1
        kseg_ref = refs[idx]; idx += 1
    dk_ref, dv_ref = refs[idx : idx + 2]

    from nnop_tpu.ops.flash_attention import _ref2d

    def _grp(ref, g):
        # (1, group, [1,] len, E) block -> (len, E) for group head g
        x = ref[0, g]
        return x.reshape(x.shape[-2], x.shape[-1])

    k = _ref2d(k_ref)
    v = _ref2d(v_ref)
    kpad_row = kpad_ref[0] if has_kpad else None  # (1, block_k)
    kseg_row = kseg_ref[0] if has_seg else None  # (1, block_k)
    qseg_all = qseg_ref[0] if has_seg else None  # (q_len, 1)
    dk_acc = None
    dv_acc = None
    j0 = col0 // sk if causal else 0
    for g in range(group):
        q_g = _grp(q_ref, g)
        do_g = _grp(do_ref, g)
        lse_g = _grp(lse_ref, g)
        delta_g = _grp(delta_ref, g)
        for j in range(j0, q_len // sk):
            q = q_g[j * sk : (j + 1) * sk, :]
            do = do_g[j * sk : (j + 1) * sk, :]
            lse = lse_g[j * sk : (j + 1) * sk, :]
            delta = delta_g[j * sk : (j + 1) * sk, :]
            q_s = (q.astype(jnp.float32) * scale).astype(q.dtype)
            s = jax.lax.dot_general(
                q_s, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            cap_t = None
            if softcap is not None:
                cap_t = jnp.tanh(s / softcap)
                s = softcap * cap_t
            p = jnp.exp(s - lse)
            # transposed-geometry reuse of the fwd mask helper: sub-tile
            # has sk q rows starting at j*sk vs block_k cols at col0
            mask = _strip_subtile_mask(
                0, block_k, sk, j * sk, col0, causal, None,
                kpad_row, qseg_all[j * sk : (j + 1) * sk] if has_seg else None,
                kseg_row,
            )
            if mask is not None:
                p = jnp.where(mask, p, 0.0)
            dp = jax.lax.dot_general(
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            ds = p * (dp - delta)
            if cap_t is not None:
                ds = ds * (1.0 - cap_t * cap_t)
            dv_c = jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dk_c = jax.lax.dot_general(
                ds.astype(q.dtype), q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dv_acc = dv_c if dv_acc is None else dv_acc + dv_c
            dk_acc = dk_c if dk_acc is None else dk_acc + dk_c
    dk_ref[...] = (dk_acc * scale).astype(dk_ref.dtype).reshape(dk_ref.shape)
    dv_ref[...] = dv_acc.astype(dv_ref.dtype).reshape(dv_ref.shape)


# Measured grouping defaults (scripts/probe_gstrip_bwd.py, L=4096 8B
# geometry, bwd-only marginal): (1,1) 3.458 ms -> (2,1) 2.669 / (1,2)
# 2.682 / (2,2) 2.647 ms (-23%). gq amortizes the dQ calls' shared
# KV-prefix stream; gk halves the dKdV calls' full q/do/lse/delta
# re-reads. Divisibility guard below falls back to 1.
_BWD_GQ = 2
_BWD_GK = 2


def _bwd_causal_multicall(
    q, k, v, lse, delta, do, scale, precision, bq,
    kpad_mask=None, segment_ids=None, softcap=None, gq=1, gk=1,
):
    """Causal backward as static strip calls (fwd analogue in
    flash_attention._fwd_causal_multicall).

    gq > 1 groups gq adjacent q-blocks per dQ call (g independent exact
    chains, _dq_gstrip_kernel). gk > 1 widens each dKdV call's KV block
    to gk·bq: the dKdV calls re-read the FULL q/do/lse/delta tensors per
    call, so call count is the dominant DMA term — gk cuts it gk×, at
    the cost of a small staircase of extra masked sub-tiles near the
    diagonal. Both default to 1; the dispatcher picks measured values."""
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    num_q = QL // bq
    sk = min(512, bq)
    if num_q % gq:
        gq = 1
    if num_q % gk:
        gk = 1
    has_kpad = kpad_mask is not None
    has_seg = segment_ids is not None
    # dq masks: kv-side rows laid out (n_sub, sk) for sublane sub-tile
    # selection; dkv masks: kv block is lane-oriented (1, bq), q segments
    # sublane-oriented (QL, 1) — see _strip_subtile_mask
    kpad_sub = (
        kpad_mask.astype(jnp.int32).reshape(B, KL // sk, sk)
        if has_kpad else None
    )
    kpad_lane = kpad_mask.astype(jnp.int32)[:, None, :] if has_kpad else None
    if has_seg:
        qseg_arr = segment_ids[0].astype(jnp.int32)[:, :, None]
        kseg_sub = segment_ids[1].astype(jnp.int32).reshape(B, KL // sk, sk)
        kseg_lane = segment_ids[1].astype(jnp.int32)[:, None, :]

    dqs = []
    qb = gq * bq  # rows per dQ call
    for gi in range(num_q // gq):
        row0 = gi * qb
        kw = row0 + qb
        if gq == 1:
            kernel = functools.partial(
                _dq_strip_kernel, scale=scale, row0=row0, block_q=bq,
                sk=sk, precision=precision, has_kpad=has_kpad,
                has_seg=has_seg, softcap=softcap,
            )
        else:
            kernel = functools.partial(
                _dq_gstrip_kernel, scale=scale, row0=row0, g=gq,
                block_q=bq, sk=sk, precision=precision, has_kpad=has_kpad,
                has_seg=has_seg, softcap=softcap,
            )
        in_specs = [
            pl.BlockSpec((1, 1, qb, E), lambda b, h, gi=gi: (b, h, gi, 0)),
            pl.BlockSpec((1, 1, kw, E), lambda b, h: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, kw, E), lambda b, h: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, qb, E), lambda b, h, gi=gi: (b, h, gi, 0)),
            pl.BlockSpec((1, 1, qb, 1), lambda b, h, gi=gi: (b, h, gi, 0)),
            pl.BlockSpec((1, 1, qb, 1), lambda b, h, gi=gi: (b, h, gi, 0)),
        ]
        operands = [q, k, v, do, lse, delta]
        if has_kpad:
            in_specs.append(
                pl.BlockSpec((1, KL // sk, sk), lambda b, h: (b, 0, 0))
            )
            operands.append(kpad_sub)
        if has_seg:
            in_specs.append(
                pl.BlockSpec((1, qb, 1), lambda b, h, gi=gi: (b, gi, 0))
            )
            operands.append(qseg_arr)
            in_specs.append(
                pl.BlockSpec((1, KL // sk, sk), lambda b, h: (b, 0, 0))
            )
            operands.append(kseg_sub)
        dq_i = pl.pallas_call(
            kernel,
            grid=(B, QH),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, qb, E), lambda b, h: (b, h, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, QH, qb, E), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret_default(),
        )(*operands)
        dqs.append(dq_i)
    dq = jnp.concatenate(dqs, axis=2)

    dks, dvs = [], []
    kb = gk * bq  # KV rows per dKdV call
    for cj in range(num_q // gk):
        kernel = functools.partial(
            _dkv_strip_kernel, scale=scale, col0=cj * kb, block_k=kb,
            sk=sk, q_len=QL, group=group, precision=precision,
            has_kpad=has_kpad, has_seg=has_seg, softcap=softcap,
        )
        in_specs = [
            pl.BlockSpec((1, group, QL, E), lambda b, kh: (b, kh, 0, 0)),
            pl.BlockSpec((1, 1, kb, E), lambda b, kh, cj=cj: (b, kh, cj, 0)),
            pl.BlockSpec((1, 1, kb, E), lambda b, kh, cj=cj: (b, kh, cj, 0)),
            pl.BlockSpec((1, group, QL, E), lambda b, kh: (b, kh, 0, 0)),
            pl.BlockSpec((1, group, QL, 1), lambda b, kh: (b, kh, 0, 0)),
            pl.BlockSpec((1, group, QL, 1), lambda b, kh: (b, kh, 0, 0)),
        ]
        operands = [q, k, v, do, lse, delta]
        if has_kpad:
            in_specs.append(
                pl.BlockSpec((1, 1, kb), lambda b, kh, cj=cj: (b, 0, cj))
            )
            operands.append(kpad_lane)
        if has_seg:
            in_specs.append(
                pl.BlockSpec((1, QL, 1), lambda b, kh: (b, 0, 0))
            )
            operands.append(qseg_arr)
            in_specs.append(
                pl.BlockSpec((1, 1, kb), lambda b, kh, cj=cj: (b, 0, cj))
            )
            operands.append(kseg_lane)
        dk_j, dv_j = pl.pallas_call(
            kernel,
            grid=(B, KH),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, kb, E), lambda b, kh: (b, kh, 0, 0)),
                pl.BlockSpec((1, 1, kb, E), lambda b, kh: (b, kh, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, KH, kb, E), k.dtype),
                jax.ShapeDtypeStruct((B, KH, kb, E), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret_default(),
        )(*operands)
        dks.append(dk_j)
        dvs.append(dv_j)
    dk = jnp.concatenate(dks, axis=2)
    dv = jnp.concatenate(dvs, axis=2)
    return dq, dk, dv


def _bwd_rect_static(q, k, v, lse, delta, do, scale, precision, bq):
    """Non-causal featureless backward: static full-width kernels, grid-
    indexed q / kv blocks (one call each for dQ and dK/dV)."""
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    num_q = QL // bq
    sk = min(512, bq)

    dq = pl.pallas_call(
        functools.partial(
            _dq_strip_kernel, scale=scale, row0=0, block_q=bq,
            sk=min(512, KL), precision=precision, causal=False,
        ),
        grid=(B, QH, num_q),
        in_specs=[
            pl.BlockSpec((1, 1, bq, E), lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, KL, E), lambda b, h, iq: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, KL, E), lambda b, h, iq: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, bq, E), lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq: (b, h, iq, 0)),
            pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq: (b, h, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, E), lambda b, h, iq: (b, h, iq, 0)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(q, k, v, do, lse, delta)

    num_kv = KL // bq
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_strip_kernel, scale=scale, col0=0, block_k=bq, sk=sk,
            q_len=QL, group=group, precision=precision, causal=False,
        ),
        grid=(B, KH, num_kv),
        in_specs=[
            pl.BlockSpec((1, group, QL, E), lambda b, kh, ikv: (b, kh, 0, 0)),
            pl.BlockSpec((1, 1, bq, E), lambda b, kh, ikv: (b, kh, ikv, 0)),
            pl.BlockSpec((1, 1, bq, E), lambda b, kh, ikv: (b, kh, ikv, 0)),
            pl.BlockSpec((1, group, QL, E), lambda b, kh, ikv: (b, kh, 0, 0)),
            pl.BlockSpec((1, group, QL, 1), lambda b, kh, ikv: (b, kh, 0, 0)),
            pl.BlockSpec((1, group, QL, 1), lambda b, kh, ikv: (b, kh, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, E), lambda b, kh, ikv: (b, kh, ikv, 0)),
            pl.BlockSpec((1, 1, bq, E), lambda b, kh, ikv: (b, kh, ikv, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _bwd_causal_chunked(
    q, k, v, lse, delta, do, scale, precision, bq, chunk, softcap=None,
    gq=1, gk=1,
):
    """Long-context causal backward, all-static (fwd analogue:
    flash_attention._fwd_causal_chunked).

    dQ: per-chunk diagonal strips (batched over chunks via a grid axis on
    5-D reshaped operands) + mask-free full-prefix rectangle calls per
    chunk i >= 1, summed — oversized prefixes STREAM as equal-width
    sub-windows (flash_attention._rect_split geometry; dq partials over
    disjoint KV ranges simply ADD, no lse merge needed since the bwd
    reuses the final lse/delta). dK/dV: the (q-chunk j+d, kv-chunk j)
    pairs are batched PER DIAGONAL OFFSET d — d=0 is the causal in-chunk
    strip set, each d >= 1 is ONE mask-free call with grid (B, KH,
    n_c - d, kv-strips) whose per-offset outputs sum into dk/dv. Call
    count is O(chunk/bq + n_c + splits) regardless of L.

    gq/gk (r5, VERDICT r4 item 3): the measured multicall grouping
    applied to the DIAGONAL stages — gq adjacent q-blocks share one dQ
    call's KV stream (_dq_gstrip_kernel), gk widens each dKdV call's KV
    block, cutting the per-call full q/do/lse/delta re-reads gk x. The
    rectangle stages keep a constant kv-block index across their inner
    grid axis, so the pipeliner already reuses that DMA — grouping them
    buys nothing."""
    B, QH, QL, E = q.shape
    _, KH, _, _ = k.shape
    group = QH // KH
    sk = min(512, bq)
    n_c = QL // chunk
    npc = chunk // bq
    if npc % gq:
        gq = 1
    if npc % gk:
        gk = 1
    q5 = q.reshape(B, QH, n_c, chunk, E)
    do5 = do.reshape(B, QH, n_c, chunk, E)
    lse5 = lse.reshape(B, QH, n_c, chunk, 1)
    delta5 = delta.reshape(B, QH, n_c, chunk, 1)
    k5 = k.reshape(B, KH, n_c, chunk, E)
    v5 = v.reshape(B, KH, n_c, chunk, E)
    cp = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "parallel"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    # ---- dQ: diagonal strips (gq-grouped), batched over chunks -------
    dqs = []
    qb = gq * bq
    for gi in range(npc // gq):
        row0 = gi * qb
        kw = row0 + qb
        if gq == 1:
            kernel = functools.partial(
                _dq_strip_kernel, scale=scale, row0=row0, block_q=bq,
                sk=sk, precision=precision, softcap=softcap,
            )
        else:
            kernel = functools.partial(
                _dq_gstrip_kernel, scale=scale, row0=row0, g=gq,
                block_q=bq, sk=sk, precision=precision, softcap=softcap,
            )
        dq_i = pl.pallas_call(
            kernel,
            grid=(B, QH, n_c),
            in_specs=[
                pl.BlockSpec((1, 1, 1, qb, E),
                             lambda b, h, c, gi=gi: (b, h, c, gi, 0)),
                pl.BlockSpec((1, 1, 1, kw, E),
                             lambda b, h, c: (b, h // group, c, 0, 0)),
                pl.BlockSpec((1, 1, 1, kw, E),
                             lambda b, h, c: (b, h // group, c, 0, 0)),
                pl.BlockSpec((1, 1, 1, qb, E),
                             lambda b, h, c, gi=gi: (b, h, c, gi, 0)),
                pl.BlockSpec((1, 1, 1, qb, 1),
                             lambda b, h, c, gi=gi: (b, h, c, gi, 0)),
                pl.BlockSpec((1, 1, 1, qb, 1),
                             lambda b, h, c, gi=gi: (b, h, c, gi, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, qb, E),
                                   lambda b, h, c: (b, h, c, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, QH, n_c, qb, E), q.dtype),
            compiler_params=cp,
            interpret=interpret_default(),
        )(q5, k5, v5, do5, lse5, delta5)
        dqs.append(dq_i)
    dq = jnp.concatenate(dqs, axis=3).reshape(B, QH, QL, E)

    # ---- dQ: mask-free prefix rectangles per chunk i >= 1, streamed as
    # equal-width sub-windows when the prefix outgrows the per-call VMEM
    # cap; dq partials over disjoint KV ranges sum exactly -------------
    from nnop_tpu.ops.flash_attention import _rect_split

    itemsize = jnp.dtype(q.dtype).itemsize
    kernel = functools.partial(
        _dq_strip_kernel, scale=scale, row0=0, block_q=bq, sk=sk,
        precision=precision, causal=False, softcap=softcap,
    )

    def dq_rect(c, widx, wc):
        cw = wc * chunk
        return pl.pallas_call(
            kernel,
            grid=(B, QH, npc),
            in_specs=[
                pl.BlockSpec((1, 1, bq, E),
                             lambda b, h, iq, c=c: (b, h, c * npc + iq, 0)),
                pl.BlockSpec((1, 1, cw, E),
                             lambda b, h, iq, widx=widx:
                             (b, h // group, widx, 0)),
                pl.BlockSpec((1, 1, cw, E),
                             lambda b, h, iq, widx=widx:
                             (b, h // group, widx, 0)),
                pl.BlockSpec((1, 1, bq, E),
                             lambda b, h, iq, c=c: (b, h, c * npc + iq, 0)),
                pl.BlockSpec((1, 1, bq, 1),
                             lambda b, h, iq, c=c: (b, h, c * npc + iq, 0)),
                pl.BlockSpec((1, 1, bq, 1),
                             lambda b, h, iq, c=c: (b, h, c * npc + iq, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, E),
                                   lambda b, h, iq: (b, h, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((B, QH, chunk, E), q.dtype),
            compiler_params=cp,
            interpret=interpret_default(),
        )(q, k, v, do, lse, delta)

    off = []
    for c in range(1, n_c):
        n_sub = _rect_split(c, chunk, E, itemsize)
        wc = c // n_sub
        dq_o = dq_rect(c, 0, wc)
        if n_sub > 1:  # accumulate split partials in fp32, cast once
            acc = dq_o.astype(jnp.float32)
            for i in range(1, n_sub):
                acc = acc + dq_rect(c, i, wc).astype(jnp.float32)
            dq_o = acc.astype(q.dtype)
        off.append(dq_o)
    if off:
        dq = dq.at[:, :, chunk:].add(jnp.concatenate(off, axis=2))

    # ---- dK/dV: diagonal (d=0) strips (gk-grouped), batched over
    # chunks — wider KV blocks cut the per-call full q/do/lse/delta
    # re-reads gk x (the multicall gk win, VERDICT r4 item 3) ----------
    dks, dvs = [], []
    kb = gk * bq
    for cj in range(npc // gk):
        kernel = functools.partial(
            _dkv_strip_kernel, scale=scale, col0=cj * kb, block_k=kb,
            sk=sk, q_len=chunk, group=group, precision=precision,
            softcap=softcap,
        )
        dk_j, dv_j = pl.pallas_call(
            kernel,
            grid=(B, KH, n_c),
            in_specs=[
                pl.BlockSpec((1, group, 1, chunk, E),
                             lambda b, kh, c: (b, kh, c, 0, 0)),
                pl.BlockSpec((1, 1, 1, kb, E),
                             lambda b, kh, c, cj=cj: (b, kh, c, cj, 0)),
                pl.BlockSpec((1, 1, 1, kb, E),
                             lambda b, kh, c, cj=cj: (b, kh, c, cj, 0)),
                pl.BlockSpec((1, group, 1, chunk, E),
                             lambda b, kh, c: (b, kh, c, 0, 0)),
                pl.BlockSpec((1, group, 1, chunk, 1),
                             lambda b, kh, c: (b, kh, c, 0, 0)),
                pl.BlockSpec((1, group, 1, chunk, 1),
                             lambda b, kh, c: (b, kh, c, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 1, kb, E),
                             lambda b, kh, c: (b, kh, c, 0, 0)),
                pl.BlockSpec((1, 1, 1, kb, E),
                             lambda b, kh, c: (b, kh, c, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, KH, n_c, kb, E), k.dtype),
                jax.ShapeDtypeStruct((B, KH, n_c, kb, E), v.dtype),
            ],
            compiler_params=cp,
            interpret=interpret_default(),
        )(q5, k5, v5, do5, lse5, delta5)
        dks.append(dk_j)
        dvs.append(dv_j)
    dk = jnp.concatenate(dks, axis=3).reshape(B, KH, QL, E)
    dv = jnp.concatenate(dvs, axis=3).reshape(B, KH, QL, E)

    # ---- dK/dV: off-diagonal pairs, one call per offset d >= 1 -------
    for d in range(1, n_c):
        nj = n_c - d
        kernel = functools.partial(
            _dkv_strip_kernel, scale=scale, col0=0, block_k=bq, sk=sk,
            q_len=chunk, group=group, precision=precision, causal=False,
            softcap=softcap,
        )
        dk_d, dv_d = pl.pallas_call(
            kernel,
            grid=(B, KH, nj, npc),
            in_specs=[
                pl.BlockSpec((1, group, 1, chunk, E),
                             lambda b, kh, j, ck, d=d: (b, kh, j + d, 0, 0)),
                pl.BlockSpec((1, 1, 1, bq, E),
                             lambda b, kh, j, ck: (b, kh, j, ck, 0)),
                pl.BlockSpec((1, 1, 1, bq, E),
                             lambda b, kh, j, ck: (b, kh, j, ck, 0)),
                pl.BlockSpec((1, group, 1, chunk, E),
                             lambda b, kh, j, ck, d=d: (b, kh, j + d, 0, 0)),
                pl.BlockSpec((1, group, 1, chunk, 1),
                             lambda b, kh, j, ck, d=d: (b, kh, j + d, 0, 0)),
                pl.BlockSpec((1, group, 1, chunk, 1),
                             lambda b, kh, j, ck, d=d: (b, kh, j + d, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 1, bq, E),
                             lambda b, kh, j, ck: (b, kh, j, ck, 0)),
                pl.BlockSpec((1, 1, 1, bq, E),
                             lambda b, kh, j, ck: (b, kh, j, ck, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, KH, nj, chunk, E), k.dtype),
                jax.ShapeDtypeStruct((B, KH, nj, chunk, E), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "parallel"
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret_default(),
        )(q5, k5, v5, do5, lse5, delta5)
        dk = dk.at[:, :, : nj * chunk].add(
            dk_d.reshape(B, KH, nj * chunk, E).astype(dk.dtype)
        )
        dv = dv.at[:, :, : nj * chunk].add(
            dv_d.reshape(B, KH, nj * chunk, E).astype(dv.dtype)
        )
    return dq, dk, dv



def flash_attention_bwd(
    q, k, v, pair, kpad_mask, o, lse, do, *, causal: bool, scale: float,
    precision=None, segment_ids=None, window=None, softcap=None,
):
    """Equivalent of /root/reference/src/attention_bwd.jl:199 ∇flash_attention."""
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    group = QH // KH
    bq, bk = default_blocks(QL, KL, E, q.dtype, causal=causal)
    num_q, num_kv = cdiv(QL, bq), cdiv(KL, bk)
    has_pair = pair is not None
    has_kpad = kpad_mask is not None
    has_seg = segment_ids is not None

    # δ = Σ_e do·o — the reference's preprocess kernel
    # (attention_bwd.jl:163-197); here a single fused XLA pass.
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )  # (B, QH, QL, 1)

    if (
        causal
        and not has_pair
        and window is None
        and QL == KL
        and QL % bq == 0
        # 16-call cap + widest-strip K/V VMEM bound mirror the forward
        # (flash_attention._CAUSAL_STRIP_MAX_CALLS; measured at L=8192)
        and 1 < QL // bq <= 16
        and 4 * QL * E * jnp.dtype(q.dtype).itemsize <= 9 * 1024 * 1024
        # dkv strips load the whole GQA group's q/do per grid step; 8 MB
        # admits the 8B geometry (group=4, L=8192, E=128 bf16) — measured
        # round 3 vs the rect fallback
        and group * QL * E * jnp.dtype(q.dtype).itemsize <= 8 * 1024 * 1024
    ):
        dq, dk, dv = _bwd_causal_multicall(
            q, k, v, lse, delta, do, scale, precision, bq,
            kpad_mask=kpad_mask, segment_ids=segment_ids, softcap=softcap,
            gq=_BWD_GQ, gk=_BWD_GK,
        )
        return dq, dk, dv, None

    if (
        causal
        and not (has_pair or has_kpad or has_seg)
        and window is None
        and QL == KL
        and QL % bq == 0
        and QL // bq > 16
    ):
        from nnop_tpu.ops.flash_attention import (
            _chunked_rect_calls, _pick_chunk)

        chunk = _pick_chunk(QL, bq, E, jnp.dtype(q.dtype).itemsize)
        if (
            chunk is not None
            # per-offset q/do chunk blocks load the whole GQA group
            and group * chunk * E * jnp.dtype(q.dtype).itemsize
            <= 8 * 1024 * 1024
            # no prefix-width gate anymore (r5): oversized dQ prefix
            # rectangles stream as equal sub-windows and sum; bound the
            # unrolled call count like the forward
            and _chunked_rect_calls(
                QL // chunk, chunk, E, jnp.dtype(q.dtype).itemsize) <= 256
        ):
            dq, dk, dv = _bwd_causal_chunked(
                q, k, v, lse, delta, do, scale, precision, bq, chunk,
                softcap=softcap, gq=_BWD_GQ, gk=_BWD_GK,
            )
            return dq, dk, dv, None

    if (
        not causal
        and not (has_pair or has_kpad or has_seg)
        and softcap is None
        and QL % bq == 0
        and KL % bq == 0
        and KL % min(512, KL) == 0
        and QL % min(512, bq) == 0
        and KL * E * jnp.dtype(k.dtype).itemsize <= 2 * 1024 * 1024
        and group * QL * E * jnp.dtype(q.dtype).itemsize <= 4 * 1024 * 1024
    ):
        dq, dk, dv = _bwd_rect_static(
            q, k, v, lse, delta, do, scale, precision, bq
        )
        return dq, dk, dv, None

    kpad_i32 = kpad_mask.astype(jnp.int32)[:, None, :] if has_kpad else None
    if has_seg:
        q_seg_arr = segment_ids[0].astype(jnp.int32)[:, :, None]
        kv_seg_arr = segment_ids[1].astype(jnp.int32)[:, None, :]
    skip = causal and not has_pair

    # ---------------- dQ (+ dpair) kernel: grid (B, QH, num_q, num_kv) ---
    if skip:
        if window is not None:
            def kv_idx(iq, ik):
                lo = jnp.maximum(0, (iq * bq - (window - 1)) // bk)
                return jnp.clip(ik, lo, (iq * bq + bq - 1) // bk)
        else:
            def kv_idx(iq, ik):
                return jnp.minimum(ik, (iq * bq + bq - 1) // bk)
    else:
        def kv_idx(iq, ik):
            return ik

    dq_in_specs = [
        pl.BlockSpec((1, 1, bq, E), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec(
            (1, 1, bk, E), lambda b, h, iq, ik: (b, h // group, kv_idx(iq, ik), 0)
        ),
        pl.BlockSpec(
            (1, 1, bk, E), lambda b, h, iq, ik: (b, h // group, kv_idx(iq, ik), 0)
        ),
        pl.BlockSpec((1, 1, bq, E), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq, ik: (b, h, iq, 0)),
        pl.BlockSpec((1, 1, bq, 1), lambda b, h, iq, ik: (b, h, iq, 0)),
    ]
    dq_operands = [q, k, v, do, lse, delta]
    if has_pair:
        dq_in_specs.append(
            pl.BlockSpec(
                (1, 1, bq, bk), lambda b, h, iq, ik: (b, h, iq, kv_idx(iq, ik))
            )
        )
        dq_operands.append(pair)
    if has_kpad:
        dq_in_specs.append(
            pl.BlockSpec(
                (1, 1, bk), lambda b, h, iq, ik: (b, 0, kv_idx(iq, ik))
            )
        )
        dq_operands.append(kpad_i32)
    if has_seg:
        dq_in_specs.append(
            pl.BlockSpec((1, bq, 1), lambda b, h, iq, ik: (b, iq, 0))
        )
        dq_operands.append(q_seg_arr)
        dq_in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, h, iq, ik: (b, 0, kv_idx(iq, ik)))
        )
        dq_operands.append(kv_seg_arr)

    dq_out_specs = [
        pl.BlockSpec((1, 1, bq, E), lambda b, h, iq, ik: (b, h, iq, 0))
    ]
    dq_out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if has_pair:
        dq_out_specs.append(
            pl.BlockSpec(
                (1, 1, bq, bk), lambda b, h, iq, ik: (b, h, iq, kv_idx(iq, ik))
            )
        )
        dq_out_shape.append(jax.ShapeDtypeStruct(pair.shape, pair.dtype))

    dq_kernel = functools.partial(
        _dq_kernel,
        scale=scale,
        causal=causal,
        has_pair=has_pair,
        has_kpad=has_kpad,
        has_seg=has_seg,
        block_q=bq,
        block_k=bk,
        q_len=QL,
        kv_len=KL,
        precision=precision,
        window=window,
        softcap=softcap,
    )
    dq_res = pl.pallas_call(
        dq_kernel,
        grid=(B, QH, num_q, num_kv),
        in_specs=dq_in_specs,
        out_specs=dq_out_specs,
        out_shape=dq_out_shape,
        scratch_shapes=[pltpu.VMEM((bq, E), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(*dq_operands)
    if has_pair:
        dq, dpair = dq_res
    else:
        (dq,) = dq_res
        dpair = None

    # ------------- dK/dV kernel: grid (B, KH, num_kv, group, num_q) ------
    if skip:
        if window is not None:
            def q_idx(ikv, iq):
                hi = jnp.minimum(
                    num_q - 1,
                    (ikv * bk + bk - 1 + window - 1) // bq,
                )
                return jnp.clip(iq, (ikv * bk) // bq, hi)
        else:
            def q_idx(ikv, iq):
                return jnp.maximum(iq, (ikv * bk) // bq)
    else:
        def q_idx(ikv, iq):
            return iq

    def qh(kh, g):
        return kh * group + g

    dkv_in_specs = [
        pl.BlockSpec(
            (1, 1, bq, E),
            lambda b, kh, ikv, g, iq: (b, qh(kh, g), q_idx(ikv, iq), 0),
        ),
        pl.BlockSpec((1, 1, bk, E), lambda b, kh, ikv, g, iq: (b, kh, ikv, 0)),
        pl.BlockSpec((1, 1, bk, E), lambda b, kh, ikv, g, iq: (b, kh, ikv, 0)),
        pl.BlockSpec(
            (1, 1, bq, E),
            lambda b, kh, ikv, g, iq: (b, qh(kh, g), q_idx(ikv, iq), 0),
        ),
        pl.BlockSpec(
            (1, 1, bq, 1),
            lambda b, kh, ikv, g, iq: (b, qh(kh, g), q_idx(ikv, iq), 0),
        ),
        pl.BlockSpec(
            (1, 1, bq, 1),
            lambda b, kh, ikv, g, iq: (b, qh(kh, g), q_idx(ikv, iq), 0),
        ),
    ]
    dkv_operands = [q, k, v, do, lse, delta]
    if has_pair:
        dkv_in_specs.append(
            pl.BlockSpec(
                (1, 1, bq, bk),
                lambda b, kh, ikv, g, iq: (b, qh(kh, g), q_idx(ikv, iq), ikv),
            )
        )
        dkv_operands.append(pair)
    if has_kpad:
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, kh, ikv, g, iq: (b, 0, ikv))
        )
        dkv_operands.append(kpad_i32)
    if has_seg:
        dkv_in_specs.append(
            pl.BlockSpec(
                (1, bq, 1),
                lambda b, kh, ikv, g, iq: (b, q_idx(ikv, iq), 0),
            )
        )
        dkv_operands.append(q_seg_arr)
        dkv_in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, kh, ikv, g, iq: (b, 0, ikv))
        )
        dkv_operands.append(kv_seg_arr)

    dkv_kernel = functools.partial(
        _dkv_kernel,
        scale=scale,
        causal=causal,
        has_pair=has_pair,
        has_kpad=has_kpad,
        has_seg=has_seg,
        block_q=bq,
        block_k=bk,
        q_len=QL,
        kv_len=KL,
        group=group,
        precision=precision,
        window=window,
        softcap=softcap,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, KH, num_kv, group, num_q),
        in_specs=dkv_in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, 1, bk, E), lambda b, kh, ikv, g, iq: (b, kh, ikv, 0)
            ),
            pl.BlockSpec(
                (1, 1, bk, E), lambda b, kh, ikv, g, iq: (b, kh, ikv, 0)
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, E), jnp.float32),
            pltpu.VMEM((bk, E), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel",
                "parallel",
                "parallel",
                "arbitrary",
                "arbitrary",
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(*dkv_operands)

    return dq, dk, dv, dpair
