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
        mask = cm if mask is None else jnp.logical_and(mask, cm)

    if mask is not None:
        s = jnp.where(mask, s, MASK_VALUE)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        ds = jnp.where(mask, p * (dp - delta), 0.0)
    else:
        p = jnp.exp(s - lse)
        ds = p * (dp - delta)
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


def flash_attention_bwd(
    q, k, v, pair, kpad_mask, o, lse, do, *, causal: bool, scale: float,
    precision=None, segment_ids=None,
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

    kpad_i32 = kpad_mask.astype(jnp.int32)[:, None, :] if has_kpad else None
    skip = causal and not has_pair

    # ---------------- dQ (+ dpair) kernel: grid (B, QH, num_q, num_kv) ---
    if skip:
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
        q_seg_arr = segment_ids[0].astype(jnp.int32)[:, :, None]
        kv_seg_arr = segment_ids[1].astype(jnp.int32)[:, None, :]
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
        dkv_operands.append(q_seg_arr if has_seg else None)
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
        ),
        interpret=interpret_default(),
    )(*dkv_operands)

    return dq, dk, dv, dpair
