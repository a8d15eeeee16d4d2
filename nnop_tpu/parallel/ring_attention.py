"""Ring flash attention over a named mesh axis (context parallelism).

North-star requirement (SURVEY.md §2.5 / §5: "ring/all-gather attention
collectives over ICI with compute overlap"). The reference's online-softmax
merge monoid (`md_reduce`, /root/reference/src/softmax.jl:6-16) is exactly
the associative combiner a ring pass needs — generalized here from
(max, denom) pairs to (o, lse) pairs:

    merge((o1, lse1), (o2, lse2)):
        m = max(lse1, lse2); w_i = exp(lse_i - m)
        o = (o1*w1 + o2*w2) / (w1 + w2);  lse = m + log(w1 + w2)

Each device holds Q/K/V shards split along the sequence axis (contiguous
chunks). At step t it attends its local Q against the KV chunk that
originated on device (idx - t) mod n, then rotates KV one hop with
`ppermute` (XLA's latency-hiding scheduler overlaps the collective with
the next step's flash kernel). Causality across chunks is chunk-granular:
origin > my index → skip; origin == mine → causal flash; origin < mine →
full flash. (Zigzag load-balancing is a planned optimization.)

Backward: standard ring-attention bwd — dK/dV partial accumulators travel
around the ring WITH their K/V chunks, landing back on the owning device
after n hops; dQ accumulates locally. Reuses the single-chip Pallas bwd
kernels per chunk with the globally-merged LSE (p = exp(s − lse_global) is
exactly the global softmax restricted to the chunk).

Must be called inside shard_map over the named axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nnop_tpu.ops.flash_attention import _fwd_impl
from nnop_tpu.ops.flash_attention_bwd import flash_attention_bwd

NEG = -1e30


def _merge(o1, lse1, o2, lse2):
    m = jnp.maximum(lse1, lse2)
    w1 = jnp.exp(lse1 - m)
    w2 = jnp.exp(lse2 - m)
    return (o1 * w1 + o2 * w2) / (w1 + w2), m + jnp.log(w1 + w2)


def ring_flash_attention(q, k, v, axis_name: str, causal: bool = True,
                         scale: float | None = None, kpad_mask=None,
                         segment_ids=None):
    """q/k/v: LOCAL shards (B, H, L/n, E), sequence-sharded over axis_name.

    kpad_mask: optional LOCAL (B, L/n) bool over this shard's keys
    (rotates around the ring with its K/V chunk). segment_ids: optional
    (q_seg, kv_seg) pair of LOCAL (B, L/n) int arrays — kv_seg rotates,
    q_seg stays; packed-docs masking composes with the ring.
    """
    q_seg = segment_ids[0] if segment_ids is not None else None
    kv_seg = segment_ids[1] if segment_ids is not None else None
    return _ring_fa(q, k, v, kpad_mask, q_seg, kv_seg, axis_name, causal,
                    scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _ring_fa(q, k, v, kpad_mask, q_seg, kv_seg, axis_name, causal, scale):
    seg = (q_seg, kv_seg) if kv_seg is not None else None
    o, _ = _ring_fwd_impl(q, k, v, axis_name, causal, scale, kpad_mask, seg)
    return o


def _ring_fwd_impl(q, k, v, axis_name, causal, scale, kpad=None, seg=None):
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = jax.lax.psum(1, axis_name)  # static: axis size
    idx = jax.lax.axis_index(axis_name)
    B, H, L, E = q.shape
    perm = [(i, (i + 1) % n) for i in range(n)]
    q_seg = seg[0] if seg is not None else None
    kv_seg = seg[1] if seg is not None else None

    o = jnp.zeros((B, H, L, E), jnp.float32)
    lse = jnp.full((B, H, L, 1), NEG, jnp.float32)
    k_cur, v_cur = k, v
    kpad_cur, kvseg_cur = kpad, kv_seg

    for t in range(n):
        origin = (idx - t) % n

        def attend(causal_flag):
            def f(args):
                q, k_cur, v_cur, kpad_cur, kvseg_cur, o, lse = args
                seg_arg = (
                    (q_seg, kvseg_cur) if kvseg_cur is not None else None
                )
                o_t, lse_t = _fwd_impl(
                    q, k_cur, v_cur, None, kpad_cur, causal_flag, scale,
                    segment_ids=seg_arg,
                )
                return _merge(o, lse, o_t.astype(jnp.float32), lse_t)

            return f

        def skip(args):
            *_, o, lse = args
            return o, lse

        args = (q, k_cur, v_cur, kpad_cur, kvseg_cur, o, lse)
        if causal:
            branch = jnp.where(origin == idx, 1, jnp.where(origin < idx, 0, 2))
            o, lse = jax.lax.switch(
                branch, [attend(False), attend(True), skip], args
            )
        else:
            o, lse = attend(False)(args)

        if t != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if kpad_cur is not None:
                kpad_cur = jax.lax.ppermute(kpad_cur, axis_name, perm)
            if kvseg_cur is not None:
                kvseg_cur = jax.lax.ppermute(kvseg_cur, axis_name, perm)

    return o.astype(q.dtype), lse


def _ring_vjp_fwd(q, k, v, kpad_mask, q_seg, kv_seg, axis_name, causal,
                  scale):
    seg = (q_seg, kv_seg) if kv_seg is not None else None
    o, lse = _ring_fwd_impl(
        q, k, v, axis_name, causal, scale, kpad_mask, seg
    )
    return o, (q, k, v, kpad_mask, q_seg, kv_seg, o, lse)


def _ring_vjp_bwd(axis_name, causal, scale, res, do):
    q, k, v, kpad_mask, q_seg, kv_seg, o, lse = res
    segment_ids = (q_seg, kv_seg) if kv_seg is not None else None
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    q_seg = segment_ids[0] if segment_ids is not None else None
    kv_seg = segment_ids[1] if segment_ids is not None else None

    dq = jnp.zeros(q.shape, jnp.float32)
    k_cur, v_cur = k, v
    dk_cur = jnp.zeros(k.shape, jnp.float32)
    dv_cur = jnp.zeros(v.shape, jnp.float32)
    kpad_cur, kvseg_cur = kpad_mask, kv_seg

    for t in range(n):
        origin = (idx - t) % n

        def run(causal_flag):
            def f(args):
                q, k_cur, v_cur, kpad_cur, kvseg_cur, dq, dk_cur, dv_cur = args
                seg_arg = (
                    (q_seg, kvseg_cur) if kvseg_cur is not None else None
                )
                dq_t, dk_t, dv_t, _ = flash_attention_bwd(
                    q, k_cur, v_cur, None, kpad_cur, o, lse, do,
                    causal=causal_flag, scale=scale, segment_ids=seg_arg,
                )
                return (
                    dq + dq_t.astype(jnp.float32),
                    dk_cur + dk_t.astype(jnp.float32),
                    dv_cur + dv_t.astype(jnp.float32),
                )

            return f

        def skip(args):
            return args[5], args[6], args[7]

        args = (q, k_cur, v_cur, kpad_cur, kvseg_cur, dq, dk_cur, dv_cur)
        if causal:
            branch = jnp.where(origin == idx, 1, jnp.where(origin < idx, 0, 2))
            dq, dk_cur, dv_cur = jax.lax.switch(
                branch, [run(False), run(True), skip], args
            )
        else:
            dq, dk_cur, dv_cur = run(False)(args)

        if t != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            dk_cur = jax.lax.ppermute(dk_cur, axis_name, perm)
            dv_cur = jax.lax.ppermute(dv_cur, axis_name, perm)
            if kpad_cur is not None:
                kpad_cur = jax.lax.ppermute(kpad_cur, axis_name, perm)
            if kvseg_cur is not None:
                kvseg_cur = jax.lax.ppermute(kvseg_cur, axis_name, perm)

    # n-1 in-loop rotations: one more hop brings each accumulator home
    dk_home = jax.lax.ppermute(dk_cur, axis_name, perm)
    dv_home = jax.lax.ppermute(dv_cur, axis_name, perm)
    return (
        dq.astype(q.dtype),
        dk_home.astype(k.dtype),
        dv_home.astype(v.dtype),
        None,
        None,
        None,
    )


_ring_fa.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)


# ---------------------------------------------------------------------------
# Zigzag causal ring attention (balanced).
#
# Contiguous sharding makes causal ring work triangular: device 0 attends 1
# chunk while device n-1 attends n — per-step time is the max, so the ring
# runs at ~2x the balanced cost (VERDICT r1 #6). Zigzag sharding splits the
# global sequence into 2n chunks and gives device d the PAIR
# (chunk d, chunk 2n-1-d) — "lo" and "hi" halves. Then at ring step t
# (KV originated on device g = (idx - t) mod n), by chunk-id comparison:
#
#   q_hi vs kv_lo : hi id (2n-1-idx) > lo id (g)        -> FULL, every step
#   q_lo vs kv_lo : full if g < idx, causal diag if g == idx, else skip
#   q_hi vs kv_hi : full if g > idx, causal diag if g == idx, else skip
#   q_lo vs kv_hi : lo id (idx) < hi id (2n-1-g)        -> never
#
# Every device at every step does exactly 2 chunk-square equivalents (the
# g == idx step's two causal diagonals = 2 * 1/2 + 1 full) — UNIFORM load,
# verified by tests/test_parallel.py::test_zigzag_work_uniform.
# ---------------------------------------------------------------------------


def zigzag_shard(x, n, axis=2):
    """Global sequence tensor -> list of n zigzag local shards.

    Shard d = concat(chunk d, chunk 2n-1-d) of the 2n equal chunks along
    `axis`. Helper for tests / host-side setup (on device, use
    shard_map-compatible pre-sharded inputs)."""
    chunks = jnp.split(x, 2 * n, axis=axis)
    return [
        jnp.concatenate([chunks[d], chunks[2 * n - 1 - d]], axis=axis)
        for d in range(n)
    ]


def zigzag_unshard(shards, axis=2):
    """Inverse of zigzag_shard."""
    n = len(shards)
    lo, hi = [], []
    for d, s in enumerate(shards):
        c = s.shape[axis] // 2
        lo.append(jax.lax.slice_in_dim(s, 0, c, axis=axis))
        hi.append(jax.lax.slice_in_dim(s, c, 2 * c, axis=axis))
    return jnp.concatenate(lo + hi[::-1], axis=axis)


def zigzag_ring_flash_attention(q, k, v, axis_name: str,
                                scale: float | None = None,
                                kpad_mask=None, segment_ids=None):
    """Causal ring flash attention with ZIGZAG-sharded inputs.

    q/k/v: local (B, H, 2C, E) where rows [0, C) are global chunk `idx`
    and rows [C, 2C) are global chunk 2n-1-idx (see zigzag_shard).
    kpad_mask: optional local (B, 2C) bool over this shard's keys, same
    zigzag layout (rotates with the K/V pair). segment_ids: optional
    (q_seg, kv_seg) local (B, 2C) int pair for packed-docs masking.
    Returns the local output in the same zigzag layout.
    """
    q_seg = segment_ids[0] if segment_ids is not None else None
    kv_seg = segment_ids[1] if segment_ids is not None else None
    return _zz_fa(q, k, v, kpad_mask, q_seg, kv_seg, axis_name, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _zz_fa(q, k, v, kpad, q_seg, kv_seg, axis_name, scale):
    o, _ = _zz_fwd_impl(q, k, v, kpad, q_seg, kv_seg, axis_name, scale)
    return o


def _zz_pairs(idx, origin):
    """Branch index for the variable pair: 0 = lo-lo full, 1 = diag
    (both lo-lo and hi-hi causal), 2 = hi-hi full."""
    return jnp.where(origin == idx, 1, jnp.where(origin < idx, 0, 2))


def _zz_split(x, C):
    return (None, None) if x is None else (x[:, :C], x[:, C:])


def _zz_fwd_impl(q, k, v, kpad, q_seg, kv_seg, axis_name, scale):
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, L2, E = q.shape
    C = L2 // 2
    perm = [(i, (i + 1) % n) for i in range(n)]

    q_lo, q_hi = q[:, :, :C], q[:, :, C:]
    qseg_lo, qseg_hi = _zz_split(q_seg, C)
    o_lo = jnp.zeros((B, H, C, E), jnp.float32)
    o_hi = jnp.zeros((B, H, C, E), jnp.float32)
    lse_lo = jnp.full((B, H, C, 1), NEG, jnp.float32)
    lse_hi = jnp.full((B, H, C, 1), NEG, jnp.float32)
    k_cur, v_cur = k, v
    kpad_cur, kvseg_cur = kpad, kv_seg

    def fwd(qq, kk, vv, causal_flag, kp, qs, ks):
        seg = (qs, ks) if ks is not None else None
        return _fwd_impl(qq, kk, vv, None, kp, causal_flag, scale,
                         segment_ids=seg)

    for t in range(n):
        origin = (idx - t) % n
        k_lo, k_hi = k_cur[:, :, :C], k_cur[:, :, C:]
        v_lo, v_hi = v_cur[:, :, :C], v_cur[:, :, C:]
        kp_lo, kp_hi = _zz_split(kpad_cur, C)
        ks_lo, ks_hi = _zz_split(kvseg_cur, C)

        # constant work: q_hi vs kv_lo, full, every step
        o_t, lse_t = fwd(q_hi, k_lo, v_lo, False, kp_lo, qseg_hi, ks_lo)
        o_hi, lse_hi = _merge(o_hi, lse_hi, o_t.astype(jnp.float32), lse_t)

        def lo_full(args):
            (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
             o_lo, lse_lo, o_hi, lse_hi) = args
            o_t, lse_t = fwd(q_lo, k_lo, v_lo, False, kp_lo, qseg_lo, ks_lo)
            o_lo, lse_lo = _merge(
                o_lo, lse_lo, o_t.astype(jnp.float32), lse_t
            )
            return o_lo, lse_lo, o_hi, lse_hi

        def diag(args):
            (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
             o_lo, lse_lo, o_hi, lse_hi) = args
            o_t, lse_t = fwd(q_lo, k_lo, v_lo, True, kp_lo, qseg_lo, ks_lo)
            o_lo, lse_lo = _merge(
                o_lo, lse_lo, o_t.astype(jnp.float32), lse_t
            )
            o_t, lse_t = fwd(q_hi, k_hi, v_hi, True, kp_hi, qseg_hi, ks_hi)
            o_hi, lse_hi = _merge(
                o_hi, lse_hi, o_t.astype(jnp.float32), lse_t
            )
            return o_lo, lse_lo, o_hi, lse_hi

        def hi_full(args):
            (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
             o_lo, lse_lo, o_hi, lse_hi) = args
            o_t, lse_t = fwd(q_hi, k_hi, v_hi, False, kp_hi, qseg_hi, ks_hi)
            o_hi, lse_hi = _merge(
                o_hi, lse_hi, o_t.astype(jnp.float32), lse_t
            )
            return o_lo, lse_lo, o_hi, lse_hi

        args = (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
                o_lo, lse_lo, o_hi, lse_hi)
        o_lo, lse_lo, o_hi, lse_hi = jax.lax.switch(
            _zz_pairs(idx, origin), [lo_full, diag, hi_full], args
        )

        if t != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if kpad_cur is not None:
                kpad_cur = jax.lax.ppermute(kpad_cur, axis_name, perm)
            if kvseg_cur is not None:
                kvseg_cur = jax.lax.ppermute(kvseg_cur, axis_name, perm)

    o = jnp.concatenate([o_lo, o_hi], axis=2).astype(q.dtype)
    lse = jnp.concatenate([lse_lo, lse_hi], axis=2)
    return o, lse


def _zz_vjp_fwd(q, k, v, kpad, q_seg, kv_seg, axis_name, scale):
    o, lse = _zz_fwd_impl(q, k, v, kpad, q_seg, kv_seg, axis_name, scale)
    return o, (q, k, v, kpad, q_seg, kv_seg, o, lse)


def _zz_vjp_bwd(axis_name, scale, res, do):
    q, k, v, kpad, q_seg, kv_seg, o, lse = res
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    C = q.shape[2] // 2
    perm = [(i, (i + 1) % n) for i in range(n)]

    q_lo, q_hi = q[:, :, :C], q[:, :, C:]
    qseg_lo, qseg_hi = _zz_split(q_seg, C)
    o_lo, o_hi = o[:, :, :C], o[:, :, C:]
    lse_lo, lse_hi = lse[:, :, :C], lse[:, :, C:]
    do_lo, do_hi = do[:, :, :C], do[:, :, C:]

    dq_lo = jnp.zeros(q_lo.shape, jnp.float32)
    dq_hi = jnp.zeros(q_hi.shape, jnp.float32)
    k_cur, v_cur = k, v
    kpad_cur, kvseg_cur = kpad, kv_seg
    dkv_cur = jnp.zeros((2, *k.shape), jnp.float32)  # rotates with k/v

    def bwd(qq, kk, vv, oo, ll, dd, causal_flag, kp, qs, ks):
        seg = (qs, ks) if ks is not None else None
        dq_t, dk_t, dv_t, _ = flash_attention_bwd(
            qq, kk, vv, None, kp, oo, ll, dd,
            causal=causal_flag, scale=scale, segment_ids=seg,
        )
        return (
            dq_t.astype(jnp.float32),
            dk_t.astype(jnp.float32),
            dv_t.astype(jnp.float32),
        )

    for t in range(n):
        origin = (idx - t) % n
        k_lo, k_hi = k_cur[:, :, :C], k_cur[:, :, C:]
        v_lo, v_hi = v_cur[:, :, :C], v_cur[:, :, C:]
        kp_lo, kp_hi = _zz_split(kpad_cur, C)
        ks_lo, ks_hi = _zz_split(kvseg_cur, C)

        # constant: q_hi vs kv_lo full
        dq_t, dk_t, dv_t = bwd(q_hi, k_lo, v_lo, o_hi, lse_hi, do_hi,
                               False, kp_lo, qseg_hi, ks_lo)
        dq_hi = dq_hi + dq_t
        dkv_cur = dkv_cur.at[0, :, :, :C].add(dk_t)
        dkv_cur = dkv_cur.at[1, :, :, :C].add(dv_t)

        def lo_full(args):
            (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
             dq_lo, dq_hi, dkv_cur) = args
            dq_t, dk_t, dv_t = bwd(
                q_lo, k_lo, v_lo, o_lo, lse_lo, do_lo, False,
                kp_lo, qseg_lo, ks_lo,
            )
            return (
                dq_lo + dq_t,
                dq_hi,
                dkv_cur.at[0, :, :, :C].add(dk_t).at[1, :, :, :C].add(dv_t),
            )

        def diag(args):
            (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
             dq_lo, dq_hi, dkv_cur) = args
            dq_t, dk_t, dv_t = bwd(
                q_lo, k_lo, v_lo, o_lo, lse_lo, do_lo, True,
                kp_lo, qseg_lo, ks_lo,
            )
            dq_lo = dq_lo + dq_t
            dkv_cur = dkv_cur.at[0, :, :, :C].add(dk_t)
            dkv_cur = dkv_cur.at[1, :, :, :C].add(dv_t)
            dq_t, dk_t, dv_t = bwd(
                q_hi, k_hi, v_hi, o_hi, lse_hi, do_hi, True,
                kp_hi, qseg_hi, ks_hi,
            )
            dq_hi = dq_hi + dq_t
            dkv_cur = dkv_cur.at[0, :, :, C:].add(dk_t)
            dkv_cur = dkv_cur.at[1, :, :, C:].add(dv_t)
            return dq_lo, dq_hi, dkv_cur

        def hi_full(args):
            (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
             dq_lo, dq_hi, dkv_cur) = args
            dq_t, dk_t, dv_t = bwd(
                q_hi, k_hi, v_hi, o_hi, lse_hi, do_hi, False,
                kp_hi, qseg_hi, ks_hi,
            )
            return (
                dq_lo,
                dq_hi + dq_t,
                dkv_cur.at[0, :, :, C:].add(dk_t).at[1, :, :, C:].add(dv_t),
            )

        args = (k_lo, k_hi, v_lo, v_hi, kp_lo, kp_hi, ks_lo, ks_hi,
                dq_lo, dq_hi, dkv_cur)
        dq_lo, dq_hi, dkv_cur = jax.lax.switch(
            _zz_pairs(idx, origin), [lo_full, diag, hi_full], args
        )

        if t != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
            if kpad_cur is not None:
                kpad_cur = jax.lax.ppermute(kpad_cur, axis_name, perm)
            if kvseg_cur is not None:
                kvseg_cur = jax.lax.ppermute(kvseg_cur, axis_name, perm)
            dkv_cur = jax.lax.ppermute(dkv_cur, axis_name, perm)

    dkv_home = jax.lax.ppermute(dkv_cur, axis_name, perm)
    dq = jnp.concatenate([dq_lo, dq_hi], axis=2).astype(q.dtype)
    return (
        dq,
        dkv_home[0].astype(k.dtype),
        dkv_home[1].astype(v.dtype),
        None,
        None,
        None,
    )


_zz_fa.defvjp(_zz_vjp_fwd, _zz_vjp_bwd)
