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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def ring_flash_attention(q, k, v, axis_name: str, causal: bool = True,
                         scale: float | None = None):
    """q/k/v: LOCAL shards (B, H, L/n, E), sequence-sharded over axis_name."""
    o, _ = _ring_fwd_impl(q, k, v, axis_name, causal, scale)
    return o


def _ring_fwd_impl(q, k, v, axis_name, causal, scale):
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = jax.lax.psum(1, axis_name)  # static: axis size
    idx = jax.lax.axis_index(axis_name)
    B, H, L, E = q.shape
    perm = [(i, (i + 1) % n) for i in range(n)]

    o = jnp.zeros((B, H, L, E), jnp.float32)
    lse = jnp.full((B, H, L, 1), NEG, jnp.float32)
    k_cur, v_cur = k, v

    for t in range(n):
        origin = (idx - t) % n

        def attend(causal_flag):
            def f(args):
                q, k_cur, v_cur, o, lse = args
                o_t, lse_t = _fwd_impl(
                    q, k_cur, v_cur, None, None, causal_flag, scale
                )
                return _merge(o, lse, o_t.astype(jnp.float32), lse_t)

            return f

        def skip(args):
            *_, o, lse = args
            return o, lse

        args = (q, k_cur, v_cur, o, lse)
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

    return o.astype(q.dtype), lse


def _ring_vjp_fwd(q, k, v, axis_name, causal, scale):
    o, lse = _ring_fwd_impl(q, k, v, axis_name, causal, scale)
    return o, (q, k, v, o, lse)


def _ring_vjp_bwd(axis_name, causal, scale, res, do):
    q, k, v, o, lse = res
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    dq = jnp.zeros(q.shape, jnp.float32)
    k_cur, v_cur = k, v
    dk_cur = jnp.zeros(k.shape, jnp.float32)
    dv_cur = jnp.zeros(v.shape, jnp.float32)

    for t in range(n):
        origin = (idx - t) % n

        def run(causal_flag):
            def f(args):
                q, k_cur, v_cur, dq, dk_cur, dv_cur = args
                dq_t, dk_t, dv_t, _ = flash_attention_bwd(
                    q, k_cur, v_cur, None, None, o, lse, do,
                    causal=causal_flag, scale=scale,
                )
                return (
                    dq + dq_t.astype(jnp.float32),
                    dk_cur + dk_t.astype(jnp.float32),
                    dv_cur + dv_t.astype(jnp.float32),
                )

            return f

        def skip(args):
            return args[3], args[4], args[5]

        args = (q, k_cur, v_cur, dq, dk_cur, dv_cur)
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

    # n-1 in-loop rotations: one more hop brings each accumulator home
    dk_home = jax.lax.ppermute(dk_cur, axis_name, perm)
    dv_home = jax.lax.ppermute(dv_cur, axis_name, perm)
    return dq.astype(q.dtype), dk_home.astype(k.dtype), dv_home.astype(v.dtype)


ring_flash_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)
