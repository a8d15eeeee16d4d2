"""Mixture-of-Experts layer: top-k router + capacity-based dispatch.

North-star addition (the reference has no MoE anywhere — SURVEY.md §2.5
"Expert parallel (EP): no MoE"); built TPU-first in the GShard/Switch
tradition rather than the GPU scatter/gather tradition:

- The router's dispatch/combine are expressed as one-hot EINSUMS so the
  whole layer is MXU work with static shapes — no data-dependent
  shapes, no host sync, differentiable end-to-end, and `pjit` can shard
  the expert axis (expert parallelism) with XLA inserting the
  all_to_all collectives.
- Experts are STACKED weight tensors (E, d, hidden) etc., so expert
  compute is one batched matmul per projection, not a Python loop.
- Fixed per-expert capacity C bounds memory and keeps shapes static;
  tokens over capacity are dropped (their combine weight is zero, the
  residual path carries them — standard on TPU since GShard). The
  default capacity is DROPLESS (C = T): exact Mixtral semantics, used
  by tests and small-batch decode. Pass capacity_factor for bounded-C
  training at scale.

Layout note: dispatch/combine masks are (T, E, C) with T the flattened
token axis — memory O(T*E*C) bf16. At dropless decode (T = B) this is
tiny; at training scale use capacity_factor ~1.25-2.

"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def router_topk(h, w_router, k: int):
    """Top-k routing, Mixtral convention (softmax over the top-k logits).

    h: (T, d) tokens; w_router: (d, E). Returns (weights (T, k) f32,
    idx (T, k) i32, probs (T, E) f32 full softmax — for the aux loss).
    """
    logits = jnp.einsum(
        "td,de->te", h.astype(jnp.float32), w_router.astype(jnp.float32)
    )
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(logits, k)
    w = jax.nn.softmax(topv, axis=-1)
    return w, topi.astype(jnp.int32), probs


def load_balance_loss(probs, idx, n_experts: int, axes=None):
    """Switch-Transformer auxiliary load-balancing loss.

    probs: (T, E) router softmax; idx: (T, k) chosen experts. Returns
    E * sum_e f_e * p_e where f_e is the fraction of (token, slot)
    assignments to expert e and p_e the mean router prob. Minimized
    (=1) at uniform routing. `axes`: mesh axis name(s) to pmean the
    per-expert statistics over BEFORE the product, so sharded training
    computes the same loss (and router gradient) as single-device —
    a mean of per-shard f_e*p_e products is NOT the global product.
    """
    E = n_experts
    onehot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # (T, k, E)
    f = jnp.mean(jnp.sum(onehot, axis=1), axis=0)  # (E,) assignment frac * k
    p = jnp.mean(probs, axis=0)  # (E,)
    if axes is not None:
        f = jax.lax.pmean(f, axes)
        p = jax.lax.pmean(p, axes)
    k = idx.shape[1]
    return E * jnp.sum((f / k) * p)


def expert_capacity(n_tokens: int, n_experts: int, k: int,
                    capacity_factor: float | None) -> int:
    """Per-expert token capacity C. None = dropless (C = n_tokens, every
    assignment fits by construction). Otherwise k*T/E * factor, rounded
    up to a multiple of 8 (TPU sublane) and clamped to [8, n_tokens]."""
    if capacity_factor is None:
        return max(8, n_tokens)
    c = int(n_tokens * k / n_experts * capacity_factor)
    c = -(-max(c, 1) // 8) * 8
    return min(max(c, 8), max(8, n_tokens))


def make_dispatch(idx, weights, n_experts: int, capacity: int):
    """Dispatch/combine tensors from top-k assignments.

    idx: (T, k) expert ids; weights: (T, k) combine weights.
    Returns (dispatch (T, E, C) bool-as-dtype, combine (T, E, C) f32).
    Position within an expert is assigned token-major then slot-major
    (GShard priority); assignments past capacity are dropped (combine
    weight 0 — the residual carries the token through unchanged).
    """
    T, k = idx.shape
    E, C = n_experts, capacity
    flat = idx.reshape(T * k)  # token-major: row t*k + j
    oh = jax.nn.one_hot(flat, E, dtype=jnp.int32)  # (T*k, E)
    pos_in_e = jnp.cumsum(oh, axis=0) - oh
    p = jnp.sum(pos_in_e * oh, axis=-1)  # (T*k,) slot within expert
    keep = (p < C).astype(jnp.float32)
    ohp = jax.nn.one_hot(p, C, dtype=jnp.float32)  # (T*k, C)
    # (T*k, E, C) -> (T, k, E, C); a token never repeats an expert in
    # its top-k, so summing the k axis keeps entries 0/1
    disp = (
        (oh.astype(jnp.float32) * keep[:, None])[:, :, None] * ohp[:, None, :]
    ).reshape(T, k, E, C)
    combine = jnp.sum(disp * weights.reshape(T, k, 1, 1), axis=1)
    dispatch = jnp.sum(disp, axis=1)
    return dispatch, combine


def moe_mlp(layer, h, cfg, *, act, impl: str | None = None,
            w8a8: bool = False):
    """MoE SwiGLU over flattened tokens h (T, d) -> (T, d), plus the
    router aux loss. layer holds w_router (d, E) and stacked expert
    weights w_gate/w_up (E, d, hidden), w_down (E, hidden, d).

    impl (default cfg.moe_impl): "einsum" = GShard one-hot dispatch
    (capacity semantics, sharding-friendly); "grouped" = expert-sorted
    Pallas grouped matmul (exact work, dropless, the serving path)."""
    from nnop_tpu.ops.quantization import QTensor, QTensor4

    impl = impl or cfg.moe_impl
    if (impl == "grouped" or "w_gateup" in layer
            or isinstance(layer.get("w_gate"), (QTensor, QTensor4))):
        # quantized and engine-fused experts are always served by the
        # grouped path (the dispatch einsums below need plain arrays)
        return moe_mlp_grouped(layer, h, cfg, act=act, w8a8=w8a8)
    T, d = h.shape
    E = cfg.n_experts
    k = cfg.n_experts_per_token
    C = expert_capacity(T, E, k, cfg.capacity_factor)

    w, idx, probs = router_topk(h, layer["w_router"], k)
    dispatch, combine = make_dispatch(idx, w, E, C)

    # (T, E, C) x (T, d) -> (E, C, d): gather each expert's tokens
    xin = jnp.einsum(
        "tec,td->ecd", dispatch.astype(h.dtype), h
    )
    gate = act(
        jnp.einsum("ecd,edh->ech", xin, layer["w_gate"]).astype(jnp.float32)
    )
    up = jnp.einsum("ecd,edh->ech", xin, layer["w_up"]).astype(jnp.float32)
    xout = jnp.einsum(
        "ech,ehd->ecd", (gate * up).astype(h.dtype), layer["w_down"]
    )
    out = jnp.einsum("tec,ecd->td", combine.astype(h.dtype), xout)
    aux = load_balance_loss(probs, idx, E)
    return out.astype(h.dtype), aux


def sort_tokens_by_expert(idx, n_experts: int, block_m: int):
    """Expert-sorted, block-aligned token layout for grouped_matmul.

    idx: (T, k) expert assignments. Returns (src, dest, block_groups, Tp):
    row j of the sorted buffer holds token src[j]'s features at position
    dest[j]; every expert's rows start at a block_m-aligned offset so
    each m-block belongs to exactly one expert. Tp is the static padded
    row count (T*k + one partial block per expert, rounded up). Unused
    rows stay zero; block_groups (Tp/block_m,) i32 is non-decreasing.
    """
    T, k = idx.shape
    E, bm = n_experts, block_m
    flat = idx.reshape(T * k)
    order = jnp.argsort(flat, stable=True)  # (T*k,) sorted-row -> flat-row
    es = flat[order]
    counts = jnp.bincount(flat, length=E)
    padded = ((counts + bm - 1) // bm) * bm
    pad_off = jnp.concatenate(
        [jnp.zeros((1,), counts.dtype), jnp.cumsum(padded)]
    )
    starts = jnp.cumsum(counts) - counts
    rank = jnp.arange(T * k, dtype=jnp.int32) - starts[es].astype(jnp.int32)
    dest = pad_off[es].astype(jnp.int32) + rank
    Tp = -(-(T * k + E * (bm - 1)) // bm) * bm  # static upper bound
    block_start = jnp.arange(Tp // bm, dtype=jnp.int32) * bm
    block_groups = jnp.clip(
        jnp.searchsorted(pad_off[1:], block_start, side="right"), 0, E - 1
    ).astype(jnp.int32)
    src = (order // k).astype(jnp.int32)  # token id per sorted row
    return src, dest, block_groups, Tp, order


def moe_mlp_grouped(layer, h, cfg, *, act, block_m: int | None = None,
                    w8a8: bool = False):
    """Exact-work MoE via ops/grouped_matmul (megablox-style): tokens
    sorted by expert, three grouped matmuls, weighted scatter-add back.
    Dropless always (capacity_factor is ignored); differentiable —
    grads match moe_mlp — EXCEPT under w8a8=True, whose
    grouped_matmul_w8a8 path is forward-only (no VJP): w8a8 is a
    serving-prefill optimization and raises under differentiation rather
    than silently mis-training (ADVICE r2). Only experts with tokens
    stream any weights, which is the decode-path win at small T.

    block_m trades padding waste (E*(block_m-1) dead rows, hurts small
    T) against weight re-streaming (each expert's slabs stream once per
    m-block it spans, hurts large T where the layer is HBM-bound); the
    default grows with expected tokens-per-expert."""
    from nnop_tpu.ops.grouped_matmul import (
        _grouped_matmul_q4,
        grouped_matmul,
        grouped_matmul_quantized,
        grouped_matmul_w8a8,
    )
    from nnop_tpu.ops.quantization import QTensor, QTensor4

    T, d = h.shape
    E = cfg.n_experts
    k = cfg.n_experts_per_token
    if block_m is None:
        per_expert = (T * k) // E
        if per_expert <= 64:
            # decode-scale: tiny per-expert counts. At block_m=128 the
            # padded (128, bk)@(bk, bn) dot (+ the weight cast) costs
            # ~2.5x the weight block's DMA, strangling the stream the
            # layer is bound by (measured 268 GB/s vs the 630 ceiling);
            # 32 rows keep the MXU work under the DMA time. Re-streaming
            # is bounded: <= ceil(per_expert*skew/32) blocks per expert.
            block_m = 32
        else:
            block_m = max(128, min(512, (per_expert // 128) * 128))

    w, idx, probs = router_topk(h, layer["w_router"], k)
    src, dest, block_groups, Tp, order = sort_tokens_by_expert(idx, E,
                                                               block_m)
    xs = jnp.zeros((Tp, d), h.dtype).at[dest].set(h[src])

    def gmm(x, wts):
        if isinstance(wts, QTensor):
            # w8a8 (opt-in, prefill-scale only): native int8 dots beat
            # cast->bf16 where the layer is MXU-bound, i.e. large Tp;
            # decode-scale stays weight-only (HBM-bound, exact acts)
            if w8a8 and wts.values.dtype == jnp.int8 and Tp >= 1024:
                return grouped_matmul_w8a8(x, wts, block_groups,
                                           block_m=block_m)
            return grouped_matmul_quantized(x, wts, block_groups,
                                            block_m=block_m)
        if isinstance(wts, QTensor4):
            return _grouped_matmul_q4(x, wts, block_groups,
                                      block_m=block_m, block_n=2048)
        return grouped_matmul(x, wts, block_groups, block_m=block_m)

    if "w_gateup" in layer:  # engine-fused experts: one pass for gate|up
        gu = gmm(xs, layer["w_gateup"]).astype(jnp.float32)
        gate, up = act(gu[:, : cfg.hidden_dim]), gu[:, cfg.hidden_dim:]
    else:
        gate = act(gmm(xs, layer["w_gate"]).astype(jnp.float32))
        up = gmm(xs, layer["w_up"]).astype(jnp.float32)
    y = gmm((gate * up).astype(h.dtype), layer["w_down"])  # (Tp, d)
    wf = w.reshape(T * k)[order].astype(jnp.float32)
    out = (
        jnp.zeros((T, d), jnp.float32)
        .at[src]
        .add(y[dest].astype(jnp.float32) * wf[:, None])
    )
    aux = load_balance_loss(probs, idx, E)
    return out.astype(h.dtype), aux


def moe_mlp_naive(layer, h, cfg, *, act):
    """Per-token oracle: out_t = sum_j w_j * SwiGLU_{e_j}(h_t). Dropless
    reference for tests (mirrors the reference suite's naive-vs-fused
    oracle pattern, SURVEY.md §4)."""
    w, idx, _ = router_topk(h, layer["w_router"], cfg.n_experts_per_token)

    def expert_out(e, t):
        g = act((t @ layer["w_gate"][e]).astype(jnp.float32))
        u = (t @ layer["w_up"][e]).astype(jnp.float32)
        return ((g * u).astype(t.dtype) @ layer["w_down"][e])

    def token(t_h, t_w, t_idx):
        outs = jnp.stack(
            [expert_out(t_idx[j], t_h) for j in range(cfg.n_experts_per_token)]
        )
        return jnp.sum(outs * t_w[:, None].astype(outs.dtype), axis=0)

    return jax.vmap(token)(h, w, idx).astype(h.dtype)


def init_moe_layer(key, cfg, dense):
    """Stacked-expert MoE weights for one layer (called by
    llama.init_params when cfg.n_experts is set)."""
    E, d, hd = cfg.n_experts, cfg.dim, cfg.hidden_dim
    ks = jax.random.split(key, 4)
    return {
        "w_router": dense(ks[0], (d, E)),
        "w_gate": jnp.stack([dense(k, (d, hd)) for k in
                             jax.random.split(ks[1], E)]),
        "w_up": jnp.stack([dense(k, (d, hd)) for k in
                           jax.random.split(ks[2], E)]),
        "w_down": jnp.stack([dense(k, (hd, d)) for k in
                             jax.random.split(ks[3], E)]),
    }


def moe_mlp_local_experts(layer, h, cfg, *, act, lo: int, n_local: int,
                          block_m: int = 32):
    """Local-expert contribution for REPLICATED tokens (the serving-TP
    layout, parallel/tp_decode.py): this shard owns experts
    [lo, lo + n_local); assignments to other shards' experts get
    combine weight 0 here and are summed in by the caller's psum —
    tokens are replicated over the axis, so no all_to_all is needed.
    layer weights are LOCAL stacks (n_local, ...); plain, QTensor, or
    QTensor4 (fused w_gateup supported). Returns (T, d)."""
    from nnop_tpu.ops.grouped_matmul import (
        _grouped_matmul_q4,
        grouped_matmul,
        grouped_matmul_quantized,
        grouped_matmul_w8a8,
    )
    from nnop_tpu.ops.quantization import QTensor, QTensor4

    T, d = h.shape
    k = cfg.n_experts_per_token

    w, idx, _ = router_topk(h, layer["w_router"], k)
    valid = (idx >= lo) & (idx < lo + n_local)
    idx_local = jnp.where(valid, idx - lo, 0)
    w = jnp.where(valid, w, 0.0)

    src, dest, block_groups, Tp, order = sort_tokens_by_expert(
        idx_local, n_local, block_m
    )
    xs = jnp.zeros((Tp, d), h.dtype).at[dest].set(h[src])

    def gmm(x, wts):
        if isinstance(wts, QTensor):
            # w8a8 (opt-in, prefill-scale only): native int8 dots beat
            # cast->bf16 where the layer is MXU-bound, i.e. large Tp;
            # decode-scale stays weight-only (HBM-bound, exact acts)
            if w8a8 and wts.values.dtype == jnp.int8 and Tp >= 1024:
                return grouped_matmul_w8a8(x, wts, block_groups,
                                           block_m=block_m)
            return grouped_matmul_quantized(x, wts, block_groups,
                                            block_m=block_m)
        if isinstance(wts, QTensor4):
            return _grouped_matmul_q4(x, wts, block_groups,
                                      block_m=block_m, block_n=2048)
        return grouped_matmul(x, wts, block_groups, block_m=block_m)

    if "w_gateup" in layer:
        hidden = cfg.hidden_dim
        gu = gmm(xs, layer["w_gateup"]).astype(jnp.float32)
        gate, up = act(gu[:, :hidden]), gu[:, hidden:]
    else:
        gate = act(gmm(xs, layer["w_gate"]).astype(jnp.float32))
        up = gmm(xs, layer["w_up"]).astype(jnp.float32)
    y = gmm((gate * up).astype(h.dtype), layer["w_down"])
    wf = w.reshape(T * k)[order].astype(jnp.float32)
    out = (
        jnp.zeros((T, d), jnp.float32)
        .at[src]
        .add(y[dest].astype(jnp.float32) * wf[:, None])
    )
    return out.astype(h.dtype)
