"""Expert parallelism: MoE experts sharded over an "expert" mesh axis.

North-star addition (reference has no MoE/EP — SURVEY.md §2.5). GShard
layout, TPU-native collectives:

* mesh axes ("data", "expert"): the batch is sharded over BOTH axes
  (every device is a data shard for the dense parts), expert weights
  are sharded over "expert" (each device owns E/ep experts) and
  replicated over "data"; router + attention weights are replicated
  everywhere.
* Each MoE layer does two `lax.all_to_all` collectives over the expert
  axis: dispatch (E, C, d) -> (E_local, ep*C, d) scatters every shard's
  per-expert token slabs to the expert owners; the inverse gathers the
  expert outputs back. Both ride ICI inside a shard_map.
* Gradients: expert-sharded leaves are averaged over "data" only;
  replicated leaves over both axes (see make_moe_train_step).

Also here: the PRODUCTION Mixtral layout (make_mixtral_train_step) —
TP attention and expert sharding share one "model" axis, activations
are token-sharded for the MoE block (Megatron-SP style), and gradients
are taken OUTSIDE the shard_map (see NOTES.md "shard_map gradient
semantics" for why per-shard grads are wrong under mixed redundancy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax import shard_map

from nnop_tpu.models.llama import (
    LlamaConfig,
    attention_block,
    rms_norm,
)
from nnop_tpu.models.moe import (
    expert_capacity,
    load_balance_loss,
    make_dispatch,
    router_topk,
)
from nnop_tpu.ops.rope import RotaryEmbedding


def make_ep_mesh(data: int = 1, expert: int = 1, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    n = data * expert
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, expert)
    return Mesh(arr, ("data", "expert"))


def moe_param_specs(cfg: LlamaConfig):
    """PartitionSpecs: expert stacks sharded on dim 0 over "expert"."""
    layer = {
        "attn_norm": P(),
        "wq": P(),
        "wk": P(),
        "wv": P(),
        "wo": P(),
        "mlp_norm": P(),
        "w_router": P(),
        "w_gate": P("expert", None, None),
        "w_up": P("expert", None, None),
        "w_down": P("expert", None, None),
    }
    return {
        "embed": P(),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
        "final_norm": P(),
        "lm_head": P(),
    }


def shard_moe_params(params, mesh: Mesh, cfg: LlamaConfig):
    specs = moe_param_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def moe_mlp_ep(layer, h, cfg: LlamaConfig, *, act, axis: str = "expert",
               aux_axes=("data", "expert")):
    """Expert-parallel MoE over LOCAL tokens h (T_local, d) inside a
    shard_map. layer["w_gate"/"w_up"/"w_down"] are LOCAL expert shards
    (E/ep, ...); the router weight is replicated and routes over the
    GLOBAL expert space so the choice is identical to single-device."""
    T, d = h.shape
    E = cfg.n_experts
    k = cfg.n_experts_per_token
    ep = jax.lax.psum(1, axis)
    if E % ep != 0:
        raise ValueError(f"n_experts={E} not divisible by ep={ep}")
    C = expert_capacity(T, E, k, cfg.capacity_factor)

    w, idx, probs = router_topk(h, layer["w_router"], k)
    dispatch, combine = make_dispatch(idx, w, E, C)

    xin = jnp.einsum("tec,td->ecd", dispatch.astype(h.dtype), h)
    # scatter expert slabs to their owners; gather ep*C token rows for
    # each local expert
    xin = jax.lax.all_to_all(xin, axis, split_axis=0, concat_axis=1,
                             tiled=True)  # (E/ep, ep*C, d)
    gate = act(
        jnp.einsum("ecd,edh->ech", xin, layer["w_gate"]).astype(jnp.float32)
    )
    up = jnp.einsum("ecd,edh->ech", xin, layer["w_up"]).astype(jnp.float32)
    xout = jnp.einsum(
        "ech,ehd->ecd", (gate * up).astype(h.dtype), layer["w_down"]
    )
    xout = jax.lax.all_to_all(xout, axis, split_axis=1, concat_axis=0,
                              tiled=True)  # (E, C, d)
    out = jnp.einsum("tec,ecd->td", combine.astype(h.dtype), xout)
    aux = load_balance_loss(probs, idx, E, axes=aux_axes)
    return out.astype(h.dtype), aux


def _ep_local_forward(params, tokens, cfg: LlamaConfig,
                      axis: str = "expert"):
    """Per-shard forward (inside shard_map): attention is pure-local
    (data parallel), the MoE MLP is expert-parallel over `axis`.
    Returns (logits, aux_sum)."""
    B, L = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None],
                                 (B, L))
    x = params["embed"][tokens]
    if cfg.embed_scale is not None:
        x = (x.astype(jnp.float32) * cfg.embed_scale).astype(x.dtype)
    rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base,
                           scaling=cfg.rope_scaling)
    cos, sin = rope(positions)
    act = jax.nn.silu if cfg.act == "silu" else jax.nn.gelu
    aux_total = jnp.float32(0.0)
    for i, layer in enumerate(params["layers"]):
        x, _ = attention_block(layer, x, cos, sin, cfg, layer_idx=i)
        h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps,
                     offset=cfg.rms_offset)
        out, aux = moe_mlp_ep(
            layer, h.reshape(B * L, cfg.dim), cfg, act=act, axis=axis
        )
        x = x + out.reshape(B, L, cfg.dim)
        aux_total = aux_total + aux
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, offset=cfg.rms_offset)
    logits = jnp.einsum("bld,dv->blv", x, params["lm_head"]).astype(
        jnp.float32
    )
    return logits, aux_total


def ep_forward(params, tokens, cfg: LlamaConfig, mesh: Mesh):
    """Jitted full-batch forward: tokens (B, L) sharded over
    data x expert; returns replicated logits (for tests/eval)."""
    fwd = shard_map(
        lambda p, t: _ep_local_forward(p, t, cfg)[0],
        mesh=mesh,
        in_specs=(moe_param_specs(cfg), P(("data", "expert"))),
        out_specs=P(("data", "expert")),
        check_vma=False,
    )
    return jax.jit(fwd)(params, tokens)


def make_moe_train_step(mesh: Mesh, cfg: LlamaConfig, optimizer=None):
    """dp x ep training step. Expert-sharded grads average over "data"
    only; replicated grads over both axes."""
    from nnop_tpu.parallel.tp_llama import AdamW

    optimizer = optimizer or AdamW(lr=1e-3)
    specs = moe_param_specs(cfg)

    def local_loss(p, tokens, targets):
        logits, aux = _ep_local_forward(p, tokens, cfg)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        loss = -jnp.mean(ll)
        if cfg.router_aux_coef:
            loss = loss + cfg.router_aux_coef * aux / cfg.n_layers
        return loss

    def local_step(p, tokens, targets):
        loss, grads = jax.value_and_grad(local_loss)(p, tokens, targets)
        ep = jax.lax.psum(1, "expert")
        # expert-sharded leaves: the all_to_all TRANSPOSE already summed
        # each expert's grad contributions from every expert-axis peer's
        # local loss, so averaging the per-shard mean losses needs an
        # extra 1/ep (verified vs single-device grads in
        # test_ep_grads_match_single_device)
        grads = jax.tree.map(
            lambda g, s: (
                jax.lax.pmean(g, "data") / ep if "expert" in s
                else jax.lax.pmean(g, ("data", "expert"))
            ),
            grads, specs,
        )
        return jax.lax.pmean(loss, ("data", "expert")), grads

    stepped = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(specs, P(("data", "expert")), P(("data", "expert"))),
        out_specs=(P(), specs),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, tokens, targets):
        loss, grads = stepped(params, tokens, targets)
        params, opt_state = optimizer.update(grads, opt_state, params)
        return params, opt_state, loss

    return step, optimizer


# ---------------------------------------------------------------------------
# Production Mixtral layout: TP attention + expert sharding on ONE
# "model" axis. Attention heads shard over "model" (Megatron TP,
# parallel/tp_llama.py); each device also owns E/tp experts, and the MoE
# layer exchanges tokens over the SAME axis with two all_to_alls — the
# standard deployment for MoE transformers (attention is too small to
# expert-shard, experts too big to replicate).


def mixtral_param_specs(cfg: LlamaConfig):
    layer = {
        "attn_norm": P(),
        "wq": P(None, "model"),
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),
        "mlp_norm": P(),
        "w_router": P(),
        "w_gate": P("model", None, None),
        "w_up": P("model", None, None),
        "w_down": P("model", None, None),
    }
    return {
        "embed": P(),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
        "final_norm": P(),
        "lm_head": P(None, "model"),
    }


def shard_mixtral_params(params, mesh: Mesh, cfg: LlamaConfig):
    specs = mixtral_param_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def _mixtral_local_forward(params, tokens, cfg: LlamaConfig,
                           axis: str = "model"):
    """Per-shard forward inside shard_map: head-sharded attention
    (psum over `axis` after wo) + expert-sharded MoE (all_to_all over
    the same axis). Returns (vocab-sharded logits, aux_sum)."""
    from nnop_tpu.models.llama import _merge_heads, _split_heads
    from nnop_tpu.ops.flash_attention import flash_attention

    tp = jax.lax.psum(1, axis)
    if cfg.n_heads % tp or cfg.n_kv_heads % tp:
        raise ValueError(
            f"heads {cfg.n_heads}/{cfg.n_kv_heads} not divisible by "
            f"tp={tp}"
        )
    n_heads, n_kv = cfg.n_heads // tp, cfg.n_kv_heads // tp

    B, L = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None],
                                 (B, L))
    cos, sin = RotaryEmbedding(cfg.head_dim, cfg.rope_base,
                               scaling=cfg.rope_scaling)(positions)
    x = params["embed"][tokens]
    act = jax.nn.silu if cfg.act == "silu" else jax.nn.gelu
    aux_total = jnp.float32(0.0)
    for layer in params["layers"]:
        from nnop_tpu.ops.rope import llama_rope

        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = _split_heads(h @ layer["wq"], n_heads, cfg.head_dim)
        k = _split_heads(h @ layer["wk"], n_kv, cfg.head_dim)
        v = _split_heads(h @ layer["wv"], n_kv, cfg.head_dim)
        q, k = llama_rope(q, k, cos, sin)
        o = flash_attention(q, k, v, causal=True, scale=cfg.attn_scale)
        att = _merge_heads(o.astype(x.dtype)) @ layer["wo"]
        x = x + jax.lax.psum(att, axis)

        # Megatron-SP style: activations are replicated over the tp axis
        # after the attention psum, so TOKEN-shard them for the MoE block
        # (each shard routes/dispatches its own token slice — no
        # duplicated expert work) and all_gather the outputs back.
        h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
        hf = h.reshape(B * L, cfg.dim)
        if (B * L) % tp:
            raise ValueError(f"B*L={B * L} not divisible by tp={tp}")
        Tl = (B * L) // tp
        hs = jax.lax.dynamic_slice_in_dim(
            hf, jax.lax.axis_index(axis) * Tl, Tl, 0
        )
        out_s, aux = moe_mlp_ep(
            layer, hs, cfg, act=act, axis=axis, aux_axes=("data", axis)
        )
        out = jax.lax.all_gather(out_s, axis, axis=0, tiled=True)
        x = x + out.reshape(B, L, cfg.dim)
        aux_total = aux_total + aux
    x = rms_norm(x, params["final_norm"], cfg.rms_eps)
    return (x @ params["lm_head"]).astype(jnp.float32), aux_total


def make_mixtral_train_step(mesh: Mesh, cfg: LlamaConfig, optimizer=None):
    """dp("data") x [tp-attention + ep-experts]("model") training step.

    Gradients are taken OUTSIDE the shard_map: the per-shard forward has
    mixed redundancy (attention activations replicated over "model", MoE
    activations token-sharded), so per-shard jax.grad + hand reduction
    scaling is a minefield — shard_map's transpose rule handles psum /
    all_to_all / all_gather cotangents with global semantics, and the
    grads land with exactly the params' shardings. Verified against
    single-device grads leaf-by-leaf in test_mixtral_tp_ep_grads_match.
    """
    from nnop_tpu.parallel.tp_llama import AdamW, _sharded_xent

    optimizer = optimizer or AdamW(lr=1e-3)
    specs = mixtral_param_specs(cfg)

    def local_loss(params, tokens, targets):
        logits, aux = _mixtral_local_forward(params, tokens, cfg)
        loss = _sharded_xent(logits, targets)
        if cfg.router_aux_coef:
            loss = loss + cfg.router_aux_coef * aux / cfg.n_layers
        return jax.lax.pmean(loss, "data")

    fwd = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(specs, P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def step(params, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(
            lambda p: fwd(p, tokens, targets)
        )(params)
        params, opt_state = optimizer.update(grads, opt_state, params)
        return params, opt_state, loss

    return step, optimizer
