"""Pipeline parallelism: GPipe-style microbatch schedule over a "pipe"
mesh axis, activations passed stage-to-stage with ppermute over ICI.

No reference counterpart (SURVEY.md §2.5: DP/TP/PP/SP all absent in
NNop.jl); this completes the parallel-mode family next to tp_llama (TP),
ring_attention/ulysses (SP), and the "data" axis (DP). TPU-native design:

* Layer weights are STACKED on a leading (n_layers,) dim and sharded
  over "pipe" — inside shard_map each stage sees its (layers/stage, ...)
  slice and lax.scans over it (one trace, S-way parallel execution).
* Schedule: M microbatches over B, n_ticks = M + S - 1. Each tick every
  stage runs its layer stack on the activation it holds, then
  `ppermute` shifts activations stage i -> i+1. Stage 0 feeds fresh
  embeddings; the last stage banks its outputs into a buffer. SPMD means
  bubble ticks compute on zeros — the standard (M + S - 1)/M GPipe
  overhead, shrinking as M grows.
* The embedding table and lm_head are replicated (P()) — memory traded
  for schedule simplicity; the head matmul + loss run ONCE after the
  tick loop on the banked activations (masked to the last stage), not
  per tick.
* Backward is jax.grad straight through the tick scan: ppermute
  transposes to the reversed ring, so the reverse schedule emerges from
  autodiff; jax.checkpoint on the per-tick stage compute keeps live
  activation memory at O(ticks * mb * L * D) residuals instead of every
  intermediate inside the layer stack.

Composes with a "data" axis for DP (grads pmean'd over it). Uniform
attention windows only (alternating per-layer windows would need a
static layer index inside the weight scan).
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
    mlp_block,
)
from nnop_tpu.ops.rms_norm import rms_norm
from nnop_tpu.ops.rope import RotaryEmbedding
from nnop_tpu.parallel.tp_llama import AdamW


def make_pp_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = pipe * data
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return jax.make_mesh((data, pipe), ("data", "pipe"), devices=devices[:n])


def stack_layer_params(params):
    """[layer0_tree, layer1_tree, ...] -> one tree with (n_layers, ...)
    leaves, so the layer dim can be mesh-sharded over "pipe"."""
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params["layers"])
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = stacked
    return out


def unstack_layer_params(params, n_layers: int):
    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = [
        jax.tree.map(lambda x: x[i], params["layers"]) for i in range(n_layers)
    ]
    return out


def pp_param_specs(cfg: LlamaConfig):
    """Stacked-layer leaves sharded on the layer dim over "pipe";
    embed/norm/head replicated."""
    layer = jax.tree.map(
        lambda _: P("pipe"),
        {
            k: 0
            for k in (
                ["attn_norm", "wq", "wk", "wv", "wo",
                 "mlp_norm", "w_gate", "w_up", "w_down"]
                + (["w_router"] if cfg.n_experts is not None else [])
                + (["bq", "bk", "bv"] if cfg.qkv_bias else [])
                + (["attn_post_norm", "mlp_post_norm"] if cfg.post_norms
                   else [])
            )
        },
    )
    specs = {
        "embed": P(),
        "layers": layer,
        "final_norm": P(),
    }
    if not cfg.tie_embeddings:
        specs["lm_head"] = P()
    return specs


def shard_pp_params(params, mesh: Mesh, cfg: LlamaConfig):
    """Stack the layer list and lay it out over the "pipe" axis."""
    sp = stack_layer_params(params)
    specs = pp_param_specs(cfg)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), sp, specs
    )


def _stage_forward(stacked, x, cos, sin, cfg: LlamaConfig):
    """Run this stage's local layer stack (lax.scan over stacked
    weights)."""

    def body(h, layer):
        h, _ = attention_block(layer, h, cos, sin, cfg)
        h, _ = mlp_block(layer, h, cfg)
        return h, None

    x, _ = jax.lax.scan(body, x, stacked)
    return x


def _pp_loss(sp, tokens, targets, cfg: LlamaConfig, n_micro: int,
             n_stages: int, axis: str = "pipe"):
    """GPipe loss for one (local) batch; runs inside shard_map."""
    stage = jax.lax.axis_index(axis)
    B, L = tokens.shape
    if B % n_micro != 0:
        raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
    mb = B // n_micro
    toks = tokens.reshape(n_micro, mb, L)

    positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (mb, L))
    rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base,
                           scaling=cfg.rope_scaling)
    cos, sin = rope(positions)
    dtype = sp["embed"].dtype

    def embed_micro(mt):
        t = toks[jnp.clip(mt, 0, n_micro - 1)]
        x = sp["embed"][t]
        if cfg.embed_scale is not None:
            x = (x.astype(jnp.float32) * cfg.embed_scale).astype(dtype)
        return x

    n_ticks = n_micro + n_stages - 1
    D = cfg.dim
    stage_fn = jax.checkpoint(
        lambda layers, x: _stage_forward(layers, x, cos, sin, cfg)
    )

    def tick(carry, t):
        act_in, outbuf = carry
        x = jnp.where(stage == 0, embed_micro(t), act_in)
        y = stage_fn(sp["layers"], x)
        # bank the finished microbatch on the last stage
        mt_out = t - (n_stages - 1)
        valid = (mt_out >= 0) & (mt_out < n_micro) & (stage == n_stages - 1)
        upd = jax.lax.dynamic_update_slice(
            outbuf, y[None], (jnp.clip(mt_out, 0, n_micro - 1), 0, 0, 0)
        )
        outbuf = jnp.where(valid, upd, outbuf)
        act_next = jax.lax.ppermute(
            y, axis, [(i, i + 1) for i in range(n_stages - 1)]
        )
        return (act_next, outbuf), None

    act0 = jnp.zeros((mb, L, D), dtype)
    outbuf0 = jnp.zeros((n_micro, mb, L, D), dtype)
    (_, outbuf), _ = jax.lax.scan(
        tick, (act0, outbuf0), jnp.arange(n_ticks)
    )

    # head + loss once, on the banked activations (every stage computes
    # under SPMD; only the last stage's result survives the psum-select)
    x = outbuf.reshape(B, L, D)
    x = rms_norm(x, sp["final_norm"], cfg.rms_eps, offset=cfg.rms_offset)
    if cfg.tie_embeddings:
        logits = jnp.einsum("bld,vd->blv", x, sp["embed"]).astype(jnp.float32)
    else:
        logits = jnp.einsum(
            "bld,dv->blv", x, sp["lm_head"]
        ).astype(jnp.float32)
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    local = -jnp.mean(ll)
    return jax.lax.psum(
        jnp.where(stage == n_stages - 1, local, 0.0), axis
    )


def make_pp_loss(mesh: Mesh, cfg: LlamaConfig, n_micro: int = 4):
    """shard_mapped loss(stacked_params, tokens, targets) over
    ("data", "pipe")."""
    S = mesh.shape["pipe"]
    _check(cfg, S)
    pspecs = pp_param_specs(cfg)

    def loss(sp, tokens, targets):
        val = _pp_loss(sp, tokens, targets, cfg, n_micro, S)
        return jax.lax.pmean(val, "data")

    return shard_map(
        loss,
        mesh=mesh,
        in_specs=(pspecs, P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )


def _check(cfg: LlamaConfig, n_stages: int):
    if cfg.n_layers % n_stages != 0:
        raise ValueError(
            f"n_layers {cfg.n_layers} not divisible by pipe {n_stages}"
        )
    if cfg.sliding_window is not None:
        raise ValueError(
            "pp requires a uniform attention window (the stacked-layer "
            "scan has no static layer index for alternating windows)"
        )


def make_pp_train_step(mesh: Mesh, cfg: LlamaConfig, n_micro: int = 4,
                       optimizer: AdamW | None = None):
    """Returns (jitted step(sp, opt_state, tokens, targets) ->
    (sp, opt_state, loss), optimizer) with pp over "pipe" and dp over
    "data". Params must be pre-stacked/sharded via shard_pp_params."""
    optimizer = optimizer or AdamW(1e-3)
    S = mesh.shape["pipe"]
    _check(cfg, S)
    pspecs = pp_param_specs(cfg)
    opt_specs = {"mu": pspecs, "nu": pspecs, "count": P()}

    def step(sp, opt_state, tokens, targets):
        loss, grads = jax.value_and_grad(
            lambda p: _pp_loss(p, tokens, targets, cfg, n_micro, S)
        )(sp)
        # embed/norm/head grads exist on every stage but only carry that
        # stage's contribution paths (embed-gather on stage 0, head/norm
        # on the last) — psum over "pipe" makes the replicated leaves
        # consistent; layer grads are stage-local SHARDS and must NOT be
        # summed over "pipe"
        grads = {
            **{
                k: jax.lax.pmean(jax.lax.psum(g, "pipe"), "data")
                for k, g in grads.items()
                if k != "layers"
            },
            "layers": jax.tree.map(
                lambda g: jax.lax.pmean(g, "data"), grads["layers"]
            ),
        }
        loss = jax.lax.pmean(loss, "data")
        sp, opt_state = optimizer.update(grads, opt_state, sp)
        return sp, opt_state, loss

    sharded = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(pspecs, opt_specs, P("data"), P("data")),
            out_specs=(pspecs, opt_specs, P()),
            check_vma=False,
        )
    )
    return sharded, optimizer
