"""Tensor + data parallel Llama via shard_map (Megatron-style TP on TPU).

North-star scope (BASELINE.json: "weights and KV-cache tensor-sharded over
the mesh"); no reference counterpart (SURVEY.md §2.5: DP/TP/PP/SP all
absent). Design:

* mesh axes: "data" (batch), "model" (TP), "seq" (context/ring — see
  ring_attention.py).
* Attention: heads column-sharded over "model" (wq/wk/wv out-features),
  each shard runs the fused flash kernel on its local heads, wo is
  row-sharded and the output partial-summed over "model" — one psum per
  block, riding ICI.
* MLP: gate/up column-sharded, down row-sharded, one psum.
* lm_head vocab-sharded; cross-entropy uses a distributed log-softmax
  (local max/sum-exp + psum over "model") so full logits are never
  materialized.
* Everything runs INSIDE shard_map so the Pallas kernels see local shapes;
  grads are taken inside too (psum transposes correctly), then
  data-axis-averaged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax import shard_map

from nnop_tpu.models.llama import LlamaConfig, _merge_heads, _split_heads
from nnop_tpu.ops.flash_attention import flash_attention
from nnop_tpu.ops.rms_norm import rms_norm
from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope


def param_specs(cfg: LlamaConfig):
    """PartitionSpecs for the params pytree (Megatron TP layout)."""
    layer = {
        "attn_norm": P(),
        "wq": P(None, "model"),
        "wk": P(None, "model"),
        "wv": P(None, "model"),
        "wo": P("model", None),
        "mlp_norm": P(),
        "w_gate": P(None, "model"),
        "w_up": P(None, "model"),
        "w_down": P("model", None),
    }
    return {
        "embed": P(),
        "layers": [dict(layer) for _ in range(cfg.n_layers)],
        "final_norm": P(),
        "lm_head": P(None, "model"),
    }


def shard_params(params, mesh: Mesh, cfg: LlamaConfig, specs=None):
    specs = param_specs(cfg) if specs is None else specs
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
    )


def fsdp_param_specs(cfg: LlamaConfig, data: int):
    """ZeRO-3 specs: extend the TP layout by sharding every leaf over
    "data" on its first free, divisible dimension.

    Params (and therefore AdamW mu/nu, which mirror the tree) live
    sharded at rest — per-device param+optimizer memory drops ~data-fold
    — and are all-gathered transiently at their use site inside the
    forward (see _fsdp_gather / _local_forward), the standard FSDP
    gather-on-use discipline. The reference is single-device (SURVEY.md
    §2.5); this is north-star scale-out scope.
    """
    from nnop_tpu.models.llama import init_params

    specs = param_specs(cfg)
    shapes = jax.eval_shape(lambda k: init_params(k, cfg), jax.random.key(0))

    def extend(spec, shape):
        entries = list(spec) + [None] * (len(shape.shape) - len(spec))
        for i, (s, n) in enumerate(zip(entries, shape.shape)):
            if s is None and n % data == 0:
                entries[i] = "data"
                break
        return P(*entries)

    return jax.tree.map(extend, specs, shapes,
                        is_leaf=lambda x: isinstance(x, P))


def _fsdp_gather(x, spec):
    """all_gather a ZeRO-3-sharded leaf back to its TP-local shape at its
    use site (inside shard_map). Identity for leaves fsdp left alone."""
    for i, s in enumerate(spec):
        if s == "data":
            return jax.lax.all_gather(x, "data", axis=i, tiled=True)
    return x


def _local_forward(params, tokens, cfg: LlamaConfig, axis: str = "model",
                   seq_axis: str | None = None, zigzag: bool = False,
                   segments=None, positions_in=None, remat: bool = False,
                   fsdp_specs=None):
    """Per-shard forward: local head/feature shards + psum over `axis`.

    Runs inside shard_map; `params` leaves are LOCAL shards. When
    `seq_axis` is set, `tokens` is additionally sequence-sharded over that
    axis and attention runs as ring flash attention (context parallelism)
    with rotary positions offset by the shard's global start. With
    `zigzag`, the shards are ZIGZAG pairs (chunk idx + chunk 2n-1-idx —
    see ring_attention.zigzag_shard) and attention uses the balanced
    zigzag causal ring; positions are computed per half.
    """
    tp = jax.lax.psum(1, axis)
    if cfg.n_heads % tp != 0:
        raise ValueError(f"n_heads {cfg.n_heads} not divisible by tp={tp}")
    if cfg.n_kv_heads % tp != 0:
        # wk/wv are column-sharded into tp pieces; tp > n_kv_heads would
        # leave each shard with a fraction of a head (KV-head replication
        # is not implemented) — fail loudly instead of computing garbage.
        raise ValueError(
            f"n_kv_heads {cfg.n_kv_heads} not divisible by tp={tp}; "
            f"use tp <= n_kv_heads"
        )
    n_heads = cfg.n_heads // tp
    n_kv = cfg.n_kv_heads // tp

    B, L = tokens.shape
    if positions_in is not None:
        positions = positions_in
    elif seq_axis is not None and zigzag:
        n = jax.lax.psum(1, seq_axis)
        idx = jax.lax.axis_index(seq_axis)
        C = L // 2
        ar = jnp.arange(C, dtype=jnp.int32)
        positions = jnp.concatenate(
            [idx * C + ar, (2 * n - 1 - idx) * C + ar]
        )[None, :]
        positions = jnp.broadcast_to(positions, (B, L))
    else:
        pos0 = 0
        if seq_axis is not None:
            pos0 = jax.lax.axis_index(seq_axis) * L
        positions = pos0 + jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None], (B, L)
        )
    cos, sin = RotaryEmbedding(cfg.head_dim, cfg.rope_base, scaling=cfg.rope_scaling)(positions)

    if fsdp_specs is not None:
        # gather-on-use: each leaf is all-gathered right before its use
        # site — per-layer leaves inside one_layer so (a) XLA frees each
        # layer's full weights after their last use and (b) under remat
        # the backward RE-gathers per layer — peak full-weight residency
        # stays O(1 layer)
        gather = lambda k: _fsdp_gather(params[k], fsdp_specs[k])
        layer_spec = fsdp_specs["layers"][0]
    else:
        gather = lambda k: params[k]
        layer_spec = None
    x = gather("embed")[tokens]

    def one_layer(x, layer):
        if layer_spec is not None:
            layer = jax.tree.map(_fsdp_gather, layer, layer_spec)
        h = rms_norm(x, layer["attn_norm"], cfg.rms_eps)
        q = _split_heads(h @ layer["wq"], n_heads, cfg.head_dim)
        k = _split_heads(h @ layer["wk"], n_kv, cfg.head_dim)
        v = _split_heads(h @ layer["wv"], n_kv, cfg.head_dim)
        q, k = llama_rope(q, k, cos, sin)
        seg_pair = (segments, segments) if segments is not None else None
        if seq_axis is not None and zigzag:
            from nnop_tpu.parallel.ring_attention import (
                zigzag_ring_flash_attention,
            )

            o = zigzag_ring_flash_attention(q, k, v, seq_axis,
                                            segment_ids=seg_pair)
        elif seq_axis is not None:
            from nnop_tpu.parallel.ring_attention import ring_flash_attention

            o = ring_flash_attention(q, k, v, seq_axis, True, None,
                                     segment_ids=seg_pair)
        else:
            o = flash_attention(q, k, v, causal=True,
                                segment_ids=seg_pair)
        att = _merge_heads(o.astype(x.dtype)) @ layer["wo"]
        x = x + jax.lax.psum(att, axis)

        h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps)
        gate = jax.nn.silu((h @ layer["w_gate"]).astype(jnp.float32))
        up = (h @ layer["w_up"]).astype(jnp.float32)
        down = (gate * up).astype(x.dtype) @ layer["w_down"]
        return x + jax.lax.psum(down, axis)

    if remat:
        # activation checkpointing: save only each layer's input; the
        # backward recomputes attention/MLP activations (and re-runs the
        # psums) layer by layer — peak activation memory drops from
        # O(n_layers * per-layer activations) to O(n_layers * B * L * dim
        # + one layer's activations), the standard HBM-for-flops trade
        one_layer = jax.checkpoint(one_layer)

    for layer in params["layers"]:
        x = one_layer(x, layer)

    x = rms_norm(x, gather("final_norm"), cfg.rms_eps)
    logits_local = (x @ gather("lm_head")).astype(jnp.float32)  # (B, L, V/tp)
    return logits_local


def _sharded_xent(logits_local, targets, axis: str = "model"):
    """Cross-entropy with vocab-sharded logits: distributed log-softmax."""
    tp = jax.lax.psum(1, axis)
    v_local = logits_local.shape[-1]
    shard = jax.lax.axis_index(axis)
    lo = shard * v_local

    # m is only a numerical shift (cancels in logsumexp); computed via
    # all_gather+max because pmax has no differentiation rule
    local_max = jax.lax.stop_gradient(jnp.max(logits_local, axis=-1))
    m = jnp.max(jax.lax.all_gather(local_max, axis), axis=0)
    se = jax.lax.psum(
        jnp.sum(jnp.exp(logits_local - m[..., None]), axis=-1), axis
    )
    lse = m + jnp.log(se)

    # pick out the target logit if it lives on this shard
    tgt_local = targets - lo
    in_shard = (tgt_local >= 0) & (tgt_local < v_local)
    tgt_clamped = jnp.clip(tgt_local, 0, v_local - 1)
    picked = jnp.take_along_axis(logits_local, tgt_clamped[..., None], axis=-1)[
        ..., 0
    ]
    tgt_logit = jax.lax.psum(jnp.where(in_shard, picked, 0.0), axis)
    return jnp.mean(lse - tgt_logit)


class AdamW:
    """Minimal explicit AdamW whose state mirrors the params pytree
    ({"mu": params-like, "nu": params-like, "count": scalar}), so the
    optimizer state shards with exactly the same PartitionSpecs as the
    params — no pytree-prefix gymnastics under shard_map."""

    def __init__(self, lr=1e-4, b1=0.9, b2=0.999, eps=1e-8, wd=0.0,
                 clip_norm=None):
        """lr: float or a step->lr schedule callable
        (cosine_warmup_schedule). clip_norm: optional global-norm
        gradient clipping applied inside update()."""
        self.lr, self.b1, self.b2, self.eps, self.wd = lr, b1, b2, eps, wd
        self.clip_norm = clip_norm

    def init(self, params):
        zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return {
            "mu": zeros,
            "nu": jax.tree.map(jnp.copy, zeros),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(self, grads, state, params):
        if self.clip_norm is not None:
            grads, _ = clip_by_global_norm(grads, self.clip_norm)
        count = state["count"] + 1
        lr = (self.lr(count) if callable(self.lr) else self.lr)
        b1c = 1.0 - self.b1 ** count.astype(jnp.float32)
        b2c = 1.0 - self.b2 ** count.astype(jnp.float32)

        def upd(g, mu, nu, p):
            g = g.astype(jnp.float32)
            mu = self.b1 * mu + (1 - self.b1) * g
            nu = self.b2 * nu + (1 - self.b2) * g * g
            step = (mu / b1c) / (jnp.sqrt(nu / b2c) + self.eps)
            new_p = p.astype(jnp.float32) - lr * (
                step + self.wd * p.astype(jnp.float32)
            )
            return new_p.astype(p.dtype), mu, nu

        out = jax.tree.map(upd, grads, state["mu"], state["nu"], params)
        new_params = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        new_mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        new_nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
        return new_params, {"mu": new_mu, "nu": new_nu, "count": count}


def make_train_step(mesh: Mesh, cfg: LlamaConfig, optimizer: AdamW | None = None,
                    zigzag: bool = True, packed: bool = False,
                    remat: bool = False, fsdp: bool = False,
                    grad_accum: int = 1):
    """Returns (jitted train_step, optimizer) with dp over "data", tp
    over "model", and — when the mesh's "seq" axis is >1 — sp over "seq"
    (balanced ZIGZAG causal ring attention by default; zigzag=False
    keeps the contiguous ring).

    packed=False: step(params, opt_state, tokens, targets).
    packed=True: step(params, opt_state, tokens, targets, segments,
    positions) — document-aware packing (dataio.pack_tokens_segmented):
    segment masking rides the ring/zigzag with the K/V chunks and rope
    uses the per-document positions.

    remat=True: per-layer activation checkpointing (jax.checkpoint) —
    the backward recomputes each layer's activations from its input,
    cutting peak activation HBM ~n_layers-fold for ~33% extra flops;
    gradients are bitwise-identical (asserted in
    test_remat_grads_match).

    fsdp=True: ZeRO-3 — params AND optimizer state live sharded over
    "data" (fsdp_param_specs; ~data-fold less param/opt HBM per device),
    all-gathered transiently at each use site; the all_gather transposes
    to reduce_scatter under jax.grad-outside-shard_map, so grads land
    sharded and exact (test_fsdp_grads_match_single_device). Composes
    with tp ("model" axis), sp ("seq"), packed, and remat (backward
    re-gathers per layer).

    grad_accum=k: the leading batch axis is split into k microbatches
    scanned sequentially (activation memory of ONE microbatch), grads
    accumulated in f32 and averaged before a single optimizer update —
    numerically the same step as one large batch
    (test_grad_accum_matches_full_batch)."""
    optimizer = optimizer or AdamW(1e-3)
    pspecs = (fsdp_param_specs(cfg, mesh.shape["data"]) if fsdp
              else param_specs(cfg))
    fsdp_specs = pspecs if fsdp else None
    use_seq = "seq" in mesh.shape and mesh.shape["seq"] > 1
    seq_axis = "seq" if use_seq else None
    zigzag = zigzag and use_seq
    data_spec = P("data", "seq") if use_seq else P("data")
    rep_axes = ("data", "seq") if use_seq else ("data",)
    n_seq = mesh.shape.get("seq", 1)

    # Gradients are taken OUTSIDE the shard_map (jax.grad of the
    # shard_map'd loss): differentiating per-shard and hand-reducing is
    # subtly wrong — every model shard computes the identical global
    # loss (the xent psums over "model"), and the collective transposes
    # SUM the redundant cotangents, inflating every grad by tp (it was
    # uniform, so Adam's mu/sqrt(nu) masked it; gradient clipping or SGD
    # would not). The shard_map transpose rule yields exact global
    # grads — verified leaf-by-leaf in test_tp_grads_match_single_device.
    def local_loss(params, tokens, targets, segments=None, positions=None):
        logits = _local_forward(
            params, tokens, cfg, seq_axis=seq_axis, zigzag=zigzag,
            segments=segments, positions_in=positions, remat=remat,
            fsdp_specs=fsdp_specs,
        )
        return jax.lax.pmean(_sharded_xent(logits, targets), rep_axes)

    n_batch_in = 4 if packed else 2
    fwd = shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(pspecs,) + (data_spec,) * n_batch_in,
        out_specs=P(),
        check_vma=False,
    )

    def _zz(x):
        from nnop_tpu.parallel.ring_attention import zigzag_shard

        # permute the global sequence so contiguous shard d receives
        # the zigzag pair (chunk d, chunk 2n-1-d); the mean loss is
        # permutation-invariant, params/grads are position-free
        return jnp.concatenate(zigzag_shard(x, n_seq, axis=1), axis=1)

    def _grads(params, batch):
        """(loss, grads) — microbatch-scanned when grad_accum > 1."""
        if grad_accum == 1:
            return jax.value_and_grad(lambda p: fwd(p, *batch))(params)
        micro = tuple(
            x.reshape(grad_accum, x.shape[0] // grad_accum, *x.shape[1:])
            for x in batch
        )

        def body(carry, mb):
            acc_l, acc_g = carry
            l, g = jax.value_and_grad(lambda p: fwd(p, *mb))(params)
            acc_g = jax.tree.map(
                lambda a, b: a + b.astype(jnp.float32), acc_g, g
            )
            return (acc_l + l, acc_g), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        (loss, grads), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zeros), micro
        )
        grads = jax.tree.map(
            lambda g, p: (g / grad_accum).astype(p.dtype), grads, params
        )
        return loss / grad_accum, grads

    if packed:
        @jax.jit
        def step(params, opt_state, tokens, targets, segments, positions):
            if zigzag:
                tokens, targets, segments, positions = (
                    _zz(tokens), _zz(targets), _zz(segments), _zz(positions)
                )
            loss, grads = _grads(
                params, (tokens, targets, segments, positions)
            )
            params, opt_state = optimizer.update(grads, opt_state, params)
            return params, opt_state, loss
    else:
        @jax.jit
        def step(params, opt_state, tokens, targets):
            if zigzag:
                tokens, targets = _zz(tokens), _zz(targets)
            loss, grads = _grads(params, (tokens, targets))
            params, opt_state = optimizer.update(grads, opt_state, params)
            return params, opt_state, loss

    return step, optimizer


def clip_by_global_norm(grads, max_norm: float):
    """Scale grads so their global L2 norm is at most max_norm.

    Meaningful only with EXACT grads (see make_train_step: grads are
    taken outside the shard_map, so the norm is the true global norm —
    under the old per-shard tp-x inflation this would have clipped at
    the wrong threshold). Returns (clipped_grads, global_norm).
    """
    sq = jax.tree.reduce(
        lambda a, g: a + jnp.sum(jnp.square(g.astype(jnp.float32))),
        grads,
        jnp.float32(0.0),
    )
    norm = jnp.sqrt(sq)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    return jax.tree.map(lambda g: (g * scale).astype(g.dtype), grads), norm


def cosine_warmup_schedule(base_lr: float, warmup_steps: int,
                           total_steps: int, min_lr: float = 0.0):
    """step -> lr: linear warmup then cosine decay (the standard LM
    pretraining schedule)."""

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(1.0, float(warmup_steps))
        t = (step - warmup_steps) / jnp.maximum(
            1.0, float(total_steps - warmup_steps)
        )
        t = jnp.clip(t, 0.0, 1.0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_steps, warm, cos)

    return lr
