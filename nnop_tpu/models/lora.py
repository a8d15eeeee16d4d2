"""LoRA fine-tuning: low-rank adapters over a frozen base model.

North-star framework scope (the reference is a kernel library with no
training stack — SURVEY.md §1). Design: adapters live in a SEPARATE
pytree from the frozen base params, so `jax.grad` differentiates only
the adapters and the optimizer state is rank-sized. The forward reuses
models/llama.py unchanged through its `matmul=` hook: `combine()` wraps
each targeted weight leaf in a `LoRAWeight(w, a, b)` pytree node and
`lora_matmul` computes `x @ w + (alpha/r) * (x @ a) @ b` — the low-rank
product is never materialized as a (d, d) matrix, so the extra cost per
step is O(d * r) weights traffic, not a second weight stream.

For serving, `merge_lora()` folds the adapters into plain weights
(w + (alpha/r) a @ b) — the merged tree is a drop-in params pytree for
generate/Engine/quantize paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nnop_tpu.models.llama import LlamaConfig, forward, init_params

DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


@jax.tree_util.register_pytree_node_class
class LoRAWeight:
    """A frozen base weight w plus its low-rank update (a, b).

    scaling = alpha / rank is folded in at apply time (the standard LoRA
    parameterization: update = scaling * a @ b with b zero-initialized,
    so training starts exactly at the base model).
    """

    def __init__(self, w, a, b, scaling: float):
        self.w, self.a, self.b, self.scaling = w, a, b, scaling

    def tree_flatten(self):
        return (self.w, self.a, self.b), self.scaling

    @classmethod
    def tree_unflatten(cls, scaling, children):
        return cls(*children, scaling)


def lora_matmul(x, w):
    """`matmul=` hook for models/llama.py forward: plain einsum for
    ordinary leaves, base-plus-low-rank for LoRAWeight leaves."""
    if isinstance(w, LoRAWeight):
        base = jnp.einsum("bld,do->blo", x, w.w)
        lo = jnp.einsum("blr,ro->blo",
                        jnp.einsum("bld,dr->blr", x, w.a), w.b)
        return base + (w.scaling * lo).astype(base.dtype)
    return jnp.einsum("bld,do->blo", x, w)


def init_lora(key, cfg: LlamaConfig, rank: int = 8,
              targets=DEFAULT_TARGETS):
    """Adapter pytree mirroring params["layers"]: per target weight,
    {"a": (in, r) ~ N(0, 1/r), "b": (r, out) zeros} in fp32 (adapters
    are tiny; full precision costs nothing and trains stably)."""
    shapes = jax.eval_shape(lambda k: init_params(k, cfg),
                            jax.random.key(0))
    keys = jax.random.split(key, cfg.n_layers)

    def layer(i):
        out = {}
        ks = jax.random.split(keys[i], len(targets))
        for k, name in zip(ks, targets):
            if name not in shapes["layers"][i]:
                continue
            d_in, d_out = shapes["layers"][i][name].shape
            out[name] = {
                "a": jax.random.normal(k, (d_in, rank), jnp.float32)
                * rank**-0.5,
                "b": jnp.zeros((rank, d_out), jnp.float32),
            }
        return out

    return {"layers": [layer(i) for i in range(cfg.n_layers)]}


def combine(params, adapters, alpha: float = 16.0):
    """Wrap each adapted leaf of the (frozen) base params in a
    LoRAWeight so llama.forward(..., matmul=lora_matmul) applies the
    low-rank update. Non-adapted leaves pass through untouched."""
    out = dict(params)
    layers = []
    for base_layer, ad_layer in zip(params["layers"], adapters["layers"]):
        new = dict(base_layer)
        for name, ab in ad_layer.items():
            rank = ab["a"].shape[1]
            new[name] = LoRAWeight(
                base_layer[name], ab["a"], ab["b"], alpha / rank
            )
        layers.append(new)
    out["layers"] = layers
    return out


def merge_lora(params, adapters, alpha: float = 16.0):
    """Fold adapters into plain weights for serving: a drop-in params
    pytree (w + scaling * a @ b in fp32, cast back to w.dtype)."""
    out = dict(params)
    layers = []
    for base_layer, ad_layer in zip(params["layers"], adapters["layers"]):
        new = dict(base_layer)
        for name, ab in ad_layer.items():
            w = base_layer[name]
            scaling = alpha / ab["a"].shape[1]
            merged = w.astype(jnp.float32) + scaling * (ab["a"] @ ab["b"])
            new[name] = merged.astype(w.dtype)
        layers.append(new)
    out["layers"] = layers
    return out


def lora_loss_fn(adapters, params, tokens, targets_tok, cfg: LlamaConfig,
                 alpha: float = 16.0):
    """Next-token cross-entropy with the base frozen: adapters is the
    FIRST arg so jax.grad differentiates only the low-rank leaves."""
    logits = forward(combine(params, adapters, alpha), tokens, cfg,
                     matmul=lora_matmul)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets_tok[..., None], axis=-1)[..., 0]
    return -jnp.mean(ll)


def make_lora_train_step(cfg: LlamaConfig, optimizer=None,
                         alpha: float = 16.0):
    """Returns (jitted step, optimizer): step(adapters, opt_state,
    params, tokens, targets) -> (adapters, opt_state, loss). The base
    params are a jit ARGUMENT (never captured — see NOTES.md on closure
    constants) and receive no gradient; optimizer state mirrors the
    rank-sized adapter tree only."""
    from nnop_tpu.parallel.tp_llama import AdamW

    optimizer = optimizer or AdamW(1e-3)

    @jax.jit
    def step(adapters, opt_state, params, tokens, targets_tok):
        loss, grads = jax.value_and_grad(
            functools.partial(lora_loss_fn, cfg=cfg, alpha=alpha)
        )(adapters, params, tokens, targets_tok)
        adapters, opt_state = optimizer.update(grads, opt_state, adapters)
        return adapters, opt_state, loss

    return step, optimizer
