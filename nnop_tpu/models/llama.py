"""Llama-3-style transformer built on the fused kernel suite.

North-star scope (BASELINE.json configs 4-5): the reference is a kernel
library with no model zoo (SURVEY.md §1 "There is no ... model zoo"), so
this module is new TPU-first design, not a port. Pure-functional pytree
params (no flax dependency) so sharding annotations and shard_map
partitioning stay explicit.

Uses: rms_norm (fused, Pallas), llama_rope (fused), flash_attention
(fused, causal, GQA), SwiGLU MLP on the MXU via einsum, optional
weight-only INT8 matmuls (ops/quantized_matmul.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from nnop_tpu.ops.flash_attention import flash_attention
from nnop_tpu.ops.rms_norm import rms_norm
from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Decoder-transformer config covering the Llama lineage of families.

    Family knobs (all default to Llama-3 semantics):
      sliding_window: Mistral — causal attention restricted to the last
        `sliding_window` keys (kernel support: flash_attention(window=),
        decode_attention(window=)).
      rms_offset: Gemma — rms_norm computes (offset + w) * x_hat, so
        weights store w - 1 ("zero-centered"). The fused rms_norm kernel
        carries this natively (reference parity: rms_norm.jl:117).
      act: "silu" (Llama/Mistral/Qwen SwiGLU) or "gelu" (Gemma GeGLU).
      qkv_bias: Qwen2 — additive bias on the q/k/v projections only.
      tie_embeddings: lm_head = embed^T (Gemma, Qwen2-small).
      embed_scale: multiply embeddings by this after lookup (Gemma:
        sqrt(dim)).
      attn_softcap / final_softcap: Gemma-2 — logit softcapping
        c*tanh(s/c) on attention scores / final LM logits (kernel
        support: flash_attention(softcap=), decode_attention(softcap=)).
      attn_scale: override the attention score scale (Gemma-2
        query_pre_attn_scalar**-0.5; default None = 1/sqrt(head_dim)).
      post_norms: Gemma-2 — extra rms_norm applied to each sublayer
        OUTPUT before the residual add (weights attn_post_norm /
        mlp_post_norm).
      window_pattern: Gemma-2 alternating local/global attention — the
        sliding window applies only on layers where
        layer_idx % window_pattern == 0 (None = window on all layers).
      rope_scaling: Llama-3.1 NTK-by-parts scaling as a tuple
        (factor, low_freq_factor, high_freq_factor, original_max_len).
      n_experts / n_experts_per_token: Mixtral — the MLP becomes a
        top-k-routed mixture of experts (models/moe.py); hidden_dim is
        the per-expert hidden size. capacity_factor bounds per-expert
        tokens (None = dropless, exact).
      router_aux_coef: weight of the Switch load-balancing loss added
        by loss_fn during MoE training.
    """

    vocab_size: int = 128256
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    hidden_dim: int = 14336
    rope_base: float = 500000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 8192
    dtype: Any = jnp.bfloat16
    sliding_window: int | None = None
    rms_offset: float = 0.0
    act: str = "silu"
    qkv_bias: bool = False
    tie_embeddings: bool = False
    embed_scale: float | None = None
    attn_softcap: float | None = None
    final_softcap: float | None = None
    attn_scale: float | None = None
    post_norms: bool = False
    window_pattern: int | None = None
    rope_scaling: tuple[float, float, float, int] | None = None
    n_experts: int | None = None
    n_experts_per_token: int = 2
    capacity_factor: float | None = None
    router_aux_coef: float = 0.01
    moe_impl: str = "einsum"  # or "grouped" (Pallas exact-work path)

    def layer_window(self, li: int) -> int | None:
        """Effective sliding window for layer `li` (Gemma-2 alternates)."""
        if self.sliding_window is None:
            return None
        if self.window_pattern is not None and li % self.window_pattern != 0:
            return None
        return self.sliding_window

    @staticmethod
    def llama3_8b(**kw):
        return LlamaConfig(**kw)

    @staticmethod
    def mistral_7b(**kw):
        defaults = dict(
            vocab_size=32000,
            dim=4096,
            n_layers=32,
            n_heads=32,
            n_kv_heads=8,
            head_dim=128,
            hidden_dim=14336,
            rope_base=10000.0,
            rms_eps=1e-5,
            sliding_window=4096,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def gemma_2b(**kw):
        defaults = dict(
            vocab_size=256000,
            dim=2048,
            n_layers=18,
            n_heads=8,
            n_kv_heads=1,
            head_dim=256,
            hidden_dim=16384,
            rope_base=10000.0,
            rms_eps=1e-6,
            rms_offset=1.0,
            act="gelu",
            tie_embeddings=True,
            embed_scale=2048.0**0.5,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def llama31_8b(**kw):
        defaults = dict(
            max_seq_len=131072,
            rope_scaling=(8.0, 1.0, 4.0, 8192),
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def gemma2_2b(**kw):
        defaults = dict(
            vocab_size=256000,
            dim=2304,
            n_layers=26,
            n_heads=8,
            n_kv_heads=4,
            head_dim=256,
            hidden_dim=9216,
            rope_base=10000.0,
            rms_eps=1e-6,
            rms_offset=1.0,
            act="gelu",
            tie_embeddings=True,
            embed_scale=2304.0**0.5,
            attn_softcap=50.0,
            final_softcap=30.0,
            post_norms=True,
            sliding_window=4096,
            window_pattern=2,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def qwen2_7b(**kw):
        defaults = dict(
            vocab_size=152064,
            dim=3584,
            n_layers=28,
            n_heads=28,
            n_kv_heads=4,
            head_dim=128,
            hidden_dim=18944,
            rope_base=1000000.0,
            rms_eps=1e-6,
            qkv_bias=True,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def mixtral_8x7b(**kw):
        defaults = dict(
            vocab_size=32000,
            dim=4096,
            n_layers=32,
            n_heads=32,
            n_kv_heads=8,
            head_dim=128,
            hidden_dim=14336,
            rope_base=1000000.0,
            rms_eps=1e-5,
            n_experts=8,
            n_experts_per_token=2,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)

    @staticmethod
    def tiny_moe(**kw):
        defaults = dict(n_experts=4, n_experts_per_token=2)
        defaults.update(kw)
        return LlamaConfig.tiny(**defaults)

    @staticmethod
    def tiny(**kw):
        defaults = dict(
            vocab_size=256,
            dim=128,
            n_layers=2,
            n_heads=4,
            n_kv_heads=2,
            head_dim=32,
            hidden_dim=256,
            rope_base=10000.0,
            max_seq_len=256,
        )
        defaults.update(kw)
        return LlamaConfig(**defaults)


def init_params(key: jax.Array, cfg: LlamaConfig):
    """Random-init params pytree (HF-weight loading lives in weights.py)."""
    d, hd = cfg.dim, cfg.head_dim
    keys = jax.random.split(key, cfg.n_layers + 2)

    def dense(k, shape):
        fan_in = shape[0]
        return (jax.random.normal(k, shape, jnp.float32) * fan_in**-0.5).astype(
            cfg.dtype
        )

    # Gemma-style zero-centered norm weights: kernel computes
    # (rms_offset + w) * x_hat, so identity-init w is 1 - offset
    norm_init = 1.0 - cfg.rms_offset

    def layer(k):
        ks = jax.random.split(k, 7)
        out = {
            "attn_norm": jnp.full((d,), norm_init, cfg.dtype),
            "wq": dense(ks[0], (d, cfg.n_heads * hd)),
            "wk": dense(ks[1], (d, cfg.n_kv_heads * hd)),
            "wv": dense(ks[2], (d, cfg.n_kv_heads * hd)),
            "wo": dense(ks[3], (cfg.n_heads * hd, d)),
            "mlp_norm": jnp.full((d,), norm_init, cfg.dtype),
        }
        if cfg.n_experts is not None:
            from nnop_tpu.models.moe import init_moe_layer

            out.update(init_moe_layer(ks[4], cfg, dense))
        else:
            out.update({
                "w_gate": dense(ks[4], (d, cfg.hidden_dim)),
                "w_up": dense(ks[5], (d, cfg.hidden_dim)),
                "w_down": dense(ks[6], (cfg.hidden_dim, d)),
            })
        if cfg.qkv_bias:
            out["bq"] = jnp.zeros((cfg.n_heads * hd,), cfg.dtype)
            out["bk"] = jnp.zeros((cfg.n_kv_heads * hd,), cfg.dtype)
            out["bv"] = jnp.zeros((cfg.n_kv_heads * hd,), cfg.dtype)
        if cfg.post_norms:
            out["attn_post_norm"] = jnp.full((d,), norm_init, cfg.dtype)
            out["mlp_post_norm"] = jnp.full((d,), norm_init, cfg.dtype)
        return out

    params = {
        "embed": (
            jax.random.normal(keys[0], (cfg.vocab_size, d), jnp.float32) * 0.02
        ).astype(cfg.dtype),
        "layers": [layer(keys[i + 1]) for i in range(cfg.n_layers)],
        "final_norm": jnp.full((d,), norm_init, cfg.dtype),
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = dense(keys[-1], (d, cfg.vocab_size))
    return params


def _split_heads(x, n_heads, head_dim):
    # (B, L, H*E) -> (B, H, L, E)
    B, L, _ = x.shape
    return x.reshape(B, L, n_heads, head_dim).transpose(0, 2, 1, 3)


def _merge_heads(x):
    # (B, H, L, E) -> (B, L, H*E)
    B, H, L, E = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, L, H * E)


def _post(layer, out, cfg: LlamaConfig, key: str):
    """Gemma-2 post-norm: normalize the sublayer OUTPUT pre-residual."""
    if cfg.post_norms:
        return rms_norm(out, layer[key], cfg.rms_eps, offset=cfg.rms_offset)
    return out


def attention_block(layer, x, cos, sin, cfg: LlamaConfig, *, kv_cache=None,
                    kpad_mask=None, causal=True, matmul=None,
                    layer_idx: int = 0, segment_ids=None):
    """rms_norm -> qkv proj -> rope -> flash attention -> out proj.

    This is the reference-parity end-to-end slice (SURVEY.md §7 "Minimum
    end-to-end slice") plus KV-cache support for decode.
    """
    mm = matmul or (lambda x, w: jnp.einsum("bld,do->blo", x, w))
    h = rms_norm(x, layer["attn_norm"], cfg.rms_eps, offset=cfg.rms_offset)
    xq, xk, xv = mm(h, layer["wq"]), mm(h, layer["wk"]), mm(h, layer["wv"])
    if cfg.qkv_bias:
        xq, xk, xv = xq + layer["bq"], xk + layer["bk"], xv + layer["bv"]
    q = _split_heads(xq, cfg.n_heads, cfg.head_dim)
    k = _split_heads(xk, cfg.n_kv_heads, cfg.head_dim)
    v = _split_heads(xv, cfg.n_kv_heads, cfg.head_dim)
    q, k = llama_rope(q, k, cos, sin)
    window = cfg.layer_window(layer_idx)
    softcap = cfg.attn_softcap
    scale = cfg.attn_scale

    new_cache = None
    if kv_cache is not None:
        from nnop_tpu.ops.attention_decode import decode_attention

        new_cache = kv_cache.append(k, v)
        if q.shape[2] == 1:
            # single-token decode: fused flash-decode kernel over the
            # cache, with INT8 dequant fused in-loop when quantized
            B = q.shape[0]
            lengths = jnp.broadcast_to(new_cache.length, (B,))
            o = decode_attention(
                q,
                new_cache.k,
                new_cache.v,
                lengths,
                new_cache.k_scale,
                new_cache.v_scale,
                window=window,
                softcap=softcap,
                scale=scale,
            )
        else:
            # chunked prefill: the incoming L>1 block may land in a
            # NON-empty cache, so causal masking must use global positions
            # (row i attends cache cols <= old_length + i). Routed through
            # the offset-aware kernel; K/V go through the cache so decode
            # sees the quantized values.
            from nnop_tpu.ops.flash_attention import flash_attention_chunked

            kf, vf = new_cache.dequant_kv()
            valid = new_cache.valid_mask()
            if kpad_mask is not None:
                pad = jnp.ones_like(valid)
                pad = jax.lax.dynamic_update_slice(
                    pad, kpad_mask, (0, kv_cache.length)
                )
                valid = jnp.logical_and(valid, pad)
            o = flash_attention_chunked(
                q,
                kf.astype(q.dtype),
                vf.astype(q.dtype),
                causal_offset=kv_cache.length,
                kpad_mask=valid,
                window=window,
                softcap=softcap,
                scale=scale,
            )
        out = _post(
            layer, mm(_merge_heads(o.astype(x.dtype)), layer["wo"]), cfg,
            "attn_post_norm",
        )
        return x + out, new_cache

    o = flash_attention(
        q, k, v, causal=causal, kpad_mask=kpad_mask,
        segment_ids=(segment_ids, segment_ids)
        if segment_ids is not None else None,
        window=window if causal else None,
        softcap=softcap,
        scale=scale,
    )
    out = _post(
        layer, mm(_merge_heads(o.astype(x.dtype)), layer["wo"]), cfg,
        "attn_post_norm",
    )
    return x + out, new_cache


def mlp_block(layer, x, cfg: LlamaConfig, *, matmul=None):
    """SwiGLU MLP, or a routed mixture of experts when cfg.n_experts is
    set (Mixtral). Returns (x + out, aux) where aux is the router
    load-balancing loss (0.0 for dense)."""
    mm = matmul or (lambda x, w: jnp.einsum("bld,do->blo", x, w))
    h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps, offset=cfg.rms_offset)
    act = jax.nn.silu if cfg.act == "silu" else functools.partial(
        jax.nn.gelu, approximate=True
    )
    if cfg.n_experts is not None:
        from nnop_tpu.models.moe import moe_mlp

        B, L, d = h.shape
        out_flat, aux = moe_mlp(layer, h.reshape(B * L, d), cfg, act=act)
        out = _post(layer, out_flat.reshape(B, L, d), cfg, "mlp_post_norm")
        return x + out, aux
    gate = act(mm(h, layer["w_gate"]).astype(jnp.float32))
    up = mm(h, layer["w_up"]).astype(jnp.float32)
    out = _post(
        layer, mm((gate * up).astype(x.dtype), layer["w_down"]), cfg,
        "mlp_post_norm",
    )
    return x + out, jnp.float32(0.0)


def forward(params, tokens, cfg: LlamaConfig, *, positions=None,
            kv_caches=None, kpad_mask=None, matmul=None,
            return_aux=False, segment_ids=None):
    """Full forward pass: tokens (B, L) int32 -> logits (B, L, vocab).

    positions: (B, L) absolute positions (defaults to arange — pass the
    cache offset during decode). kv_caches: list of per-layer caches.
    return_aux: also return the summed router load-balancing loss
    (MoE configs; 0.0 for dense).
    """
    B, L = tokens.shape
    aux_total = jnp.float32(0.0)
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None], (B, L))
    x = params["embed"][tokens]
    if cfg.embed_scale is not None:
        x = (x.astype(jnp.float32) * cfg.embed_scale).astype(x.dtype)
    rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base,
                           scaling=cfg.rope_scaling)
    cos, sin = rope(positions)
    new_caches = [] if kv_caches is not None else None
    for i, layer in enumerate(params["layers"]):
        cache = kv_caches[i] if kv_caches is not None else None
        x, new_cache = attention_block(
            layer, x, cos, sin, cfg,
            kv_cache=cache, kpad_mask=kpad_mask, matmul=matmul,
            layer_idx=i, segment_ids=segment_ids,
        )
        if new_caches is not None:
            new_caches.append(new_cache)
        x, aux = mlp_block(layer, x, cfg, matmul=matmul)
        aux_total = aux_total + aux
    x = rms_norm(x, params["final_norm"], cfg.rms_eps, offset=cfg.rms_offset)
    mm = matmul or (lambda x, w: jnp.einsum("bld,do->blo", x, w))
    if cfg.tie_embeddings:
        logits = jnp.einsum(
            "bld,vd->blv", x, params["embed"]
        ).astype(jnp.float32)
    else:
        logits = mm(x, params["lm_head"]).astype(jnp.float32)
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    if kv_caches is not None:
        return (logits, new_caches, aux_total) if return_aux else (
            logits, new_caches)
    return (logits, aux_total) if return_aux else logits


def loss_fn(params, tokens, targets, cfg: LlamaConfig, *, matmul=None):
    """Next-token cross-entropy (mean over all positions), plus the
    router load-balancing aux for MoE configs."""
    logits, aux = forward(params, tokens, cfg, matmul=matmul,
                          return_aux=True)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    loss = -jnp.mean(ll)
    if cfg.n_experts is not None:
        loss = loss + cfg.router_aux_coef * aux / cfg.n_layers
    return loss


def init_quantized_params(key: jax.Array, cfg: LlamaConfig, *, wbits: int = 8):
    """Random weight-only-INT8/INT4 params built DIRECTLY as quantized
    tensors — never materializes the bf16/f32 full-precision weights (a
    random 8B in f32 would not fit host+device memory comfortably). Norms
    and the embedding table stay fp (models/quantized.py rationale)."""
    from nnop_tpu.ops.quantization import QTensor, QTensor4, _pick_pack_block

    d, hd = cfg.dim, cfg.head_dim
    keys = jax.random.split(key, cfg.n_layers + 2)

    def qdense(k, shape):
        fan_in = shape[0]
        if wbits == 4:
            p = _pick_pack_block(fan_in, 1024)
            kp = fan_in + (-fan_in % p)
            vals = jax.random.randint(
                k, (kp // 2, shape[1]), -128, 128, jnp.int8
            )
            scale = jnp.full(
                (kp // 128, shape[1]), fan_in**-0.5 / 4.1, jnp.float32
            )
            return QTensor4(vals, scale, 128, p)
        vals = jax.random.randint(k, shape, -127, 128, jnp.int8)
        # scale so dequantized weights have ~fan-in variance
        scale = jnp.full((shape[1],), fan_in**-0.5 / 74.0, jnp.float32)
        return QTensor(vals, scale, 0)

    def qexperts(k, shape):
        # stacked (E, K, N) int8 experts, per-(E, N) scales (axis=1) —
        # served by grouped_matmul_quantized (int8 regardless of wbits;
        # see models/quantized.py on the int4 K-packing constraint)
        E_, K_, N_ = shape
        vals = jax.random.randint(k, shape, -127, 128, jnp.int8)
        scale = jnp.full((E_, N_), K_**-0.5 / 74.0, jnp.float32)
        return QTensor(vals, scale, 1)

    def layer(k):
        ks = jax.random.split(k, 8)
        out = {
            "attn_norm": jnp.ones((d,), cfg.dtype),
            "wq": qdense(ks[0], (d, cfg.n_heads * hd)),
            "wk": qdense(ks[1], (d, cfg.n_kv_heads * hd)),
            "wv": qdense(ks[2], (d, cfg.n_kv_heads * hd)),
            "wo": qdense(ks[3], (cfg.n_heads * hd, d)),
            "mlp_norm": jnp.ones((d,), cfg.dtype),
        }
        if cfg.n_experts is not None:
            E = cfg.n_experts
            out["w_router"] = (
                jax.random.normal(ks[7], (d, E), cfg.dtype) * 0.02
            )
            out["w_gate"] = qexperts(ks[4], (E, d, cfg.hidden_dim))
            out["w_up"] = qexperts(ks[5], (E, d, cfg.hidden_dim))
            out["w_down"] = qexperts(ks[6], (E, cfg.hidden_dim, d))
        else:
            out["w_gate"] = qdense(ks[4], (d, cfg.hidden_dim))
            out["w_up"] = qdense(ks[5], (d, cfg.hidden_dim))
            out["w_down"] = qdense(ks[6], (cfg.hidden_dim, d))
        return out

    return {
        "embed": (
            jax.random.normal(keys[0], (cfg.vocab_size, d), cfg.dtype) * 0.02
        ),
        "layers": [layer(keys[i + 1]) for i in range(cfg.n_layers)],
        "final_norm": jnp.ones((d,), cfg.dtype),
        "lm_head": qdense(keys[-1], (d, cfg.vocab_size)),
    }
