"""Inference engine: chunked staged decode + continuous batching.

North-star scope (BASELINE.json: "continuous batching ... decode tokens/s
per chip") — no reference counterpart (SURVEY.md §1: the reference is a
kernel library with no runtime). TPU-first design (round 2):

* THE fast path is `make_decode_chunk`: chunk_size decode steps in one
  dispatch over weight-fused UNROLLED layers. Each step appends its K/V
  token to a bf16 STAGING buffer with a uniform-index
  dynamic_update_slice (in-place inside the fori_loop — no scatter), and
  the fused decode kernel attends cache + staging; at chunk end ONE
  flush_staging pallas call quantizes the window in-VMEM and DMAs it
  into the int8 caches. This replaced per-token append scatters
  (~13 ms/step at 8B B=32) and amortizes the host round-trip over
  chunk_size tokens. Measured: 8B INT8 1840/2718 tok/s at B=32/64.
* The KV cache holds all layers as single stacked arrays
  (n_layers, B, KH, S, E); the decode kernel's BlockSpec index maps take
  the static per-layer slice, so no layer slice is ever materialized.
  `Engine(paged=True)` swaps the arrays for page pools + page tables
  (same staging design, paged flush).
* Continuous batching: fixed B slots. A slot is freed when its sequence
  finishes (mid-chunk finishes waste at most chunk_size-1 steps); new
  requests prefill into a free slot — long prompts stream through
  chunked prefill (offset-aware causal kernel into a live K/V buffer).
* `make_decode_step` (lax.scan over stacked weights) remains as the
  compile-time-friendly fallback: one layer traced regardless of depth,
  at ~2x the decode cost (weight slices copy; NOTES.md round 1).
"""

from __future__ import annotations

import contextvars
import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nnop_tpu.models.llama import LlamaConfig, _merge_heads, _split_heads
from nnop_tpu.ops.attention_decode import decode_attention
from nnop_tpu.ops.flash_attention import flash_attention
from nnop_tpu.ops.quantization import QTensor, QTensor4
from nnop_tpu.ops.quantized_matmul import (
    quantized_matmul,
    quantized_matmul4,
    quantized_matmul_w8a8,
)
from nnop_tpu.ops.rms_norm import rms_norm
from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope


_W8A8 = contextvars.ContextVar("nnop_w8a8", default=False)


def _mm(x, w):
    """Matmul dispatch: QTensor/QTensor4 weights -> fused-dequant kernel.

    Under the _W8A8 trace-time flag (set by the prefill builders when
    Engine(w8a8=True)), large-M int8 matmuls route to the native int8-MXU
    W8A8 kernel (quantized_matmul_w8a8: 1.8x the cast->bf16 rate at
    prefill shapes). Decode stays weight-only: M<=batch is HBM-bound and
    activation rounding buys nothing there."""
    if isinstance(w, QTensor):
        if (
            _W8A8.get()
            and w.values.dtype == jnp.int8
            and math.prod(x.shape[:-1]) >= 256
        ):
            return quantized_matmul_w8a8(x, w)
        return quantized_matmul(x, w)
    if isinstance(w, QTensor4):
        return quantized_matmul4(x, w)
    return x @ w

INT8_MAX = 127.0


# ---- family-aware building blocks (shared by every engine path) --------
# The LlamaConfig family knobs (models/llama.py: sliding_window,
# rms_offset, act, qkv_bias, tie_embeddings, embed_scale) are honored by
# the serving engine through these helpers so Mistral/Gemma/Qwen configs
# serve through the same fast path as Llama.


def _embed_tokens(params, cfg: LlamaConfig, tokens):
    x = params["embed"][tokens]
    if cfg.embed_scale is not None:
        x = (x.astype(jnp.float32) * cfg.embed_scale).astype(x.dtype)
    return x


def _act(cfg: LlamaConfig, g):
    if cfg.act == "silu":
        return jax.nn.silu(g)
    return jax.nn.gelu(g, approximate=True)


def _lm_logits(params, cfg: LlamaConfig, x):
    if cfg.tie_embeddings:
        emb = params["embed"]
        logits = jnp.einsum("...d,vd->...v", x, emb).astype(jnp.float32)
    elif isinstance(params["lm_head"], QTensor):
        # lm_head stays WEIGHT-ONLY even under w8a8: logits are the most
        # argmax-sensitive matmul, and W8A8 recipes keep the output head
        # activation-unquantized (ADVICE r2)
        logits = quantized_matmul(x, params["lm_head"]).astype(jnp.float32)
    else:
        logits = _mm(x, params["lm_head"]).astype(jnp.float32)
    if cfg.final_softcap is not None:
        logits = cfg.final_softcap * jnp.tanh(logits / cfg.final_softcap)
    return logits


def _layer_qkv(layer, h, cfg: LlamaConfig):
    """Q/K/V projections: fused wqkv (+bqkv) or separate, optional bias."""
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    if "wqkv" in layer:
        qkv = _mm(h, layer["wqkv"])
        if "bqkv" in layer:
            qkv = qkv + layer["bqkv"]
        xq, xk, xv = qkv[..., :qd], qkv[..., qd : qd + kvd], qkv[..., qd + kvd :]
    else:
        xq, xk, xv = _mm(h, layer["wq"]), _mm(h, layer["wk"]), _mm(h, layer["wv"])
        if "bq" in layer:
            xq, xk, xv = xq + layer["bq"], xk + layer["bk"], xv + layer["bv"]
    q = _split_heads(xq, cfg.n_heads, cfg.head_dim)
    k = _split_heads(xk, cfg.n_kv_heads, cfg.head_dim)
    v = _split_heads(xv, cfg.n_kv_heads, cfg.head_dim)
    return q, k, v


def _post_norm(layer, out, cfg: LlamaConfig, key: str):
    """Gemma-2 post-norm on the sublayer OUTPUT, pre-residual."""
    if cfg.post_norms:
        return rms_norm(out, layer[key], cfg.rms_eps, offset=cfg.rms_offset)
    return out


def _attn_out(layer, o, x, cfg: LlamaConfig):
    """Output projection + optional post-norm + residual add."""
    out = _mm(_merge_heads(o.astype(x.dtype)), layer["wo"])
    return x + _post_norm(layer, out, cfg, "attn_post_norm")


def _layer_mlp(layer, x, cfg: LlamaConfig):
    h = rms_norm(x, layer["mlp_norm"], cfg.rms_eps, offset=cfg.rms_offset)
    if "w_router" in layer:  # MoE (Mixtral): grouped expert path
        from nnop_tpu.models.moe import moe_mlp

        B, L, d = h.shape
        out, _ = moe_mlp(
            layer, h.reshape(B * L, d), cfg,
            act=lambda v: _act(cfg, v), impl="grouped",
            w8a8=_W8A8.get(),
        )
        out = out.reshape(B, L, d).astype(x.dtype)
        return x + _post_norm(layer, out, cfg, "mlp_post_norm")
    if "w_gateup" in layer:
        gu = _mm(h, layer["w_gateup"]).astype(jnp.float32)
        gate = _act(cfg, gu[..., : cfg.hidden_dim])
        up = gu[..., cfg.hidden_dim :]
    else:
        gate = _act(cfg, _mm(h, layer["w_gate"]).astype(jnp.float32))
        up = _mm(h, layer["w_up"]).astype(jnp.float32)
    out = _mm((gate * up).astype(x.dtype), layer["w_down"])
    return x + _post_norm(layer, out, cfg, "mlp_post_norm")


def stack_layers(params):
    """[{k: arr}, ...] -> {k: stacked arr (n_layers, ...)} for lax.scan."""
    layers = params["layers"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {**{k: v for k, v in params.items() if k != "layers"},
            "layers": stacked}


def _quant_token(x):
    """Per-(batch, head, token) symmetric int8. x: (B, KH, L, E)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax, 1e-8) / INT8_MAX
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[..., None]), -INT8_MAX, INT8_MAX
    ).astype(jnp.int8)
    return q, scale


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _admit_write_q(k, v, k_scale, v_scale, ks_l, vs_l, slot):
    """Quantize + write one slot's prefill K/V into the int8 caches.

    One jitted program per L-bucket with `slot` as a DYNAMIC arg: the
    previous eager `.at[:, slot, :, :L].set(...)` compiled a distinct
    XLA program per (slot, L) pair — ~4 programs x max_batch on a cold
    engine, minutes of remote compiles on this stack (seen in the r4
    mixed-load bench) — and copied the full cache 4x per admission.
    Donation lets XLA update the caches in place."""
    kq, ksc = _quant_token(ks_l)
    vq, vsc = _quant_token(vs_l)
    start5 = (0, slot, 0, 0, 0)
    k = jax.lax.dynamic_update_slice(k, kq[:, None], start5)
    v = jax.lax.dynamic_update_slice(v, vq[:, None], start5)
    start4 = (0, slot, 0, 0)
    k_scale = jax.lax.dynamic_update_slice(k_scale, ksc[:, None], start4)
    v_scale = jax.lax.dynamic_update_slice(v_scale, vsc[:, None], start4)
    return k, v, k_scale, v_scale


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _admit_write_pages_q(k, v, k_scale, v_scale, kq, vq, ksc, vsc,
                         pages, p0, n_live):
    """Write a prefilled prompt's quantized K/V into its pool pages in
    ONE donated program: pages [p0, n_live) of the slot, with kq/vq/
    ksc/vsc zero-padded to max_pages*page_size tokens so every page
    write is a full-width aligned slice (rows past the prompt are dead
    until the staged flush RMWs them). The previous eager per-page
    `.at[:, pid].set(...)` chain created a full undonated pool copy per
    write (~1.6 GB each on the 8B pool) — several in flight OOMed HBM
    at B=32 (params 7.4 GB + pool 3.5 GB + transients > 16 GB)."""
    pg = k.shape[3]
    nl, kh, _, e = kq.shape

    def body(pi, c):
        k, v, k_scale, v_scale = c
        pid = pages[pi]
        r0 = pi * pg
        sk = jax.lax.dynamic_slice(kq, (0, 0, r0, 0), (nl, kh, pg, e))
        sv = jax.lax.dynamic_slice(vq, (0, 0, r0, 0), (nl, kh, pg, e))
        k = jax.lax.dynamic_update_slice(k, sk[:, None], (0, pid, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(v, sv[:, None], (0, pid, 0, 0, 0))
        ssk = jax.lax.dynamic_slice(ksc, (0, 0, r0), (nl, kh, pg))
        ssv = jax.lax.dynamic_slice(vsc, (0, 0, r0), (nl, kh, pg))
        k_scale = jax.lax.dynamic_update_slice(
            k_scale, ssk[:, None], (0, pid, 0, 0))
        v_scale = jax.lax.dynamic_update_slice(
            v_scale, ssv[:, None], (0, pid, 0, 0))
        return k, v, k_scale, v_scale

    return jax.lax.fori_loop(p0, n_live, body, (k, v, k_scale, v_scale))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _admit_write_pages(k, v, kq, vq, pages, p0, n_live):
    """fp-pool variant of _admit_write_pages_q."""
    pg = k.shape[3]
    nl, kh, _, e = kq.shape

    def body(pi, c):
        k, v = c
        pid = pages[pi]
        r0 = pi * pg
        sk = jax.lax.dynamic_slice(kq, (0, 0, r0, 0), (nl, kh, pg, e))
        sv = jax.lax.dynamic_slice(vq, (0, 0, r0, 0), (nl, kh, pg, e))
        k = jax.lax.dynamic_update_slice(k, sk[:, None], (0, pid, 0, 0, 0))
        v = jax.lax.dynamic_update_slice(v, sv[:, None], (0, pid, 0, 0, 0))
        return k, v

    return jax.lax.fori_loop(p0, n_live, body, (k, v))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _admit_write(k, v, ks_l, vs_l, slot):
    """fp-cache variant of _admit_write_q."""
    start5 = (0, slot, 0, 0, 0)
    k = jax.lax.dynamic_update_slice(
        k, ks_l[:, None].astype(k.dtype), start5)
    v = jax.lax.dynamic_update_slice(
        v, vs_l[:, None].astype(v.dtype), start5)
    return k, v


@dataclasses.dataclass
class EngineState:
    """Device-side state (a pytree; see tree_flatten below).

    `lengths` counts FLUSHED tokens (the valid cache prefix); tokens
    generated inside the current decode chunk live in the bf16 staging
    buffers until `flush_staging` moves them into the caches at chunk end.
    """

    k: jax.Array        # (n_layers, B, KH, S, E) fp or int8
    v: jax.Array
    k_scale: Optional[jax.Array]  # (n_layers, B, KH, S) for int8
    v_scale: Optional[jax.Array]
    lengths: jax.Array  # (B,) int32
    last_token: jax.Array  # (B,) int32
    k_stage: Optional[jax.Array] = None  # (B, n_layers, KH, W, E) bf16
    v_stage: Optional[jax.Array] = None
    # paged mode: k/v above are POOLS (nl, n_pages, KH, page, E) and this
    # is the per-slot page table (B, max_pages) int32
    page_table: Optional[jax.Array] = None

    def tree_flatten(self):
        return (
            (self.k, self.v, self.k_scale, self.v_scale, self.lengths,
             self.last_token, self.k_stage, self.v_stage, self.page_table),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    EngineState,
    lambda s: s.tree_flatten(),
    EngineState.tree_unflatten,
)


STAGE_W = 32  # staging capacity: int8 sublane tile; chunk_size may be less


def init_state(cfg: LlamaConfig, batch: int, max_seq: int,
               quantized: bool, chunk: int = 0) -> EngineState:
    nl, kh, e = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    def stage():
        if not chunk:
            return None
        return jnp.zeros((batch, nl, kh, STAGE_W, e), jnp.bfloat16)
    if quantized:
        return EngineState(
            k=jnp.zeros((nl, batch, kh, max_seq, e), jnp.int8),
            v=jnp.zeros((nl, batch, kh, max_seq, e), jnp.int8),
            k_scale=jnp.zeros((nl, batch, kh, max_seq), jnp.float32),
            v_scale=jnp.zeros((nl, batch, kh, max_seq), jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
            last_token=jnp.zeros((batch,), jnp.int32),
            k_stage=stage(),
            v_stage=stage(),
        )
    return EngineState(
        k=jnp.zeros((nl, batch, kh, max_seq, e), cfg.dtype),
        v=jnp.zeros((nl, batch, kh, max_seq, e), cfg.dtype),
        k_scale=None,
        v_scale=None,
        lengths=jnp.zeros((batch,), jnp.int32),
        last_token=jnp.zeros((batch,), jnp.int32),
        k_stage=stage(),
        v_stage=stage(),
    )


def init_state_paged(cfg: LlamaConfig, batch: int, n_pages: int,
                     page_size: int, max_pages: int, quantized: bool,
                     chunk: int) -> EngineState:
    nl, kh, e = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim

    def stage():
        return jnp.zeros((batch, nl, kh, STAGE_W, e), jnp.bfloat16)

    pool_dtype = jnp.int8 if quantized else cfg.dtype
    return EngineState(
        k=jnp.zeros((nl, n_pages, kh, page_size, e), pool_dtype),
        v=jnp.zeros((nl, n_pages, kh, page_size, e), pool_dtype),
        k_scale=(
            jnp.zeros((nl, n_pages, kh, page_size), jnp.float32)
            if quantized else None
        ),
        v_scale=(
            jnp.zeros((nl, n_pages, kh, page_size), jnp.float32)
            if quantized else None
        ),
        lengths=jnp.zeros((batch,), jnp.int32),
        last_token=jnp.zeros((batch,), jnp.int32),
        k_stage=stage(),
        v_stage=stage(),
        page_table=jnp.zeros((batch, max_pages), jnp.int32),
    )


def _write_tokens(cache, new, positions):
    """cache (B, KH, S, ...), new (B, KH, L, ...): write at positions (B,)."""

    def one(c, n, p):
        idx = (0, p) + (0,) * (c.ndim - 2)
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), idx)

    return jax.vmap(one)(cache, new, positions)


def filtered_logits(logits, temperature: float, top_k: int = 0,
                    top_p: float = 1.0, min_p: float = 0.0):
    """Temperature/top-k/top-p/min-p filtered logits (B, V): softmax of
    the result IS the sampling target distribution — shared by plain
    sampling and the speculative rejection-sampling verify (which needs
    the target probabilities, not just a sample). top_p masks to the
    smallest prefix of the descending-prob distribution with cumulative
    mass >= top_p (the top-1 token always survives); min_p drops tokens
    whose probability is below min_p * max-probability."""
    scaled = logits / temperature
    if top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled >= kth, scaled, -jnp.inf)
    if min_p > 0.0:
        # p >= min_p * pmax  <=>  logit >= max_logit + log(min_p)
        cut = jnp.max(scaled, axis=-1, keepdims=True) + jnp.log(min_p)
        scaled = jnp.where(scaled >= cut, scaled, -jnp.inf)
    if top_p < 1.0:
        desc = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(desc, axis=-1)
        exclusive = jnp.cumsum(probs, axis=-1) - probs
        kept = jnp.where(exclusive < top_p, desc, jnp.inf)
        cutoff = jnp.min(kept, axis=-1, keepdims=True)
        scaled = jnp.where(scaled >= cutoff, scaled, -jnp.inf)
    return scaled


def sample_tokens(logits, key, temperature: float = 0.0, top_k: int = 0,
                  top_p: float = 1.0, min_p: float = 0.0):
    """Greedy (temperature 0) or filtered sampling; logits (B, V)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = filtered_logits(logits, temperature, top_k, top_p, min_p)
    return jax.random.categorical(key, scaled, axis=-1).astype(jnp.int32)


def spec_accept(fl, drafts, key):
    """Leviathan-style rejection-sampling verify for DETERMINISTIC drafts.

    fl: (B, T, V) filtered logits at each of the T = k+1 positions
    (softmax(fl[:, i]) is the target distribution for the token after
    input i); drafts: (B, k). The draft proposal is a point mass, so
    draft i is accepted with probability p_i(d_i), and on first rejection
    the replacement is drawn from the residual p_c with d_c removed
    (renormalized); if all k drafts are accepted the bonus token is drawn
    from p_k unmodified. Emitted tokens are distributed EXACTLY as
    sequential sampling from p (the rejection-sampling identity — the
    proposal never changes the output law, only the tokens-per-step
    rate).

    Returns (c (B,) int32 accepted-draft counts, final (B,) int32 the
    replacement/bonus token).
    """
    B, T, V = fl.shape
    k = T - 1
    p = jax.nn.softmax(fl, axis=-1)
    ku, kr = jax.random.split(key)
    u = jax.random.uniform(ku, (B, k))
    p_draft = jnp.take_along_axis(
        p[:, :k], drafts[..., None], axis=2
    )[..., 0]  # (B, k): target prob of each drafted token
    acc = (u < p_draft).astype(jnp.int32)
    c = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)  # first-rejection index
    fl_c = jnp.take_along_axis(
        fl, c[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]  # (B, V)
    # residual: remove the rejected draft's mass (only when c < k)
    d_ext = jnp.concatenate([drafts, jnp.zeros((B, 1), jnp.int32)], 1)
    d_c = jnp.take_along_axis(d_ext, c[:, None], 1)[:, 0]
    mask = (
        jax.nn.one_hot(d_c, V, dtype=bool) & (c < k)[:, None]
    )
    fl_c = jnp.where(mask, -jnp.inf, fl_c)
    final = jax.random.categorical(kr, fl_c, axis=-1).astype(jnp.int32)
    return c, final


def make_decode_step(cfg: LlamaConfig, quantized: bool,
                     temperature: float = 0.0, top_k: int = 0):
    """Returns decode_step(stacked_params, state, key) -> (logits, state)."""
    if cfg.window_pattern is not None:
        raise ValueError(
            "scan-based decode_step can't vary the window per layer; "
            "use the unrolled engine fast path (make_decode_chunk)"
        )

    def decode_step(sp, state: EngineState, key):
        B = state.lengths.shape[0]
        tokens = state.last_token[:, None]  # (B, 1)
        positions = state.lengths[:, None]
        x = _embed_tokens(sp, cfg, tokens)
        cos, sin = RotaryEmbedding(cfg.head_dim, cfg.rope_base, scaling=cfg.rope_scaling)(positions)

        def body(x, layer_and_cache):
            layer, kc, vc, ksc, vsc = layer_and_cache
            h = rms_norm(x, layer["attn_norm"], cfg.rms_eps,
                         offset=cfg.rms_offset)
            q, k, v = _layer_qkv(layer, h, cfg)
            q, k = llama_rope(q, k, cos, sin)

            if quantized:
                kq, ks = _quant_token(k)
                vq, vs = _quant_token(v)
                kc = _write_tokens(kc, kq, state.lengths)
                vc = _write_tokens(vc, vq, state.lengths)
                ksc = _write_tokens(ksc, ks, state.lengths)
                vsc = _write_tokens(vsc, vs, state.lengths)
            else:
                kc = _write_tokens(kc, k, state.lengths)
                vc = _write_tokens(vc, v, state.lengths)

            o = decode_attention(
                q, kc, vc, state.lengths + 1, ksc, vsc,
                window=cfg.sliding_window, softcap=cfg.attn_softcap,
                scale=cfg.attn_scale,
            )
            x = _attn_out(layer, o, x, cfg)
            x = _layer_mlp(layer, x, cfg)
            return x, (kc, vc, ksc, vsc)

        if quantized:
            xs = (sp["layers"], state.k, state.v, state.k_scale, state.v_scale)
        else:
            dummy = (jnp.zeros((cfg.n_layers,)),) * 2
            xs = (sp["layers"], state.k, state.v) + dummy
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(body, x, xs)

        x = rms_norm(x, sp["final_norm"], cfg.rms_eps, offset=cfg.rms_offset)
        logits = _lm_logits(sp, cfg, x)[:, 0]  # (B, V)

        new_state = EngineState(
            k=k_new,
            v=v_new,
            k_scale=ks_new if quantized else None,
            v_scale=vs_new if quantized else None,
            # only live slots advance (inactive slots hold length 0)
            lengths=state.lengths + (state.lengths > 0).astype(jnp.int32),
            last_token=sample_tokens(logits, key, temperature, top_k),
        )
        return logits, new_state

    return decode_step


def fuse_decode_weights(params):
    """Concatenate per-layer projections for fewer launches in decode:
    wq|wk|wv -> wqkv and w_gate|w_up -> w_gateup (QTensor or plain). The
    unrolled decode detects the fused keys."""

    def cat(ws):
        if isinstance(ws[0], QTensor):
            return QTensor(
                jnp.concatenate([w.values for w in ws], axis=1),
                jnp.concatenate([w.scale for w in ws], axis=0),
                0,
            )
        if isinstance(ws[0], QTensor4):
            # same K (packing layout) for all three; N-concat both planes
            return QTensor4(
                jnp.concatenate([w.packed for w in ws], axis=1),
                jnp.concatenate([w.scale for w in ws], axis=1),
                ws[0].group,
                ws[0].pack_block,
            )
        return jnp.concatenate(ws, axis=1)

    def cat_experts(ws):
        """Stacked (E, K, N) experts fuse along N (QTensor axis=1 keeps
        per-(E, N) scales; QTensor4 concats packed planes and group
        scales on N; plain arrays concat the last axis)."""
        if isinstance(ws[0], QTensor):
            return QTensor(
                jnp.concatenate([w.values for w in ws], axis=2),
                jnp.concatenate([w.scale for w in ws], axis=1),
                1,
            )
        if isinstance(ws[0], QTensor4):
            return QTensor4(
                jnp.concatenate([w.packed for w in ws], axis=2),
                jnp.concatenate([w.scale for w in ws], axis=2),
                ws[0].group,
                ws[0].pack_block,
            )
        return jnp.concatenate(ws, axis=2)

    out = {k: v for k, v in params.items() if k != "layers"}
    out["layers"] = []
    for layer in params["layers"]:
        fused = {
            k: v for k, v in layer.items()
            if k not in ("wq", "wk", "wv", "w_gate", "w_up",
                         "bq", "bk", "bv")
        }
        fused["wqkv"] = cat([layer["wq"], layer["wk"], layer["wv"]])
        if "w_router" in layer:  # MoE: stacked experts fuse along N
            fused["w_gateup"] = cat_experts([layer["w_gate"],
                                             layer["w_up"]])
        else:
            fused["w_gateup"] = cat([layer["w_gate"], layer["w_up"]])
        if "bq" in layer:  # Qwen2 qkv bias rides fused too
            fused["bqkv"] = jnp.concatenate(
                [layer["bq"], layer["bk"], layer["bv"]]
            )
        out["layers"].append(fused)
    return out


def make_decode_chunk(cfg: LlamaConfig, quantized: bool, chunk: int,
                      temperature: float = 0.0, top_k: int = 0,
                      top_p: float = 1.0, min_p: float = 0.0,
                      paged: bool = False, page_size: int = 0,
                      logprobs: bool = False):
    """The engine fast path: W(=chunk) decode steps in ONE dispatch.

    Per step, each layer's new K/V token is appended to the bf16 staging
    buffer with a uniform-index dynamic_update_slice (in place inside the
    fori_loop — no scatter, no per-token cache traffic), and the fused
    decode kernel attends cache + staging. At chunk end one flush_staging
    call quantizes the window and DMAs it into the int8 caches. This
    replaces round 1's ~13 ms/step of per-token KV-append scatters with
    ~O(token row) per step + an amortized flush, and amortizes the
    host round-trip over `chunk` tokens.

    Takes UNROLLED (optionally weight-fused) params. Returns
    chunk_fn(params, state, key) -> (tokens (chunk, B) int32, new_state).
    """
    from nnop_tpu.ops.kv_write import flush_staging, flush_staging_paged

    if paged:
        from nnop_tpu.ops.attention_decode_paged import paged_decode_attention

    def chunk_fn(params, state: EngineState, key):
        B = state.lengths.shape[0]
        rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base, scaling=cfg.rope_scaling)

        def step(i, carry):
            k_stage, v_stage, last, key, toks, lps = carry
            key, sub = jax.random.split(key)
            positions = (state.lengths + i)[:, None]
            x = _embed_tokens(params, cfg, last[:, None])
            cos, sin = rope(positions)

            for li, layer in enumerate(params["layers"]):
                h = rms_norm(x, layer["attn_norm"], cfg.rms_eps,
                             offset=cfg.rms_offset)
                q, k, v = _layer_qkv(layer, h, cfg)
                q, k = llama_rope(q, k, cos, sin)

                # (B, KH, 1, E) -> staging slot i (uniform index: in-place)
                k_stage = jax.lax.dynamic_update_slice(
                    k_stage, k.astype(jnp.bfloat16)[:, None], (0, li, 0, i, 0)
                )
                v_stage = jax.lax.dynamic_update_slice(
                    v_stage, v.astype(jnp.bfloat16)[:, None], (0, li, 0, i, 0)
                )

                if paged:
                    o = paged_decode_attention(
                        q, state.k, state.v, state.page_table,
                        state.lengths, state.k_scale, state.v_scale,
                        k_stage=k_stage, v_stage=v_stage, staged_n=i + 1,
                        layer=li, window=cfg.layer_window(li),
                        softcap=cfg.attn_softcap, scale=cfg.attn_scale,
                    )
                else:
                    o = decode_attention(
                        q, state.k, state.v, state.lengths,
                        state.k_scale, state.v_scale,
                        k_stage=k_stage, v_stage=v_stage, staged_n=i + 1,
                        layer=li, window=cfg.layer_window(li),
                        softcap=cfg.attn_softcap, scale=cfg.attn_scale,
                        block_b=0,
                    )
                x = _attn_out(layer, o, x, cfg)
                x = _layer_mlp(layer, x, cfg)

            x = rms_norm(x, params["final_norm"], cfg.rms_eps,
                         offset=cfg.rms_offset)
            logits = _lm_logits(params, cfg, x)[:, 0]
            nxt = sample_tokens(logits, sub, temperature, top_k, top_p,
                                min_p)
            toks = jax.lax.dynamic_update_slice(toks, nxt[None], (i, 0))
            if logprobs:
                logp = jax.nn.log_softmax(logits, axis=-1)
                lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
                lps = jax.lax.dynamic_update_slice(lps, lp[None], (i, 0))
            return (k_stage, v_stage, nxt, key, toks, lps)

        toks0 = jnp.zeros((chunk, B), jnp.int32)
        lps0 = jnp.zeros((chunk, B), jnp.float32)
        k_stage, v_stage, last, _, toks, lps = jax.lax.fori_loop(
            0, chunk, step,
            (state.k_stage, state.v_stage, state.last_token, key, toks0,
             lps0),
        )

        if paged:
            kc, vc, ksc, vsc = flush_staging_paged(
                state.k, state.v, state.k_scale, state.v_scale,
                k_stage, v_stage, state.lengths, state.page_table,
                page_size,
            )
        else:
            kc, vc, ksc, vsc = flush_staging(
                state.k, state.v, state.k_scale, state.v_scale,
                k_stage, v_stage, state.lengths,
            )
        active = (state.lengths > 0).astype(jnp.int32)
        new_state = EngineState(
            k=kc, v=vc, k_scale=ksc, v_scale=vsc,
            lengths=state.lengths + chunk * active,
            last_token=last,
            k_stage=k_stage, v_stage=v_stage,
            page_table=state.page_table,
        )
        if logprobs:
            return toks, lps, new_state
        return toks, new_state

    return chunk_fn


def ngram_draft(history, vlen, k: int):
    """Prompt-lookup drafting: continue the most recent earlier occurrence
    of the current trailing bigram.

    history: (B, S) int32 token ring (positions [0, vlen) valid).
    vlen: (B,) int32. Returns (B, k) draft tokens; falls back to
    repeating the last token when no bigram match exists (the verify
    step then just rejects — drafting can never change emitted tokens,
    only how many come per step).
    """
    B, S = history.shape
    pos = jnp.arange(S, dtype=jnp.int32)[None]
    a = jnp.take_along_axis(history, jnp.clip(vlen - 2, 0)[:, None], 1)
    b = jnp.take_along_axis(history, jnp.clip(vlen - 1, 0)[:, None], 1)
    prev = jnp.roll(history, 1, axis=1)  # prev[:, p] = history[:, p-1]
    match = (
        (prev == a) & (history == b) & (pos >= 1) & (pos < vlen[:, None] - 1)
    )
    idx = jnp.max(jnp.where(match, pos, -1), axis=1)  # most recent match
    found = idx >= 0
    start = jnp.clip(idx + 1, 0, S - k)
    drafts = jax.vmap(
        lambda h, s: jax.lax.dynamic_slice(h, (s,), (k,))
    )(history, start)
    last = b[:, 0]
    # no match, or the continuation runs past the valid prefix -> filler
    dpos = start[:, None] + jnp.arange(k, dtype=jnp.int32)[None]
    ok = found[:, None] & (dpos < vlen[:, None])
    return jnp.where(ok, drafts, last[:, None])


def make_spec_chunk(cfg: LlamaConfig, quantized: bool, n_steps: int,
                    spec_k: int, temperature: float = 0.0, top_k: int = 0,
                    top_p: float = 1.0, min_p: float = 0.0):
    """Speculative decode chunk: `n_steps` spec steps per
    dispatch. Each step drafts `spec_k` tokens by prompt-lookup
    (ngram_draft), runs ONE verify forward over T = spec_k + 1 tokens
    [last, d_1..d_k] (the multi-token decode_attention applies the
    intra-draft causal mask against the staging buffer), accepts a
    prefix, and flushes the staging window — the bf16
    staging IS the rollback mechanism: rejected tokens' K/V simply land
    above the advanced length and are overwritten by the next flush.

    Per step each sequence emits between 1 and spec_k + 1 tokens: the
    accepted drafts plus the model's correction token. Greedy spec decode
    (temperature 0) accepts exactly the argmax-matching prefix and is
    byte-identical to plain greedy decode (tested). Under sampling the
    verify is Leviathan rejection sampling (spec_accept): emitted tokens
    follow the temperature/top-k/top-p/min-p target distribution exactly
    (distribution-preservation tested); drafting quality only changes
    the tokens-per-step rate.

    Returns chunk_fn(params, state, history, key) ->
      (emitted (n_steps, B, T) int32, counts (n_steps, B) int32,
       new_state, new_history).
    """
    from nnop_tpu.ops.kv_write import flush_staging

    T = spec_k + 1
    if T > STAGE_W:
        raise ValueError(f"spec_k + 1 must be <= STAGE_W ({STAGE_W})")

    def chunk_fn(params, state: EngineState, history, key):
        B = state.lengths.shape[0]
        rope = RotaryEmbedding(cfg.head_dim, cfg.rope_base,
                               scaling=cfg.rope_scaling)

        def write_hist(hist, toks, at):
            return jax.vmap(
                lambda h, t, p: jax.lax.dynamic_update_slice(h, t, (p,))
            )(hist, toks, at)

        def step(i, carry):
            state, history, out_toks, out_counts = carry
            lens = state.lengths
            active = lens > 0

            drafts = ngram_draft(
                write_hist(history, state.last_token[:, None], lens),
                lens + 1, spec_k,
            )
            tokens_in = jnp.concatenate(
                [state.last_token[:, None], drafts], axis=1
            )  # (B, T)
            history = write_hist(history, tokens_in, lens)

            positions = lens[:, None] + jnp.arange(T, dtype=jnp.int32)[None]
            x = _embed_tokens(params, cfg, tokens_in)
            cos, sin = rope(positions)

            k_stage, v_stage = state.k_stage, state.v_stage
            for li, layer in enumerate(params["layers"]):
                h = rms_norm(x, layer["attn_norm"], cfg.rms_eps,
                             offset=cfg.rms_offset)
                q, kk, vv = _layer_qkv(layer, h, cfg)
                q, kk = llama_rope(q, kk, cos, sin)
                k_stage = jax.lax.dynamic_update_slice(
                    k_stage, kk.astype(jnp.bfloat16)[:, None],
                    (0, li, 0, 0, 0),
                )
                v_stage = jax.lax.dynamic_update_slice(
                    v_stage, vv.astype(jnp.bfloat16)[:, None],
                    (0, li, 0, 0, 0),
                )
                o = decode_attention(
                    q, state.k, state.v, lens,
                    state.k_scale, state.v_scale,
                    k_stage=k_stage, v_stage=v_stage, staged_n=T,
                    layer=li, window=cfg.layer_window(li),
                    softcap=cfg.attn_softcap, scale=cfg.attn_scale,
                    block_b=0,
                )
                x = _attn_out(layer, o, x, cfg)
                x = _layer_mlp(layer, x, cfg)
            x = rms_norm(x, params["final_norm"], cfg.rms_eps,
                         offset=cfg.rms_offset)
            logits_t = _lm_logits(params, cfg, x)  # (B, T, V)
            if temperature <= 0.0:
                # greedy verify: accept the longest argmax-matching prefix
                m = jnp.argmax(logits_t, axis=-1).astype(jnp.int32)
                eq = (drafts == m[:, :spec_k]).astype(jnp.int32)
                c = jnp.sum(jnp.cumprod(eq, axis=1), axis=1)
                m_at_c = jnp.take_along_axis(m, c[:, None], 1)[:, 0]
            else:
                V = logits_t.shape[-1]
                fl = filtered_logits(
                    logits_t.reshape(-1, V), temperature, top_k, top_p,
                    min_p,
                ).reshape(B, T, V)
                c, m_at_c = spec_accept(
                    fl, drafts, jax.random.fold_in(key, i)
                )
            jc = jnp.arange(T, dtype=jnp.int32)[None]
            drafts_ext = jnp.concatenate(
                [drafts, jnp.zeros((B, 1), jnp.int32)], axis=1
            )
            emitted = jnp.where(
                jc < c[:, None],
                drafts_ext,
                jnp.where(jc == c[:, None], m_at_c[:, None], 0),
            )
            n_emit = (c + 1) * active.astype(jnp.int32)

            kc, vc, ksc, vsc = flush_staging(
                state.k, state.v, state.k_scale, state.v_scale,
                k_stage, v_stage, lens,
            )
            new_state = EngineState(
                k=kc, v=vc, k_scale=ksc, v_scale=vsc,
                lengths=lens + n_emit,
                last_token=jnp.where(active, m_at_c, state.last_token),
                k_stage=k_stage, v_stage=v_stage,
                page_table=state.page_table,
            )
            out_toks = jax.lax.dynamic_update_slice(
                out_toks, emitted[None], (i, 0, 0)
            )
            out_counts = jax.lax.dynamic_update_slice(
                out_counts, n_emit[None], (i, 0)
            )
            return (new_state, history, out_toks, out_counts)

        out0 = jnp.zeros((n_steps, B, T), jnp.int32)
        cnt0 = jnp.zeros((n_steps, B), jnp.int32)
        state, history, toks, counts = jax.lax.fori_loop(
            0, n_steps, step, (state, history, out0, cnt0)
        )
        return toks, counts, state, history

    return chunk_fn


def make_prefill_unrolled(cfg: LlamaConfig, *, w8a8: bool = False):
    """Prefill over UNROLLED (optionally weight-fused) params — the same
    param set the chunked decode uses, so the engine holds one copy of the
    weights. Returns prefill(params, tokens (B, L)) ->
    (logits (B, L, V), k (nl, B, KH, L, E), v).

    w8a8=True routes large-M int8 matmuls to the native int8-MXU kernel
    (per-token activation quantization; see _mm)."""

    def prefill(params, tokens):
        tok = _W8A8.set(w8a8)
        try:
            return _prefill(params, tokens)
        finally:
            _W8A8.reset(tok)

    def _prefill(params, tokens):
        B, L = tokens.shape
        positions = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None], (B, L)
        )
        x = _embed_tokens(params, cfg, tokens)
        cos, sin = RotaryEmbedding(cfg.head_dim, cfg.rope_base, scaling=cfg.rope_scaling)(positions)
        ks, vs = [], []
        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"], cfg.rms_eps,
                         offset=cfg.rms_offset)
            q, k, v = _layer_qkv(layer, h, cfg)
            q, k = llama_rope(q, k, cos, sin)
            ks.append(k)
            vs.append(v)
            o = flash_attention(
                q, k, v, causal=True, window=cfg.layer_window(li),
                softcap=cfg.attn_softcap, scale=cfg.attn_scale,
            )
            x = _attn_out(layer, o, x, cfg)
            x = _layer_mlp(layer, x, cfg)
        x = rms_norm(x, params["final_norm"], cfg.rms_eps,
                     offset=cfg.rms_offset)
        logits = _lm_logits(params, cfg, x)
        return logits, jnp.stack(ks), jnp.stack(vs)

    return prefill


def make_prefill_chunk_step(cfg: LlamaConfig, *, w8a8: bool = False):
    """CHUNKED prefill into a live K/V buffer: processes one chunk of the
    prompt whose rows start at `offset` (traced), attending the fp K/V of
    all PREVIOUS chunks through the offset-aware causal kernel
    (flash_attention_chunked — row i sees buffer cols <= offset + i).
    Bounds prefill latency/compile shapes for long prompts: the buffer
    shape is fixed (one compile per bucket), offset is dynamic.

    step(params, tokens_c (1, C), ks_buf, vs_buf (nl, 1, KH, S, E) bf16,
         offset) -> (chunk logits (1, C, V), ks_buf, vs_buf updated)
    """
    from nnop_tpu.ops.flash_attention import flash_attention_chunked

    def step(params, tokens_c, ks_buf, vs_buf, offset):
        tok = _W8A8.set(w8a8)
        try:
            return _step(params, tokens_c, ks_buf, vs_buf, offset)
        finally:
            _W8A8.reset(tok)

    def _step(params, tokens_c, ks_buf, vs_buf, offset):
        B, C = tokens_c.shape
        S = ks_buf.shape[3]
        positions = offset + jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None], (B, C)
        )
        x = _embed_tokens(params, cfg, tokens_c)
        cos, sin = RotaryEmbedding(cfg.head_dim, cfg.rope_base, scaling=cfg.rope_scaling)(positions)
        valid = (
            jnp.arange(S, dtype=jnp.int32)[None] < offset + C
        )  # (1, S)
        for li, layer in enumerate(params["layers"]):
            h = rms_norm(x, layer["attn_norm"], cfg.rms_eps,
                         offset=cfg.rms_offset)
            q, k, v = _layer_qkv(layer, h, cfg)
            q, k = llama_rope(q, k, cos, sin)
            ks_buf = jax.lax.dynamic_update_slice(
                ks_buf, k.astype(jnp.bfloat16)[None], (li, 0, 0, offset, 0)
            )
            vs_buf = jax.lax.dynamic_update_slice(
                vs_buf, v.astype(jnp.bfloat16)[None], (li, 0, 0, offset, 0)
            )
            o = flash_attention_chunked(
                q,
                ks_buf[li].astype(q.dtype),
                vs_buf[li].astype(q.dtype),
                causal_offset=offset,
                kpad_mask=valid,
                window=cfg.layer_window(li),
                softcap=cfg.attn_softcap,
                scale=cfg.attn_scale,
            )
            x = _attn_out(layer, o, x, cfg)
            x = _layer_mlp(layer, x, cfg)
        x = rms_norm(x, params["final_norm"], cfg.rms_eps,
                     offset=cfg.rms_offset)
        logits = _lm_logits(params, cfg, x)
        return logits, ks_buf, vs_buf

    return step


def make_prefill(cfg: LlamaConfig):
    """Returns prefill(stacked_params, tokens (1, L)) -> (last_logits,
    k (nl, 1, KH, L, E), v (...)) using scan over layers with full causal
    flash attention."""
    if cfg.window_pattern is not None:
        raise ValueError(
            "scan-based prefill can't vary the window per layer; "
            "use make_prefill_unrolled"
        )

    def prefill(sp, tokens):
        B, L = tokens.shape
        positions = jnp.broadcast_to(
            jnp.arange(L, dtype=jnp.int32)[None], (B, L)
        )
        x = _embed_tokens(sp, cfg, tokens)
        cos, sin = RotaryEmbedding(cfg.head_dim, cfg.rope_base, scaling=cfg.rope_scaling)(positions)

        def body(x, layer):
            h = rms_norm(x, layer["attn_norm"], cfg.rms_eps,
                         offset=cfg.rms_offset)
            q, k, v = _layer_qkv(layer, h, cfg)
            q, k = llama_rope(q, k, cos, sin)
            o = flash_attention(
                q, k, v, causal=True, window=cfg.sliding_window,
                softcap=cfg.attn_softcap, scale=cfg.attn_scale,
            )
            x = _attn_out(layer, o, x, cfg)
            x = _layer_mlp(layer, x, cfg)
            return x, (k, v)

        x, (ks, vs) = jax.lax.scan(body, x, sp["layers"])
        x = rms_norm(x, sp["final_norm"], cfg.rms_eps, offset=cfg.rms_offset)
        logits = _lm_logits(sp, cfg, x)  # (B, L, V)
        return logits, ks, vs

    return prefill


class QueueFullError(Exception):
    """Raised by Engine.submit when the pending queue is at max_queue —
    the serving front-end maps this to HTTP 429 (VERDICT r3 item 10)."""


@dataclasses.dataclass(eq=False)  # identity semantics: two requests with
# equal payloads are still distinct queue entries (cancel uses `in`/`is`)
class Request:
    rid: int
    prompt: list[int]
    max_new_tokens: int
    out: list[int] = dataclasses.field(default_factory=list)
    logprobs: list[float] = dataclasses.field(default_factory=list)
    done: bool = False
    # stop sequences (token-id lists): generation ends when the output
    # tail matches one; the matched tokens are removed from `out`
    stop: list[list[int]] = dataclasses.field(default_factory=list)
    # stop STRINGS, matched on decoded text (BPE is context-dependent, so
    # the same text can arrive under different token ids — token-level
    # stops silently miss those; ADVICE r2). Requires a tokenizer.
    stop_texts: list[str] = dataclasses.field(default_factory=list)
    # incremental stop-string matcher state (ADVICE r3: O(1) decode work
    # per token instead of re-decoding the whole output every token):
    # decoded bytes of `out` so far and each token's decoded byte length.
    # Byte-level matching is exact — both tokenizers decode by pure
    # per-token byte concatenation (tokenizer.decode_bytes).
    _dec_bytes: bytearray = dataclasses.field(
        default_factory=bytearray, repr=False)
    _piece_lens: list[int] = dataclasses.field(
        default_factory=list, repr=False)
    # request-level cancellation (VERDICT r3 item 10)
    cancelled: bool = False


class Engine:
    """Continuous-batching inference engine (host scheduler, device state).

    The decode path IS the fast path (VERDICT r1 #3): weight-fused
    unrolled layers, staged KV appends, and `chunk_size` tokens per
    dispatch (one host round-trip per chunk, one staging flush per
    chunk). Set fuse_weights=False to keep the original per-layer
    projections (e.g. for weight-introspection tests).
    """

    def __init__(self, params, cfg: LlamaConfig, *, max_batch=8,
                 max_seq=2048, quantized_kv=False, eos_id=None,
                 tokenizer=None, temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, min_p: float = 0.0,
                 seed: int = 0, chunk_size: int = 8, fuse_weights=True,
                 logprobs: bool = False,
                 paged: bool = False, page_size: Optional[int] = None,
                 n_pages: Optional[int] = None, prefill_chunk: int = 512,
                 # 4 prefill chunks per step: measured r5 frontier (8B
                 # B=32, 2x1024-token admissions) — TTFT 955/1299 ms at
                 # k=1 vs 457/457 at k=4 with retention FLAT (92->93%):
                 # ~65 ms of W8A8 prefill compute barely dents a ~300 ms
                 # decode chunk, so batching the admission into one step
                 # wins latency for free; cost is a bounded +k*65 ms on
                 # that one step (scripts/bench_ttft_policy.py)
                 prefill_chunks_per_step: int = 4,
                 pipeline_depth: int = 2, spec_k: int = 0,
                 prefix_cache: bool = False, w8a8: bool = True,
                 interleave_prefill: bool = True,
                 max_queue: int = 256):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_batch = max_batch
        self.max_seq = max_seq
        self.quantized = quantized_kv
        self.eos_id = eos_id
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.min_p = min_p
        self.logprobs = logprobs
        if not 1 <= chunk_size <= STAGE_W:
            raise ValueError(f"chunk_size must be in [1, {STAGE_W}]")
        self.chunk_size = chunk_size
        self.params = fuse_decode_weights(params) if fuse_weights else params
        self.paged = paged
        # chunk-dispatch pipelining: keep (depth-1) chunks in flight and
        # collect their tokens one step late, hiding the host round-trip
        # behind device compute. EOS detection lags a chunk, so a
        # finishing slot wastes at most (depth-1) extra chunks of decode
        # (same order as the existing mid-chunk overshoot). The paged
        # path syncs lengths on-host for page allocation, so it stays
        # unpipelined.
        self.pipeline_depth = 1 if paged else max(1, pipeline_depth)
        self._inflight: list[tuple] = []
        # incremental admission (VERDICT r2 item 5): slot -> in-progress
        # chunked-prefill state; at most one prefill chunk dispatches per
        # step() so decode streams keep flowing during long admissions
        self.interleave_prefill = interleave_prefill
        self.prefill_chunks_per_step = max(1, int(prefill_chunks_per_step))
        self._admitting: dict[int, dict] = {}
        self._admit_rr = -1
        if max_queue < 1:
            raise ValueError("max_queue must be >= 1")
        self.max_queue = max_queue
        # paged-only prompt prefix cache: page-aligned token prefix ->
        # page ids (kept alive by a refcount; see _admit_prefix_cached)
        self.prefix_cache = prefix_cache
        if prefix_cache and not paged:
            raise ValueError("prefix_cache requires paged=True")
        self._prefix_cache: dict[tuple, list[int]] = {}
        self._page_refs: dict[int, int] = {}
        self.prefix_hits = 0  # matched tokens served from cache (stats)
        # speculative decoding (greedy only): each chunk step verifies
        # spec_k prompt-lookup drafts in one forward and emits 1..k+1
        # tokens per sequence — exact greedy token streams, fewer weight
        # streams per token
        self.spec_k = spec_k
        # measured acceptance counters (VERDICT r3 item 8): tokens emitted
        # and verify steps per slot — mean tokens/verify = 1 + acceptance
        self.spec_emitted = 0
        self.spec_verify_slots = 0
        if spec_k:
            if paged:
                raise ValueError("spec decoding not supported with paged")
            if logprobs:
                raise ValueError(
                    "logprobs not supported with spec decoding (the "
                    "verify step keeps only accepted-token ids)"
                )
        if paged:
            # paged mode: KV lives in a shared page pool; a slot only
            # holds pages for its live length (+ flush slack), so total
            # pool memory tracks actual load, not max_batch * max_seq
            if page_size is None:
                # auto: ~8 pages per max-length sequence. A fixed 512
                # page over-allocates small-context pools by up to 2x
                # (max_seq=648 rounded to 3x512=1536 rows/slot OOMed
                # HBM at B=64 next to the 7.4 GB int8-8B params)
                page_size = min(512, max(128, -(-max_seq // 8 // 128)
                                         * 128))
            if page_size % 128 != 0:
                raise ValueError("page_size must be a multiple of 128")
            self.page_size = page_size
            slack = STAGE_W + 128  # staged-flush window overhang
            self.max_pages = -(-(max_seq + slack) // page_size) + 1
            self.n_pages = n_pages or max_batch * self.max_pages
            self.state = init_state_paged(
                cfg, max_batch, self.n_pages, page_size, self.max_pages,
                quantized_kv, chunk_size,
            )
            self._free_pages = list(range(self.n_pages))
            self._slot_pages: list[list[int]] = [
                [] for _ in range(max_batch)
            ]
            # host mirror of state.lengths: paged page-growth decisions
            # ran jax.device_get(lengths) EVERY step, which blocks on
            # the previous chunk's output and serializes the pipeline
            # (measured 603 vs 81 ms/step at NL=8 B=32 vs linear).
            # lengths advance deterministically (spec decode is
            # disallowed with paged), so the host tracks them exactly:
            # admission sets L, every dispatched chunk adds chunk_size
            # to slots with length > 0, retire/cancel zero.
            self._host_lens: list[int] = [0] * max_batch
            # device page_table rows are rewritten only when a slot's
            # page list changes (every page_size/chunk_size steps), in
            # one batched eager op before dispatch — not 2 eager ops
            # per live slot per step
            self._dirty_table: set[int] = set()
        else:
            # flush RMWs an aligned (STAGE_W+32)-row window, and inflight
            # chunks can advance a finished slot (depth-1) chunks past
            # max_seq before collection zeroes it: pad the cache for both
            alloc = -(
                -(max_seq + STAGE_W + 32
                  + (self.pipeline_depth - 1) * chunk_size
                  + (spec_k + 1 if spec_k else 0)) // 32
            ) * 32
            self.state = init_state(
                cfg, max_batch, alloc, quantized_kv, chunk=chunk_size
            )
            self._history = (
                jnp.zeros((max_batch, alloc), jnp.int32) if spec_k else None
            )
        self._key = jax.random.key(seed)
        if spec_k:
            self._chunk = jax.jit(
                make_spec_chunk(cfg, quantized_kv, chunk_size, spec_k,
                                temperature, top_k, top_p, min_p),
                donate_argnums=(1, 2),
            )
        else:
            self._chunk = jax.jit(
                make_decode_chunk(cfg, quantized_kv, chunk_size, temperature,
                                  top_k, top_p, min_p, logprobs=logprobs,
                                  paged=paged,
                                  page_size=page_size if paged else 0),
                donate_argnums=(1,),
            )
        self.w8a8 = w8a8
        self._prefill = jax.jit(make_prefill_unrolled(cfg, w8a8=w8a8))
        self.prefill_chunk = prefill_chunk
        self._prefill_chunk_fn = jax.jit(
            make_prefill_chunk_step(cfg, w8a8=w8a8)
        )
        self.slots: list[Optional[Request]] = [None] * max_batch
        self.queue: list[Request] = []
        self._rid = 0

    def _ensure_pages(self, slot: int, tokens_needed: int):
        need = -(-tokens_needed // self.page_size)
        pages = self._slot_pages[slot]
        while len(pages) < need:
            if not self._free_pages:
                self._evict_prefixes(1)
            if not self._free_pages:
                raise RuntimeError(
                    "page pool exhausted — raise n_pages or lower load"
                )
            pid = self._free_pages.pop()
            self._page_refs[pid] = self._page_refs.get(pid, 0) + 1
            pages.append(pid)
        self._dirty_table.add(slot)

    def _flush_page_table(self):
        """Push changed page-table rows to the device in one eager op."""
        if not self._dirty_table:
            return
        slots = sorted(self._dirty_table)
        self._dirty_table.clear()
        rows = np.zeros((len(slots), self.max_pages), np.int32)
        for i, s in enumerate(slots):
            pg = self._slot_pages[s]
            rows[i, : len(pg)] = pg
        self.state.page_table = self.state.page_table.at[
            jnp.asarray(slots, jnp.int32)
        ].set(jnp.asarray(rows))

    def _release_pages(self, slot: int):
        for pid in self._slot_pages[slot]:
            self._page_refs[pid] = self._page_refs.get(pid, 1) - 1
            if self._page_refs[pid] <= 0:
                self._free_pages.append(pid)
        self._slot_pages[slot] = []

    def _evict_prefixes(self, n_needed: int):
        """Drop oldest cached prefixes until n_needed pages are free."""
        for key in list(self._prefix_cache):
            if len(self._free_pages) >= n_needed:
                break
            for pid in self._prefix_cache.pop(key):
                self._page_refs[pid] = self._page_refs.get(pid, 1) - 1
                if self._page_refs[pid] <= 0:
                    self._free_pages.append(pid)

    def warmup(self, prompt_lengths=(512,)):
        """Pre-compile the serving-path programs before taking traffic.

        On this stack first-encounter compiles go through a remote
        tunnel (tens of seconds per program) and would otherwise land
        inside the first requests' latency: the bucketed prefill (one
        program per pow2 bucket), the chunked-admission prefill (one per
        sbuf width), the admit cache writes (one per bucket), and the
        decode chunk itself (measured r4: a cold 1024-token admission
        cost ~25 s of TTFT; warm, the same admission is ~1 s and decode
        retention during it is ~100% — scripts/probe_engine_steps.py).
        Runs one dummy request per requested prompt length plus a decode
        chunk, then resets all device state. Production startup cost,
        not per-request cost."""
        for L in sorted({int(x) for x in prompt_lengths}):
            # max_new_tokens must exceed the chunk size so at least one
            # decode chunk actually dispatches: max_new_tokens=1 retires
            # at admission and would leave the decode-chunk program cold
            # (the most expensive compile of all — code review r4)
            # keep the REQUESTED prefill bucket compiling even near
            # max_seq: shrink the decode allowance (mnt) before the
            # prompt, and never let L collapse to zero (advisor r4)
            L = max(1, min(L, self.max_seq - 2))
            mnt = max(1, min(self.chunk_size + 1, self.max_seq - L))
            self.submit([0] * L, max_new_tokens=mnt)
        while (self.queue or self._admitting or self._inflight
               or any(s is not None for s in self.slots)):
            self.step()
        # drop the dummy prompts from the prefix cache: _insert_prefix
        # published their pages with a cache ref each, which would pin
        # those pages out of the free pool for the server's life
        if self.paged and self._prefix_cache:
            self._evict_prefixes(self.n_pages)  # evicts every cached key
        # reset device state touched by the dummies (slots/lengths are
        # already cleared by completion; staging + history carry junk)
        self.state.lengths = jnp.zeros_like(self.state.lengths)
        if self.paged:
            self._host_lens = [0] * len(self._host_lens)
        if self.state.k_stage is not None:
            self.state.k_stage = jnp.zeros_like(self.state.k_stage)
            self.state.v_stage = jnp.zeros_like(self.state.v_stage)
        if getattr(self, "_history", None) is not None:
            self._history = jnp.zeros_like(self._history)
        if self.paged:
            for slot in range(self.max_batch):
                self._release_pages(slot)
        return self

    def submit(self, prompt: list[int], max_new_tokens: int = 32,
               stop: Optional[list[list[int]]] = None,
               stop_texts: Optional[list[str]] = None) -> Request:
        # validate BEFORE the queue-full check: a terminally-invalid
        # request must get its 400, not a retryable 429 (code review r4)
        if len(prompt) + max_new_tokens > self.max_seq:
            raise ValueError(
                f"prompt ({len(prompt)}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds max_seq {self.max_seq}"
            )
        if stop_texts and self.tokenizer is None:
            raise ValueError("stop_texts requires a tokenizer")
        # queue-depth backpressure (VERDICT r3 item 10): an unbounded
        # queue buffers arbitrarily much prompt data while signalling
        # acceptance — reject loudly instead; the server maps this to 429
        if len(self.queue) >= self.max_queue:
            raise QueueFullError(
                f"engine queue full ({len(self.queue)}/{self.max_queue})"
            )
        req = Request(self._rid, prompt, max_new_tokens,
                      stop=[list(s) for s in (stop or []) if s],
                      stop_texts=[t for t in (stop_texts or []) if t])
        self._rid += 1
        self.queue.append(req)
        return req

    def submit_text(self, text: str, max_new_tokens: int = 32,
                    stop: Optional[list[str]] = None) -> Request:
        if self.tokenizer is None:
            raise ValueError("Engine was built without a tokenizer")
        # stops are matched on DECODED text, not token ids: BPE merges
        # make the same stop text arrive as different token sequences
        # depending on context (ADVICE r2, engine.py:1064)
        return self.submit(self.tokenizer.encode(text), max_new_tokens,
                           stop_texts=stop)

    def decode_text(self, req: Request) -> str:
        if self.tokenizer is None:
            raise ValueError("Engine was built without a tokenizer")
        return self.tokenizer.decode(req.out)

    def cancel(self, req) -> bool:
        """Cancel a request by object or rid (VERDICT r3 item 10).

        Queued requests are dropped before admission; active requests
        free their slot (and pages) immediately — tokens already in
        `req.out` are kept, `req.done`/`req.cancelled` are set. Tokens
        for the slot still in inflight pipelined chunks are discarded by
        `_collect`'s done-check. Returns True if the request was found
        live and cancelled; False if unknown or already finished."""
        if isinstance(req, int):
            rid = req
            req = next(
                (r for r in self.queue if r.rid == rid),
                next((r for r in self.slots
                      if r is not None and r.rid == rid), None),
            )
            if req is None:
                return False
        if req.done:
            return False
        if req in self.queue:
            self.queue.remove(req)
            req.done = req.cancelled = True
            return True
        for slot, r in enumerate(self.slots):
            if r is req:
                req.done = req.cancelled = True
                self.slots[slot] = None
                self._admitting.pop(slot, None)
                self.state.lengths = self.state.lengths.at[slot].set(0)
                if self.paged:
                    self._host_lens[slot] = 0
                    self._release_pages(slot)
                return True
        return False


    # ---- prompt prefix cache (paged mode) ---------------------------------

    def _match_prefix(self, prompt: list[int]):
        """Longest cached page-aligned prefix of `prompt`, leaving >= 32
        tokens to prefill (the staged flush writes 32-aligned windows
        around the live length — a shorter remainder would let the first
        flush RMW into the last SHARED page and corrupt it for other
        holders). Takes a ref on the matched pages."""
        pg = self.page_size
        n_max = ((len(prompt) - 32) // pg) * pg
        for n in range(n_max, 0, -pg):
            key = tuple(prompt[:n])
            pages = self._prefix_cache.get(key)
            if pages is not None:
                for pid in pages:
                    self._page_refs[pid] = self._page_refs.get(pid, 0) + 1
                self.prefix_hits += n
                return n, list(pages)
        return 0, []

    def _insert_prefix(self, prompt: list[int], slot: int):
        """Publish this slot's pages covering a page-aligned, flush-safe
        prefix of `prompt` into the cache (idempotent per key)."""
        pg = self.page_size
        n_ins = ((len(prompt) - 32) // pg) * pg
        if n_ins <= 0:
            return
        key = tuple(prompt[:n_ins])
        if key in self._prefix_cache:
            return
        pages = self._slot_pages[slot][: n_ins // pg]
        for pid in pages:
            self._page_refs[pid] = self._page_refs.get(pid, 0) + 1
        self._prefix_cache[key] = list(pages)

    def _gather_prefix_kv(self, pages: list[int], n: int):
        """Read `n` tokens of K/V back out of pool pages as bf16
        (nl, 1, KH, n, E) buffers for the remainder prefill."""
        ids = jnp.asarray(pages, jnp.int32)

        def gather(pool, scale):
            x = jnp.take(pool, ids, axis=1)  # (nl, npg, KH, pg, E)
            if scale is not None:
                sc = jnp.take(scale, ids, axis=1)  # (nl, npg, KH, pg)
                x = x.astype(jnp.float32) * sc[..., None]
            nl, npg, kh, pg, e = x.shape
            x = x.transpose(0, 2, 1, 3, 4).reshape(nl, kh, npg * pg, e)
            return x[:, None, :, :n].astype(jnp.bfloat16)

        ksc = self.state.k_scale if self.quantized else None
        vsc = self.state.v_scale if self.quantized else None
        return gather(self.state.k, ksc), gather(self.state.v, vsc)

    def _admit_paged(self, slot: int, L: int, ks_l, vs_l, start: int = 0):
        """Write a prefilled prompt's K/V into this slot's pages (rows
        [start, L); rows below `start` live in SHARED prefix pages that
        must not be rewritten)."""
        self._ensure_pages(slot, L + STAGE_W + 128)
        pg = self.page_size
        if self.quantized:
            kq, ksc = _quant_token(ks_l)
            vq, vsc = _quant_token(vs_l)
        else:
            kq, vq = ks_l.astype(self.state.k.dtype), vs_l.astype(
                self.state.v.dtype)
            ksc = vsc = None
        # one donated jitted program writes all live pages (page writes
        # below `start` are shared prefix pages and are skipped via p0);
        # inputs zero-pad to max_pages*pg tokens so the program compiles
        # once per pool shape, not per (L, page count)
        pad = self.max_pages * pg - kq.shape[2]
        kq = jnp.pad(kq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vq = jnp.pad(vq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        pages_arr = jnp.zeros((self.max_pages,), jnp.int32).at[
            : len(self._slot_pages[slot])
        ].set(jnp.asarray(self._slot_pages[slot], jnp.int32))
        p0 = jnp.int32(-(-start // pg))
        n_live = jnp.int32(-(-L // pg))
        if self.quantized:
            ksc = jnp.pad(ksc, ((0, 0), (0, 0), (0, pad)))
            vsc = jnp.pad(vsc, ((0, 0), (0, 0), (0, pad)))
            (self.state.k, self.state.v, self.state.k_scale,
             self.state.v_scale) = _admit_write_pages_q(
                self.state.k, self.state.v, self.state.k_scale,
                self.state.v_scale, kq, vq, ksc, vsc, pages_arr, p0,
                n_live)
        else:
            self.state.k, self.state.v = _admit_write_pages(
                self.state.k, self.state.v, kq, vq, pages_arr, p0,
                n_live)

    def _admit(self):
        """Assign queued requests to free slots and advance admission.

        Long prompts admit INCREMENTALLY (VERDICT r2 item 5): their
        chunked prefill is split across engine steps — at most ONE
        `prefill_chunk`-token prefill dispatch per step(), round-robin
        over admitting slots — so active decode streams keep producing
        tokens while a long prompt admits instead of stalling for the
        whole prompt. Short prompts and prefix-cache remainders admit in
        one step (bounded latency already). `interleave_prefill=False`
        restores the round-2 drain-everything behavior."""
        for slot in range(self.max_batch):
            if self.slots[slot] is not None or not self.queue:
                continue
            req = self.queue.pop(0)
            self.slots[slot] = req
            L = len(req.prompt)
            n_match = 0
            if self.prefix_cache:
                n_match, shared = self._match_prefix(req.prompt)
            if not n_match and L > self.prefill_chunk:
                C = self.prefill_chunk
                n_chunks = -(-L // C)
                nl, kh, e = (
                    self.cfg.n_layers, self.cfg.n_kv_heads, self.cfg.head_dim
                )
                sbuf = n_chunks * C
                self._admitting[slot] = {
                    "req": req,
                    "ks": jnp.zeros((nl, 1, kh, sbuf, e), jnp.bfloat16),
                    "vs": jnp.zeros((nl, 1, kh, sbuf, e), jnp.bfloat16),
                    "ci": 0,
                    "n_chunks": n_chunks,
                    "L": L,
                    "logits": None,
                }
                continue
            self._admit_one(slot, req, L, n_match,
                            shared if n_match else None)
        # advance incremental admissions: `prefill_chunks_per_step`
        # prefill chunks per step when interleaving (decode streams run
        # between chunks; the knob trades decode retention for TTFT —
        # VERDICT r4 item 5), else drain
        burst = 0
        while self._admitting:
            order = sorted(self._admitting)
            pick = next(
                (s for s in order if s > self._admit_rr), order[0]
            )
            self._admit_rr = pick
            st = self._admitting[pick]
            C = self.prefill_chunk
            ci = st["ci"]
            chunk = st["req"].prompt[ci * C : (ci + 1) * C]
            chunk = chunk + [0] * (C - len(chunk))
            st["logits"], st["ks"], st["vs"] = self._prefill_chunk_fn(
                self.params,
                jnp.asarray([chunk], jnp.int32),
                st["ks"], st["vs"],
                jnp.int32(ci * C),
            )
            st["ci"] += 1
            if st["ci"] == st["n_chunks"]:
                del self._admitting[pick]
                L = st["L"]
                logits = st["logits"][
                    :, (L - 1) - (st["n_chunks"] - 1) * C
                ]
                self._finalize_admit(
                    pick, st["req"], logits, st["ks"], st["vs"], L, 0
                )
            if self.interleave_prefill:
                burst += 1
                if burst >= self.prefill_chunks_per_step:
                    break

    def _admit_one(self, slot, req, L, n_match, shared):
        """Single-step admission: prefix-cache remainder or short-prompt
        bucket prefill, then finalize."""
        if n_match:
            # prefix hit: seed the slot with the shared pages, read
            # their K/V back as the prefill context, and compute only
            # the REMAINDER through the offset-aware chunked prefill
            self._slot_pages[slot] = shared
            self._dirty_table.add(slot)  # row must reflect adopted pages
            pk, pv = self._gather_prefix_kv(shared, n_match)
            remainder = req.prompt[n_match:]
            C = self.prefill_chunk
            rem_chunks = -(-len(remainder) // C)
            nl, kh, e = (
                self.cfg.n_layers, self.cfg.n_kv_heads,
                self.cfg.head_dim,
            )
            sbuf = n_match + rem_chunks * C
            ks = jnp.zeros((nl, 1, kh, sbuf, e), jnp.bfloat16)
            vs = jnp.zeros((nl, 1, kh, sbuf, e), jnp.bfloat16)
            ks = ks.at[:, :, :, :n_match].set(pk)
            vs = vs.at[:, :, :, :n_match].set(pv)
            logits_c = None
            for ci in range(rem_chunks):
                chunk = remainder[ci * C : (ci + 1) * C]
                chunk = chunk + [0] * (C - len(chunk))
                logits_c, ks, vs = self._prefill_chunk_fn(
                    self.params,
                    jnp.asarray([chunk], jnp.int32),
                    ks, vs,
                    jnp.int32(n_match + ci * C),
                )
            logits = logits_c[
                :, (len(remainder) - 1) - (rem_chunks - 1) * C
            ]
            self._admit_paged(
                slot, L, ks[:, 0, :, :L], vs[:, 0, :, :L],
                start=n_match,
            )
            ks = vs = None  # K/V already written into pages
        else:
            # pad prompts to a bucket so prefill compiles once per
            # bucket, not once per prompt length
            bucket = max(64, 1 << (L - 1).bit_length())
            padded = req.prompt + [0] * (bucket - L)
            tokens = jnp.asarray([padded], jnp.int32)
            logits_seq, ks, vs = self._prefill(self.params, tokens)
            logits = logits_seq[:, L - 1]
        self._finalize_admit(slot, req, logits, ks, vs, L, n_match)

    def _finalize_admit(self, slot, req, logits, ks, vs, L, n_match):
        """Write prefilled K/V into device state, sample + record the
        first token, and activate (or immediately retire) the slot."""
        if not n_match:
            if self.paged:
                self._admit_paged(slot, L, ks[:, 0, :, :L], vs[:, 0, :, :L])
            else:
                # keep the bucket padding: rows beyond L are invisible
                # (decode masks by lengths, appends overwrite them), and
                # a bucket-width write keeps ONE jitted program per
                # bucket instead of one per prompt length
                S = self.state.k.shape[3]
                W = min(ks.shape[3], S)
                ks_l = ks[:, 0, :, :W]
                vs_l = vs[:, 0, :, :W]
                slot_i = jnp.int32(slot)
                if self.quantized:
                    (self.state.k, self.state.v, self.state.k_scale,
                     self.state.v_scale) = _admit_write_q(
                        self.state.k, self.state.v, self.state.k_scale,
                        self.state.v_scale, ks_l, vs_l, slot_i)
                else:
                    self.state.k, self.state.v = _admit_write(
                        self.state.k, self.state.v, ks_l, vs_l, slot_i)
        self.state.lengths = self.state.lengths.at[slot].set(L)
        if self.paged:
            self._host_lens[slot] = L
        if self.prefix_cache:
            self._insert_prefix(req.prompt, slot)
        if self.spec_k:
            # drafting history: prompt tokens at positions [0, L)
            self._history = self._history.at[slot, :L].set(
                jnp.asarray(req.prompt, jnp.int32)
            )
        # sample the prefill token with the same settings as decode
        # (and EOS-check it) — not unconditional argmax
        self._key, sub = jax.random.split(self._key)
        first = int(
            sample_tokens(logits, sub, self.temperature, self.top_k,
                          self.top_p, self.min_p)[0]
        )
        self.state.last_token = self.state.last_token.at[slot].set(first)
        req.out.append(first)
        if self.logprobs:
            lp0 = jax.nn.log_softmax(logits[0])[first]
            req.logprobs.append(float(lp0))
        # stop-sequence check FIRST so a final token that completes a stop
        # gets stripped consistently (ADVICE r2)
        if (
            self._hit_stop(req)
            or (self.eos_id is not None and first == self.eos_id)
            or req.max_new_tokens <= 1
        ):
            req.done = True
            self.slots[slot] = None
            self.state.lengths = self.state.lengths.at[slot].set(0)
            # release the slot's page refs like _collect/cancel do: the
            # next occupant must not adopt stale pages (overwriting a
            # published shared prefix) or leak them (code review r4)
            if self.paged:
                self._host_lens[slot] = 0
                self._release_pages(slot)

    def step(self):
        """Admit pending requests, dispatch one decode CHUNK (chunk_size
        batched steps in a single dispatch), and collect tokens from the
        oldest inflight chunk once the pipeline is full (or on drain)."""
        self._admit()
        live = {
            s: r for s, r in enumerate(self.slots)
            if r is not None and s not in self._admitting
        }
        dispatched = False
        lps = None
        if live:
            if self.paged:
                # host-tracked lengths: no device_get (it would sync on
                # the previous chunk and serialize the pipeline)
                for slot in live:
                    self._ensure_pages(
                        slot,
                        self._host_lens[slot] + self.chunk_size
                        + STAGE_W + 128,
                    )
                self._flush_page_table()
            self._key, step_key = jax.random.split(self._key)
            if self.spec_k:
                toks, counts, self.state, self._history = self._chunk(
                    self.params, self.state, self._history, step_key
                )
            else:
                if self.logprobs:
                    toks, lps, self.state = self._chunk(
                        self.params, self.state, step_key
                    )
                else:
                    toks, self.state = self._chunk(
                        self.params, self.state, step_key
                    )
                    lps = None
                counts = None
            # snapshot slot->request at dispatch time: collection must
            # not attribute this chunk's tokens to a request admitted
            # into a recycled slot later
            self._inflight.append(
                (toks, counts, live, lps if not self.spec_k and
                 self.logprobs else None)
            )
            if self.paged:
                # mirror the chunk program's device-side advance:
                # lengths += chunk for every slot with lengths > 0
                self._host_lens = [
                    hl + self.chunk_size if hl > 0 else 0
                    for hl in self._host_lens
                ]
            dispatched = True
        keep = self.pipeline_depth - 1 if dispatched else 0
        while len(self._inflight) > keep:
            self._collect(*self._inflight.pop(0))
        return dispatched or bool(self._inflight)

    @staticmethod
    def _trim_decode_state(req):
        """Drop cached decode state for tokens no longer in req.out."""
        while len(req._piece_lens) > len(req.out):
            del req._dec_bytes[len(req._dec_bytes) - req._piece_lens.pop():]

    def _hit_stop(self, req) -> bool:
        """True if req.out now ends with one of its stop sequences (token
        ids) or its decoded text contains one of its stop strings; the
        matched tokens/text are removed from the output (and logprobs).

        Stop strings are matched INCREMENTALLY on decoded bytes: only the
        newly-landed tokens are decoded (cached per request), and only
        the tail a new match could occupy is searched — O(1) amortized
        per token instead of re-decoding the full output every token
        (ADVICE r3). Byte-level search is exact for UTF-8 (the encoding
        is self-synchronizing; both tokenizers decode concatenatively)."""
        for seq in req.stop:
            n = len(seq)
            if len(req.out) >= n and req.out[-n:] == seq:
                del req.out[-n:]
                del req.logprobs[len(req.out):]
                self._trim_decode_state(req)
                return True
        if req.stop_texts and self.tokenizer is not None:
            decode_bytes = getattr(self.tokenizer, "decode_bytes", None)
            if decode_bytes is None:
                # third-party tokenizer without the concatenative-bytes
                # contract: full re-decode (exactness over speed)
                return self._hit_stop_full_redecode(req)
            stop_bytes = [t.encode("utf-8") for t in req.stop_texts]
            max_stop = max(len(b) for b in stop_bytes)
            added = 0
            for tok in req.out[len(req._piece_lens):]:
                piece = decode_bytes([tok])
                req._dec_bytes.extend(piece)
                req._piece_lens.append(len(piece))
                added += len(piece)
            start = max(0, len(req._dec_bytes) - added - max_stop + 1)
            best = min(
                (p for p in (req._dec_bytes.find(b, start)
                             for b in stop_bytes) if p >= 0),
                default=-1,
            )
            if best >= 0:
                # strip tokens until the decoded bytes no longer reach
                # the stop match (a token spanning the boundary is
                # removed whole — decoded output never includes any part
                # of the stop string)
                while req.out and len(req._dec_bytes) > best:
                    req.out.pop()
                    self._trim_decode_state(req)
                del req.logprobs[len(req.out):]
                return True
        return False

    def _hit_stop_full_redecode(self, req) -> bool:
        text = self.tokenizer.decode(req.out)
        best = min(
            (p for p in (text.find(t) for t in req.stop_texts) if p >= 0),
            default=-1,
        )
        if best < 0:
            return False
        while req.out and len(self.tokenizer.decode(req.out)) > best:
            req.out.pop()
        del req.logprobs[len(req.out):]
        return True

    def _collect(self, toks_dev, counts_dev, live, lps_dev=None):
        toks = jax.device_get(toks_dev)  # (chunk, B) or (steps, B, T)
        counts = (
            jax.device_get(counts_dev) if counts_dev is not None else None
        )
        lps = jax.device_get(lps_dev) if lps_dev is not None else None
        for slot, req in live.items():
            if req.done:
                # finished in an earlier chunk while this one was already
                # in flight; its tokens for the slot are surplus
                continue
            if counts is None:
                slot_toks = [int(toks[t, slot]) for t in range(toks.shape[0])]
                slot_lps = (
                    [float(lps[t, slot]) for t in range(toks.shape[0])]
                    if lps is not None else [None] * len(slot_toks)
                )
            else:
                # (token, verify-step index) pairs: the acceptance
                # counters below must only meter steps/tokens actually
                # consumed — a request finishing mid-chunk keeps
                # decoding to chunk end, but those surplus verify steps
                # and discarded tokens would skew tokens-per-verify
                # (code review r4; the counters feed
                # scripts/bench_spec_acceptance.py)
                slot_pairs = [
                    (int(toks[t, slot, j]), t)
                    for t in range(toks.shape[0])
                    for j in range(int(counts[t, slot]))
                ]
                slot_toks = [p[0] for p in slot_pairs]
                slot_lps = [None] * len(slot_toks)
            n_consumed = 0
            out_len_before = len(req.out)
            for tok, lp in zip(slot_toks, slot_lps):
                req.out.append(tok)
                n_consumed += 1
                if lp is not None:
                    req.logprobs.append(lp)
                full = len(req.prompt) + len(req.out) >= self.max_seq
                # stop check FIRST (unconditionally): a final allowed
                # token (or EOS) that also completes a stop sequence must
                # still be stripped from req.out (ADVICE r2)
                stopped = self._hit_stop(req)
                if (
                    stopped
                    or len(req.out) >= req.max_new_tokens
                    or (self.eos_id is not None and tok == self.eos_id)
                    or full
                ):
                    # mid-chunk finish: the slot kept decoding to chunk
                    # end (bounded waste); surplus tokens are discarded
                    req.done = True
                    if self.slots[slot] is req:
                        self.slots[slot] = None
                    self.state.lengths = self.state.lengths.at[slot].set(0)
                    if self.paged:
                        self._host_lens[slot] = 0
                        self._release_pages(slot)
                    break
            if counts is not None:
                # emitted = tokens that actually SURVIVE in req.out from
                # this chunk (stop-text stripping may have popped some
                # after they were appended — advisor r4)
                self.spec_emitted += len(req.out) - out_len_before
                # verify steps metered: up to the finishing step when the
                # request finished mid-chunk (later steps are surplus);
                # ALL executed steps otherwise — trailing zero-count
                # steps, if ever reachable, must not inflate acceptance
                # (advisor r4)
                if req.done and n_consumed:
                    self.spec_verify_slots += slot_pairs[n_consumed - 1][1] + 1
                else:
                    self.spec_verify_slots += toks.shape[0]

    def run(self, max_steps: int = 10_000):
        steps = 0
        while (
            self.queue
            or any(s is not None for s in self.slots)
            or self._inflight
            or self._admitting
        ) and steps < max_steps:
            self.step()
            steps += 1
