"""Naive XLA reference implementations (test oracles + fallbacks).

These mirror the reference's array-level oracles in
/root/reference/test/attention_testsetup.jl:10-45 (naive_softmax,
naive_attention with GQA head-expansion, causal masking, additive log pad
mask, pair bias) and the pure-broadcast definitions the norm/rope tests
compare against. They are also what `bench.py` times as the "naive"
baseline, mirroring benchmarks/main.jl's naive-vs-fused methodology.

Layouts are TPU-native row-major:
  q: (B, QH, QL, E)   k, v: (B, KH, KL, E)   pair: (B, QH, QL, KL)
  kpad_mask: (B, KL) bool, True = valid key position
(The reference is column-major (E, L, H, B) / (H, QL, KL, B) — same logical
axes, reversed storage order.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def naive_softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def naive_rms_norm(x, w, *, eps: float = 1e-6, offset: float = 0.0):
    """RMS norm over the last axis, fp32 accumulation.

    Mirrors /root/reference/src/rms_norm.jl:3-38 (fp32 accumulation at :21,
    Gemma-style `offset` at :117).
    """
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(ms + eps)
    y = xf * rstd * (offset + w.astype(jnp.float32))
    return y.astype(x.dtype)


def naive_layer_norm(x, w, b, *, eps: float = 1e-6):
    """Layer norm over the last axis, fp32 accumulation.

    Mirrors /root/reference/src/layer_norm.jl:8-63.
    """
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    sigma = jax.lax.rsqrt(var + eps)
    y = (xf - mu) * sigma * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y.astype(x.dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def naive_rope(q, k, cos, sin):
    """Llama rotary embedding on q and k.

    q: (B, H, L, E), cos/sin: (B, L, E) (duplicated halves, as built by
    RotaryEmbedding — mirrors /root/reference/src/rope/llama_rope.jl:15-22
    `vcat(freqs, freqs)`). Split-half convention x1=x[i], x2=x[i+half]
    (llama_rope.jl:49-61).
    """
    c = cos[:, None, :, :].astype(jnp.float32)
    s = sin[:, None, :, :].astype(jnp.float32)
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = qf * c + rotate_half(qf) * s
    k_out = kf * c + rotate_half(kf) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


def naive_attention(
    q,
    k,
    v,
    pair=None,
    *,
    causal: bool = False,
    kpad_mask=None,
    segment_ids=None,
    scale: float | None = None,
    window: int | None = None,
    softcap: float | None = None,
):
    """Reference attention, mirroring test/attention_testsetup.jl:10-45.

    GQA via head-repeat (Einops repeat equivalent), causal mask by absolute
    position q_pos >= k_pos (attention.jl:67-72), pad mask additive -inf
    (attention.jl:73-79), pair bias added to scores (attention.jl:59-64).
    `window` (with causal) restricts each query to the last `window` keys:
    q_pos - k_pos < window (Mistral sliding-window convention, self
    included) — a north-star extension, no reference counterpart.
    """
    B, QH, QL, E = q.shape
    _, KH, KL, _ = k.shape
    if QH % KH != 0:
        raise ValueError(f"q heads {QH} not a multiple of kv heads {KH}")
    if scale is None:
        scale = 1.0 / (E**0.5)
    rep = QH // KH
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum(
        "bhqe,bhke->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if softcap is not None:
        # Gemma-2 logit softcapping, applied pre-mask/bias
        s = softcap * jnp.tanh(s / softcap)
    if pair is not None:
        s = s + pair.astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    if causal:
        qi = jnp.arange(QL)[:, None]
        ki = jnp.arange(KL)[None, :]
        s = jnp.where(qi >= ki, s, neg)
        if window is not None:
            s = jnp.where(qi - ki < window, s, neg)
    if kpad_mask is not None:
        s = jnp.where(kpad_mask[:, None, None, :], s, neg)
    if segment_ids is not None:
        q_seg, kv_seg = segment_ids
        same = q_seg[:, None, :, None] == kv_seg[:, None, None, :]
        s = jnp.where(same, s, neg)
    p = naive_softmax(s, axis=-1)
    o = jnp.einsum(
        "bhqk,bhke->bhqe", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return o.astype(q.dtype)
