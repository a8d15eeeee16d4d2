"""Fused Llama rotary embedding (Pallas TPU) with custom VJP.

Re-derivation of /root/reference/src/rope/llama_rope.jl: the host-side
`RotaryEmbedding` precomputes inv_freq = base^(-2i/dim) and builds
cos/sin[B, L, dim] with duplicated halves (llama_rope.jl:7-22,
`vcat(freqs, freqs)`); the kernel rotates q AND k in one launch
(llama_rope.jl:85-88, grid guarded per head count at :48,:55); the backward
is the same kernel with the sine negated — rotation inverse
(llama_rope.jl:87,92) — wired here through `jax.custom_vjp` instead of the
reference's ChainRules rrule (llama_rope.jl:94-98).

Split-half convention (x1 = x[i], x2 = x[i+half], llama_rope.jl:49-61):
  out[i]      = x1·cos − x2·sin
  out[i+half] = x2·cos + x1·sin
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import cdiv, interpret_default, norm_impl, round_up


class RotaryEmbedding:
    """Precomputes rotary cos/sin tables from position ids.

    Equivalent of /root/reference/src/rope/llama_rope.jl:7-22
    `LlamaRotaryEmbedding`.
    """

    def __init__(self, dim: int, base: float = 10000.0, scaling=None):
        """scaling: optional Llama-3.1 NTK-by-parts rope scaling, a tuple
        (factor, low_freq_factor, high_freq_factor, original_max_len):
        long-wavelength frequencies are divided by `factor`, short ones
        kept, with a smooth ramp between the two wavelength thresholds
        original_max_len/low_freq_factor and /high_freq_factor."""
        if dim % 2 != 0:
            raise ValueError(f"rotary dim must be even, got {dim}")
        self.dim = dim
        self.base = base
        inv_freq = base ** (
            -jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
        )
        if scaling is not None:
            factor, low_f, high_f, orig_len = scaling
            wavelen = 2.0 * jnp.pi / inv_freq
            low_wavelen = orig_len / low_f
            high_wavelen = orig_len / high_f
            smooth = (orig_len / wavelen - low_f) / (high_f - low_f)
            smooth = jnp.clip(smooth, 0.0, 1.0)
            scaled = (1.0 - smooth) * inv_freq / factor + smooth * inv_freq
            inv_freq = jnp.where(wavelen > low_wavelen, inv_freq / factor,
                                 jnp.where(wavelen < high_wavelen, inv_freq,
                                           scaled))
        self.inv_freq = inv_freq

    def __call__(self, position_ids: jax.Array):
        """position_ids: (B, L) int → cos, sin: (B, L, dim) float32."""
        freqs = (
            position_ids[..., None].astype(jnp.float32)
            * self.inv_freq[None, None, :]
        )
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        return jnp.cos(emb), jnp.sin(emb)


def _rope_kernel(q_ref, k_ref, cos_ref, sin_ref, qo_ref, ko_ref, *, sin_sign):
    # blocks carry ALL heads: (1, H, bl, E); cos/sin (1, bl, E) broadcast
    # over the head axis
    cos = cos_ref[0][None]
    sin = sin_sign * sin_ref[0][None]
    half = q_ref.shape[-1] // 2

    def rotate(x):
        x = x.astype(jnp.float32)
        x1, x2 = x[..., :half], x[..., half:]
        return jnp.concatenate(
            [x1 * cos[..., :half] - x2 * sin[..., :half],
             x2 * cos[..., half:] + x1 * sin[..., half:]],
            axis=-1,
        )

    qo_ref[0] = rotate(q_ref[0]).astype(qo_ref.dtype)
    ko_ref[0] = rotate(k_ref[0]).astype(ko_ref.dtype)


def _rope_impl(q, k, cos, sin, sin_sign: float):
    B, QH, L, E = q.shape
    KH = k.shape[1]
    bl = min(round_up(L, 8), 512)
    nl = cdiv(L, bl)
    kernel = functools.partial(_rope_kernel, sin_sign=sin_sign)
    # One grid step per (batch, seq-block); blocks span all heads (the
    # reference rotates q AND k in one launch with per-head grid guards,
    # llama_rope.jl:48,55 — here the head axis rides inside the block, so
    # the grid is B*nl steps total and q/k head counts need no guards).
    return pl.pallas_call(
        kernel,
        grid=(B, nl),
        in_specs=[
            pl.BlockSpec((1, QH, bl, E), lambda b, l: (b, 0, l, 0)),
            pl.BlockSpec((1, KH, bl, E), lambda b, l: (b, 0, l, 0)),
            pl.BlockSpec((1, bl, E), lambda b, l: (b, l, 0)),
            pl.BlockSpec((1, bl, E), lambda b, l: (b, l, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, QH, bl, E), lambda b, l: (b, 0, l, 0)),
            pl.BlockSpec((1, KH, bl, E), lambda b, l: (b, 0, l, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(q, k, cos, sin)


@jax.custom_vjp
def _llama_rope_pallas(q, k, cos, sin):
    return _rope_impl(q, k, cos, sin, 1.0)


def _vjp_fwd(q, k, cos, sin):
    return _rope_impl(q, k, cos, sin, 1.0), (cos, sin)


def _vjp_bwd(res, dout):
    cos, sin = res
    dq, dk = dout
    dq_in, dk_in = _rope_impl(dq, dk, cos, sin, -1.0)
    return dq_in, dk_in, None, None


_llama_rope_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def llama_rope(q, k, cos, sin):
    """Apply rotary embedding to q (B, QH, L, E) and k (B, KH, L, E) in one
    fused launch. cos/sin: (B, L, E) from `RotaryEmbedding`.

    Equivalent of /root/reference/src/rope/llama_rope.jl:91 `llama_rope`.
    Implementation dispatch as in rms_norm (platform.norm_impl); the XLA
    formulation differentiates through JAX AD (rotation inverse =
    negated sine falls out of the arithmetic).
    """
    if norm_impl() == "xla":
        c = cos[:, None, :, :].astype(jnp.float32)
        s = sin[:, None, :, :].astype(jnp.float32)

        def rot(x):
            half = x.shape[-1] // 2
            x1, x2 = x[..., :half], x[..., half:]
            r = jnp.concatenate([-x2, x1], axis=-1)
            return (x.astype(jnp.float32) * c + r.astype(jnp.float32) * s)

        return rot(q).astype(q.dtype), rot(k).astype(k.dtype)
    return _llama_rope_pallas(q, k, cos, sin)
