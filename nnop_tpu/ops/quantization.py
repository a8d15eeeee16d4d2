"""Quantization primitives: symmetric INT8 / FP8 with per-channel scales.

North-star scope (BASELINE.json: "weight-only INT8/FP8 variants and an
INT8 KV-cache") — no reference counterpart (SURVEY.md §5 "Also absent ...
quantization"). Plain XLA here; the *dequantization* is what gets fused
into Pallas matmul/attention tiles (quantized_matmul.py,
attention_decode.py), because quantize runs once (weights) or streaming
(KV append) while dequant sits on the hot path.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

INT8_MAX = 127.0
FP8_MAX = 448.0  # float8_e4m3fn


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor:
    """values: int8/fp8 array; scale: fp32, shape = values with `axis`
    removed. `axis` is static pytree metadata, so QTensors stack/scan/vmap
    like plain arrays (needed to stack per-layer quantized weights for the
    engine's lax.scan decode)."""

    values: jax.Array
    scale: jax.Array
    axis: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype


def quantize(x: jax.Array, *, axis: int = -1, dtype=jnp.int8) -> QTensor:
    """Symmetric per-channel quantization along `axis`."""
    axis = axis % x.ndim
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    qmax = INT8_MAX if dtype == jnp.int8 else FP8_MAX
    scale = jnp.maximum(amax, 1e-8) / qmax
    scaled = x.astype(jnp.float32) / scale
    if dtype == jnp.int8:
        values = jnp.clip(jnp.round(scaled), -INT8_MAX, INT8_MAX).astype(jnp.int8)
    else:
        values = scaled.astype(dtype)
    return QTensor(values, jnp.squeeze(scale, axis).astype(jnp.float32), axis)


def dequantize(q: QTensor) -> jax.Array:
    scale = jnp.expand_dims(q.scale, q.axis)
    return q.values.astype(jnp.float32) * scale


# ---------------------------------------------------------------------------
# INT4 weight-only quantization (packed nibbles, group-wise scales)
#
# Decode is HBM-bound on the weight stream; int4 halves it again vs int8.
# Layout is chosen for cheap in-kernel unpack on the VPU:
#
#   * K is split into `pack_block`-row blocks; within each block, row k of
#     the packed byte holds the LOW nibble of original row k and the HIGH
#     nibble of original row k + pack_block/2. Unpacking a (P/2, N) byte
#     tile is then two int32 shifts + one sublane-axis concat — no
#     interleave (sublane shuffles are expensive on TPU).
#   * Scales are per (K-group, out-channel): shape (K/group, N). `group`
#     must divide pack_block/2 so no group straddles the half boundary.
#     The matmul applies each group's scale to that group's fp32 partial
#     product (O(M*N) per group), never materializing dequantized weights.

INT4_MAX = 7.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor4:
    """packed: int8 (K/2, N) nibble pairs; scale: fp32 (K/group, N).

    `group` and `pack_block` are static pytree metadata so QTensor4 trees
    stack/concat/jit like plain arrays.
    """

    packed: jax.Array
    scale: jax.Array
    group: int = dataclasses.field(metadata=dict(static=True))
    pack_block: int = dataclasses.field(metadata=dict(static=True))

    @property
    def k_dim(self) -> int:
        return 2 * self.packed.shape[0]

    @property
    def shape(self):
        return (self.k_dim, self.packed.shape[1])


def _pick_pack_block(k: int, requested: int) -> int:
    for p in (requested, 1024, 512, 256):
        if p <= requested and k % p == 0:
            return p
    return 256  # caller pads K to a multiple of this


def quantize4(w: jax.Array, *, group: int = 128,
              pack_block: int = 1024) -> QTensor4:
    """Symmetric int4 quantization of a (K, N) weight, scales per
    (group-of-K-rows, N). K is zero-padded to a multiple of the chosen
    pack block (padded groups get scale 1, harmless zeros)."""
    if w.ndim != 2:
        raise ValueError(f"quantize4 expects (K, N) weights, got {w.shape}")
    K, N = w.shape
    p = _pick_pack_block(K, pack_block)
    kp = -K % p
    if kp:
        w = jnp.pad(w.astype(jnp.float32), ((0, kp), (0, 0)))
        K += kp
    if group > p // 2 or (p // 2) % group != 0:
        raise ValueError(f"group {group} must divide pack_block/2 {p//2}")
    wf = w.astype(jnp.float32)
    amax = jnp.max(
        jnp.abs(wf.reshape(K // group, group, N)), axis=1
    )  # (K/group, N)
    scale = jnp.maximum(amax, 1e-8) / INT4_MAX
    q = jnp.clip(
        jnp.round(wf / jnp.repeat(scale, group, axis=0)), -INT4_MAX, INT4_MAX
    ).astype(jnp.int32)
    blocks = q.reshape(K // p, p, N)
    lo = blocks[:, : p // 2]
    hi = blocks[:, p // 2 :]
    byte = (lo & 0xF) | ((hi & 0xF) << 4)  # [0, 255]
    # int32->int8 of out-of-range values is platform-defined; recentre first
    packed = jnp.where(byte >= 128, byte - 256, byte).astype(jnp.int8)
    packed = packed.reshape(K // 2, N)
    return QTensor4(packed, scale.astype(jnp.float32), group, p)


def dequantize4(q: QTensor4) -> jax.Array:
    """Reference unpack (tests / naive paths): (K, N) float32."""
    p = q.pack_block
    kh = q.packed.shape[0]
    n = q.packed.shape[1]
    b = q.packed.astype(jnp.int32).reshape(kh // (p // 2), p // 2, n)
    lo = (b << 28) >> 28
    hi = b >> 4
    vals = jnp.concatenate([lo, hi], axis=1).reshape(2 * kh, n)
    return vals.astype(jnp.float32) * jnp.repeat(q.scale, q.group, axis=0)
