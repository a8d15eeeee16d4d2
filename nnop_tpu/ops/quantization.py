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
