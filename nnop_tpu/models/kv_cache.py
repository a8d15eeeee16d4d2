"""KV cache: bf16/f32 or INT8 with per-(batch, head, position) scales.

North-star scope (BASELINE.json: "INT8 KV-cache with dequant fused into
the attention inner loop") — no reference counterpart (SURVEY.md §5).
Functional ring-less append-only cache: fixed max_len buffers, a scalar
`length` cursor, and a kpad mask derived from the cursor so the flash /
decode kernels see only valid positions. Quantization of appended K/V is
per-token-per-head symmetric int8 (scale shape (B, KH, max_len)), chosen
so decode-time dequant is a rank-1 scale broadcast the kernel can fuse.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


class KVCache(NamedTuple):
    k: jax.Array  # (B, KH, S, E) storage dtype (bf16/f32 or int8)
    v: jax.Array
    k_scale: Optional[jax.Array]  # (B, KH, S) fp32 for int8 storage
    v_scale: Optional[jax.Array]
    length: jax.Array  # scalar int32: valid prefix length (uniform batch)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def init(batch, n_kv_heads, max_len, head_dim, dtype=jnp.bfloat16,
             quantized: bool = False):
        shape = (batch, n_kv_heads, max_len, head_dim)
        if quantized:
            return KVCache(
                k=jnp.zeros(shape, jnp.int8),
                v=jnp.zeros(shape, jnp.int8),
                k_scale=jnp.zeros(shape[:3], jnp.float32),
                v_scale=jnp.zeros(shape[:3], jnp.float32),
                length=jnp.zeros((), jnp.int32),
            )
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            k_scale=None,
            v_scale=None,
            length=jnp.zeros((), jnp.int32),
        )

    def append(self, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Append (B, KH, L_new, E) at the cursor. L_new is static.

        Overflow guard: XLA clamps a dynamic_update_slice start index, so
        an over-capacity append would silently overwrite the cache tail
        with misaligned data. A static check catches the always-overflows
        case; the dynamic cursor is checked with jax.debug (checkify-free
        so append stays usable under plain jit/scan).
        """
        if k_new.shape[2] > self.max_len:
            raise ValueError(
                f"appending {k_new.shape[2]} tokens to a {self.max_len}-slot "
                f"cache can never fit"
            )

        overflow = self.length + k_new.shape[2] > self.max_len
        jax.lax.cond(
            overflow,
            lambda: jax.debug.print(
                "KVCache overflow: length {} + {} > capacity {} "
                "(tail will be overwritten)",
                self.length, k_new.shape[2], self.max_len,
            ),
            lambda: None,
        )

        def put(buf, new):
            return jax.lax.dynamic_update_slice(
                buf, new.astype(buf.dtype), (0, 0, self.length, 0)
            )

        if self.quantized:
            def quant(x):
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
                scale = jnp.maximum(amax, 1e-8) / INT8_MAX
                q = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / scale[..., None]),
                    -INT8_MAX,
                    INT8_MAX,
                ).astype(jnp.int8)
                return q, scale

            kq, ks = quant(k_new)
            vq, vs = quant(v_new)
            return self._replace(
                k=put(self.k, kq),
                v=put(self.v, vq),
                k_scale=jax.lax.dynamic_update_slice(
                    self.k_scale, ks, (0, 0, self.length)
                ),
                v_scale=jax.lax.dynamic_update_slice(
                    self.v_scale, vs, (0, 0, self.length)
                ),
                length=self.length + k_new.shape[2],
            )
        return self._replace(
            k=put(self.k, k_new),
            v=put(self.v, v_new),
            length=self.length + k_new.shape[2],
        )

    def valid_mask(self) -> jax.Array:
        """(B, S) bool: True where the cache holds real tokens."""
        B = self.k.shape[0]
        pos = jnp.arange(self.max_len, dtype=jnp.int32)[None, :]
        return jnp.broadcast_to(pos < self.length, (B, self.max_len))

    def dequant_kv(self):
        """Materialize fp K/V (slow path / oracle; the decode kernel fuses
        dequant in-loop instead — ops/attention_decode.py)."""
        if not self.quantized:
            return self.k, self.v
        k = self.k.astype(jnp.float32) * self.k_scale[..., None]
        v = self.v.astype(jnp.float32) * self.v_scale[..., None]
        return k, v
