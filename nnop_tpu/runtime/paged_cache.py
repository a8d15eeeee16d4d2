"""Paged KV cache: host-side page allocator + device-side pool writes.

Pairs with ops/attention_decode_paged.py. The pool is a fixed arena of
(n_pages, KH, page_size, E) blocks shared by all sequences; a host free
list hands out page ids, so total KV memory scales with ACTIVE tokens, not
max_batch * max_seq (the memory win of paged attention vs slot-contiguous
caches). Token appends are device-side dynamic_update_slice into the pool
at (page_id, :, offset); page ids are picked on host.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

INT8_MAX = 127.0


@dataclasses.dataclass
class PagedKVCache:
    pool_k: jax.Array   # (n_pages, KH, page, E) fp or int8
    pool_v: jax.Array
    pool_k_scale: Optional[jax.Array]  # (n_pages, KH, page)
    pool_v_scale: Optional[jax.Array]
    page_size: int
    free: list[int]
    tables: dict[int, list[int]]  # seq id -> page ids
    lengths: dict[int, int]

    @staticmethod
    def create(n_pages, n_kv_heads, page_size, head_dim,
               dtype=jnp.bfloat16, quantized=False):
        shape = (n_pages, n_kv_heads, page_size, head_dim)
        if quantized:
            return PagedKVCache(
                pool_k=jnp.zeros(shape, jnp.int8),
                pool_v=jnp.zeros(shape, jnp.int8),
                pool_k_scale=jnp.zeros(shape[:3], jnp.float32),
                pool_v_scale=jnp.zeros(shape[:3], jnp.float32),
                page_size=page_size,
                free=list(range(n_pages)),
                tables={},
                lengths={},
            )
        return PagedKVCache(
            pool_k=jnp.zeros(shape, dtype),
            pool_v=jnp.zeros(shape, dtype),
            pool_k_scale=None,
            pool_v_scale=None,
            page_size=page_size,
            free=list(range(n_pages)),
            tables={},
            lengths={},
        )

    @property
    def quantized(self) -> bool:
        return self.pool_k_scale is not None

    def alloc_seq(self, seq_id: int):
        self.tables[seq_id] = []
        self.lengths[seq_id] = 0

    def free_seq(self, seq_id: int):
        self.free.extend(self.tables.pop(seq_id, []))
        self.lengths.pop(seq_id, None)

    def _ensure_page(self, seq_id: int):
        length = self.lengths[seq_id]
        if length % self.page_size == 0 and (
            length // self.page_size == len(self.tables[seq_id])
        ):
            if not self.free:
                raise MemoryError("KV page pool exhausted")
            self.tables[seq_id].append(self.free.pop())

    def append_token(self, seq_id: int, k_tok, v_tok):
        """k_tok/v_tok: (KH, E) for one token."""
        self._ensure_page(seq_id)
        length = self.lengths[seq_id]
        page = self.tables[seq_id][length // self.page_size]
        off = length % self.page_size

        if self.quantized:
            def quant(x):
                amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
                scale = jnp.maximum(amax, 1e-8) / INT8_MAX
                vals = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / scale[..., None]),
                    -INT8_MAX, INT8_MAX,
                ).astype(jnp.int8)
                return vals, scale

            kq, ks = quant(k_tok)
            vq, vs = quant(v_tok)
            self.pool_k = jax.lax.dynamic_update_slice(
                self.pool_k, kq[None, :, None, :], (page, 0, off, 0)
            )
            self.pool_v = jax.lax.dynamic_update_slice(
                self.pool_v, vq[None, :, None, :], (page, 0, off, 0)
            )
            self.pool_k_scale = jax.lax.dynamic_update_slice(
                self.pool_k_scale, ks[None, :, None], (page, 0, off)
            )
            self.pool_v_scale = jax.lax.dynamic_update_slice(
                self.pool_v_scale, vs[None, :, None], (page, 0, off)
            )
        else:
            self.pool_k = jax.lax.dynamic_update_slice(
                self.pool_k,
                k_tok[None, :, None, :].astype(self.pool_k.dtype),
                (page, 0, off, 0),
            )
            self.pool_v = jax.lax.dynamic_update_slice(
                self.pool_v,
                v_tok[None, :, None, :].astype(self.pool_v.dtype),
                (page, 0, off, 0),
            )
        self.lengths[seq_id] = length + 1

    def batch_views(self, seq_ids: list[int], max_pages: int):
        """(page_table (B, max_pages), lengths (B,)) for the decode kernel."""
        import numpy as np

        B = len(seq_ids)
        table = np.zeros((B, max_pages), np.int32)
        lens = np.zeros((B,), np.int32)
        for i, sid in enumerate(seq_ids):
            pages = self.tables[sid]
            table[i, : len(pages)] = pages
            lens[i] = self.lengths[sid]
        return jnp.asarray(table), jnp.asarray(lens)
