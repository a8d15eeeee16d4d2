"""Paged decode attention: page-indirect kernel vs naive, allocator
behavior, int8 pool."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu.ops.attention_decode_paged import paged_decode_attention
from nnop_tpu.ops.naive import naive_attention
from nnop_tpu.runtime.paged_cache import PagedKVCache


def _fill_cache(cache, seqs, KH, E, seed=0):
    """seqs: dict seq_id -> n_tokens; returns dense (for oracle) per seq."""
    dense = {}
    key = jax.random.key(seed)
    for sid, n in seqs.items():
        cache.alloc_seq(sid)
        ks, vs = [], []
        for t in range(n):
            key, k1, k2 = jax.random.split(key, 3)
            k_tok = jax.random.normal(k1, (KH, E), jnp.float32)
            v_tok = jax.random.normal(k2, (KH, E), jnp.float32)
            cache.append_token(sid, k_tok, v_tok)
            ks.append(k_tok)
            vs.append(v_tok)
        dense[sid] = (jnp.stack(ks, axis=1), jnp.stack(vs, axis=1))
    return dense


@pytest.mark.parametrize("quantized", [False, True])
def test_paged_decode_matches_naive(quantized):
    KH, E, page = 2, 64, 64
    cache = PagedKVCache.create(
        32, KH, page, E, dtype=jnp.float32, quantized=quantized
    )
    seqs = {0: 100, 1: 37, 2: 164}
    dense = _fill_cache(cache, seqs, KH, E)

    B, QH = len(seqs), 8
    q = jax.random.normal(jax.random.key(9), (B, QH, 1, E), jnp.float32)
    table, lens = cache.batch_views(list(seqs), max_pages=4)
    got = paged_decode_attention(
        q, cache.pool_k, cache.pool_v, table, lens,
        cache.pool_k_scale, cache.pool_v_scale,
    )

    S = 256
    atol = 2e-2 if quantized else 1e-3
    for i, sid in enumerate(seqs):
        kd, vd = dense[sid]  # (KH, n, E)
        n = seqs[sid]
        kfull = jnp.zeros((1, KH, S, E)).at[0, :, :n].set(kd)
        vfull = jnp.zeros((1, KH, S, E)).at[0, :, :n].set(vd)
        mask = (jnp.arange(S) < n)[None]
        want = naive_attention(q[i : i + 1], kfull, vfull, kpad_mask=mask)
        np.testing.assert_allclose(
            got[i : i + 1], want, atol=atol, rtol=atol, err_msg=f"seq {sid}"
        )


def test_allocator_reuse():
    cache = PagedKVCache.create(4, 1, 8, 16, dtype=jnp.float32)
    cache.alloc_seq(0)
    for _ in range(20):
        cache.append_token(
            0, jnp.zeros((1, 16)), jnp.zeros((1, 16))
        )
    assert len(cache.tables[0]) == 3  # ceil(20/8)
    assert len(cache.free) == 1
    cache.free_seq(0)
    assert len(cache.free) == 4

    # exhaustion raises
    cache.alloc_seq(1)
    with pytest.raises(MemoryError):
        for _ in range(40):
            cache.append_token(1, jnp.zeros((1, 16)), jnp.zeros((1, 16)))
