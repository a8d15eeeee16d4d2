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


# ---------------------------------------------------------------------------
# prompt prefix caching (paged engine)


def _greedy_ref(params, cfg, prompt, n_new):
    from nnop_tpu.models.llama import forward

    toks, out = list(prompt), []
    for _ in range(n_new):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)
    return out


def test_prefix_cache_exact_and_hits():
    """Second request sharing a 128-token prefix: (a) tokens identical
    to the uncached paged engine, (b) the prefix pages are SHARED (same
    ids), (c) the cache reports the match."""
    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    base = [int(x) for x in
            jax.random.randint(jax.random.key(5), (160,), 1, 250)]
    p1 = base + [7, 8, 9]
    p2 = base + [20, 21]

    want1 = _greedy_ref(params, cfg, p1, 4)
    want2 = _greedy_ref(params, cfg, p2, 4)

    eng = Engine(params, cfg, max_batch=2, max_seq=512, paged=True,
                 page_size=128, prefix_cache=True, prefill_chunk=64)
    r1 = eng.submit(p1, max_new_tokens=4)
    eng.run()
    assert r1.done and r1.out == want1, (r1.out, want1)
    assert len(eng._prefix_cache) == 1
    assert eng.prefix_hits == 0

    r2 = eng.submit(p2, max_new_tokens=4)
    eng.run()
    assert r2.done and r2.out == want2, (r2.out, want2)
    assert eng.prefix_hits == 128


def test_prefix_cache_concurrent_sharing_and_release():
    """Two live requests share prefix pages; finishing both returns
    only the unshared pages, and the cached pages stay reusable."""
    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    base = [int(x) for x in
            jax.random.randint(jax.random.key(6), (160,), 1, 250)]

    eng = Engine(params, cfg, max_batch=2, max_seq=512, paged=True,
                 page_size=128, prefix_cache=True, prefill_chunk=64)
    r1 = eng.submit(base + [3, 4, 5], max_new_tokens=3)
    eng.run()
    cached_pages = list(eng._prefix_cache.values())[0]
    free_before = len(eng._free_pages)

    r2 = eng.submit(base + [9, 9], max_new_tokens=3)
    r3 = eng.submit(base + [1], max_new_tokens=3)
    # admit both (they run concurrently in the 2 slots)
    eng.run()
    assert r2.done and r3.done
    assert eng.prefix_hits == 256
    # all slot pages released; cached pages still held by the cache
    assert eng._free_pages.count(cached_pages[0]) == 0
    assert len(eng._free_pages) == free_before
    for pid in cached_pages:
        assert eng._page_refs[pid] == 1  # only the cache's ref remains


def test_prefix_cache_stress_mixed_load():
    """12 requests / 3 slots, mixed prefix sharing and lengths: every
    request's tokens match its isolated no-cache run (continuous
    batching + prefix cache interplay, page recycling under load)."""
    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    base_a = [int(x) for x in
              jax.random.randint(jax.random.key(7), (160,), 1, 250)]
    base_b = [int(x) for x in
              jax.random.randint(jax.random.key(8), (160,), 1, 250)]
    prompts = []
    for i in range(12):
        base = base_a if i % 2 == 0 else base_b
        prompts.append(base + [(3 * i + 1) % 250 + 1, (7 * i) % 250 + 1])

    def isolated(p):
        e = Engine(params, cfg, max_batch=1, max_seq=512, paged=True,
                   page_size=128, prefill_chunk=64)
        r = e.submit(p, max_new_tokens=4)
        e.run()
        return r.out

    want = [isolated(p) for p in prompts[:4]]  # spot-check 4 oracles

    eng = Engine(params, cfg, max_batch=3, max_seq=512, paged=True,
                 page_size=128, prefix_cache=True, prefill_chunk=64,
                 n_pages=24)
    reqs = [eng.submit(p, max_new_tokens=4) for p in prompts]
    eng.run()
    assert all(r.done for r in reqs)
    for r, w in zip(reqs[:4], want):
        assert r.out == w, (r.rid, r.out, w)
    # both prefixes cached, many hits
    assert eng.prefix_hits >= 128 * 8


def test_immediate_retire_releases_pages():
    """Code review r4: a request that retires AT admission (EOS/stop/
    max_new_tokens=1) must release its page refs like _collect does —
    otherwise the next occupant adopts stale pages (corrupting a
    published shared prefix) or leaks them from the pool."""
    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    eng = Engine(params, cfg, max_batch=2, max_seq=512, paged=True,
                 page_size=128, prefix_cache=True, prefill_chunk=64)
    free0 = len(eng._free_pages)
    prompt = [int(x) for x in
              jax.random.randint(jax.random.key(3), (200,), 1, 250)]
    r = eng.submit(prompt, max_new_tokens=1)
    eng.run()
    assert r.done and len(r.out) == 1
    assert eng._slot_pages[0] == [] and eng._slot_pages[1] == []
    # slot refs released; only the published prefix-cache refs remain
    cache_pages = {p for ps in eng._prefix_cache.values() for p in ps}
    assert len(eng._free_pages) == free0 - len(cache_pages)
    # page refcounts are exactly the cache's (no leaked slot refs)
    assert all(eng._page_refs[p] == 1 for p in cache_pages)


def test_warmup_leaves_no_pinned_prefix_pages():
    """Code review r4: warmup's dummy prompts must not stay published in
    the prefix cache pinning pages for the server's life."""
    from nnop_tpu.models.llama import LlamaConfig, init_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    eng = Engine(params, cfg, max_batch=2, max_seq=512, paged=True,
                 page_size=128, prefix_cache=True, prefill_chunk=64)
    n_pages = eng.n_pages
    eng.warmup(prompt_lengths=(200,))
    assert eng._prefix_cache == {}
    assert len(eng._free_pages) == n_pages
    assert all(v <= 0 for v in eng._page_refs.values()) or \
        eng._page_refs == {}
