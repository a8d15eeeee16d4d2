"""Model-family configs (Mistral sliding window, Gemma, Qwen2) on the
shared Llama-lineage transformer.

North-star additions: the reference has no model zoo (SURVEY.md §1), so
these validate the family knobs end-to-end through the fused kernels —
including cross-path consistency (windowed decode_attention vs windowed
flash_attention) which exercises the window masking in BOTH kernels.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from nnop_tpu.models.kv_cache import KVCache
from nnop_tpu.models.llama import (
    LlamaConfig,
    forward,
    init_params,
    loss_fn,
)


def _mk_cfg(**kw):
    return LlamaConfig.tiny(dtype=jnp.float32, **kw)


def _decode_vs_full(cfg, params, B=2, L=24, prefill=16, cache_len=64):
    tokens = jax.random.randint(jax.random.key(3), (B, L), 0, cfg.vocab_size)
    full_logits = forward(params, tokens, cfg)

    caches = [
        KVCache.init(B, cfg.n_kv_heads, cache_len, cfg.head_dim, jnp.float32)
        for _ in range(cfg.n_layers)
    ]
    logits, caches = forward(params, tokens[:, :prefill], cfg, kv_caches=caches)
    outs = [logits]
    for t in range(prefill, L):
        pos = jnp.full((B, 1), t, jnp.int32)
        logits, caches = forward(
            params, tokens[:, t : t + 1], cfg, positions=pos, kv_caches=caches
        )
        outs.append(logits)
    inc = jnp.concatenate(outs, axis=1)
    assert jnp.allclose(inc, full_logits, atol=2e-3, rtol=2e-3), (
        jnp.abs(inc - full_logits).max()
    )


# ---------------------------------------------------------------- Mistral


def test_mistral_config_defaults():
    cfg = LlamaConfig.mistral_7b()
    assert cfg.sliding_window == 4096
    assert cfg.vocab_size == 32000


def test_mistral_window_changes_output():
    cfg_w = _mk_cfg(sliding_window=8)
    cfg_full = _mk_cfg()
    params = init_params(jax.random.key(0), cfg_w)
    tokens = jax.random.randint(jax.random.key(1), (1, 32), 0, cfg_w.vocab_size)
    lw = forward(params, tokens, cfg_w)
    lf = forward(params, tokens, cfg_full)
    # rows before the window fills must agree; later rows must differ
    assert jnp.allclose(lw[:, :8], lf[:, :8], atol=1e-4)
    assert not jnp.allclose(lw[:, -1], lf[:, -1], atol=1e-3)


def test_mistral_decode_matches_full_forward():
    """Windowed decode_attention (cache path) vs windowed flash_attention
    (full forward) — cross-kernel window consistency."""
    cfg = _mk_cfg(sliding_window=8)
    params = init_params(jax.random.key(0), cfg)
    _decode_vs_full(cfg, params)


def test_mistral_window_grads():
    cfg = _mk_cfg(sliding_window=8)
    params = init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(2), (1, 32), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
    assert jnp.isfinite(loss)
    assert all(jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads))


# ----------------------------------------------------------------- Gemma


def test_gemma_config_defaults():
    cfg = LlamaConfig.gemma_2b()
    assert cfg.rms_offset == 1.0
    assert cfg.act == "gelu"
    assert cfg.tie_embeddings
    assert cfg.embed_scale == pytest.approx(2048.0**0.5)


def _gemma_tiny(**kw):
    return _mk_cfg(
        rms_offset=1.0,
        act="gelu",
        tie_embeddings=True,
        embed_scale=128.0**0.5,
        **kw,
    )


def test_gemma_forward_and_grads():
    cfg = _gemma_tiny()
    params = init_params(jax.random.key(0), cfg)
    assert "lm_head" not in params  # tied
    tokens = jax.random.randint(jax.random.key(1), (2, 16), 0, cfg.vocab_size)
    logits = forward(params, tokens, cfg)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert jnp.all(jnp.isfinite(logits))
    targets = jnp.roll(tokens, -1, axis=1)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
    assert jnp.isfinite(loss)
    # tied head: embedding receives gradient from BOTH lookup and head
    assert jnp.any(grads["embed"] != 0)


def test_gemma_rms_offset_equivalence():
    """(offset=1, w) must equal (offset=0, 1+w) — reference rms_norm.jl:117
    semantics carried through the model."""
    cfg1 = _gemma_tiny()
    cfg0 = dataclasses.replace(cfg1, rms_offset=0.0)
    params = init_params(jax.random.key(0), cfg1)

    def shift(p):
        out = jax.tree_util.tree_map(lambda x: x, p)
        for lyr in out["layers"]:
            lyr["attn_norm"] = lyr["attn_norm"] + 1.0
            lyr["mlp_norm"] = lyr["mlp_norm"] + 1.0
        out["final_norm"] = out["final_norm"] + 1.0
        return out

    tokens = jax.random.randint(jax.random.key(1), (1, 16), 0, cfg1.vocab_size)
    l1 = forward(params, tokens, cfg1)
    l0 = forward(shift(params), tokens, cfg0)
    assert jnp.allclose(l1, l0, atol=1e-4)


def test_gemma_decode_matches_full_forward():
    cfg = _gemma_tiny()
    params = init_params(jax.random.key(0), cfg)
    _decode_vs_full(cfg, params)


# ----------------------------------------------------------------- Qwen2


def test_qwen2_config_defaults():
    cfg = LlamaConfig.qwen2_7b()
    assert cfg.qkv_bias
    assert cfg.rope_base == 1000000.0


def test_qwen2_zero_bias_matches_llama():
    cfg_b = _mk_cfg(qkv_bias=True)
    cfg_n = _mk_cfg()
    params = init_params(jax.random.key(0), cfg_b)
    assert "bq" in params["layers"][0]
    tokens = jax.random.randint(jax.random.key(1), (1, 16), 0, cfg_b.vocab_size)
    lb = forward(params, tokens, cfg_b)
    ln = forward(params, tokens, cfg_n)  # bias fields ignored without flag
    assert jnp.allclose(lb, ln, atol=1e-5)


def test_qwen2_bias_grads_flow():
    cfg = _mk_cfg(qkv_bias=True)
    params = init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(2), (1, 16), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    _, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
    assert jnp.any(grads["layers"][0]["bq"] != 0)
    assert jnp.any(grads["layers"][0]["bk"] != 0)
    assert jnp.any(grads["layers"][0]["bv"] != 0)


def test_qwen2_decode_matches_full_forward():
    cfg = _mk_cfg(qkv_bias=True)
    params = init_params(jax.random.key(0), cfg)
    # perturb biases so the path is actually exercised
    for lyr in params["layers"]:
        lyr["bq"] = lyr["bq"] + 0.1
        lyr["bk"] = lyr["bk"] - 0.05
    _decode_vs_full(cfg, params)


# ---------------------------------------------------------------- Gemma-2


def _gemma2_tiny(**kw):
    return _mk_cfg(
        rms_offset=1.0,
        act="gelu",
        tie_embeddings=True,
        embed_scale=128.0**0.5,
        attn_softcap=20.0,
        final_softcap=15.0,
        post_norms=True,
        sliding_window=8,
        window_pattern=2,
        **kw,
    )


def test_gemma2_config_defaults():
    cfg = LlamaConfig.gemma2_2b()
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.post_norms and cfg.window_pattern == 2
    assert cfg.layer_window(0) == 4096 and cfg.layer_window(1) is None


def test_softcap_fwd_matches_naive():
    from nnop_tpu.ops.flash_attention import flash_attention
    from nnop_tpu.ops import naive

    ks = jax.random.split(jax.random.key(9), 3)
    q = jax.random.normal(ks[0], (2, 4, 256, 32), jnp.float32) * 3
    k = jax.random.normal(ks[1], (2, 2, 256, 32), jnp.float32) * 3
    v = jax.random.normal(ks[2], (2, 2, 256, 32), jnp.float32)
    for causal in (False, True):
        o = flash_attention(q, k, v, causal=causal, softcap=10.0)
        on = naive.naive_attention(q, k, v, causal=causal, softcap=10.0)
        assert jnp.allclose(o, on, atol=2e-3, rtol=2e-3), (
            causal, jnp.abs(o - on).max()
        )
    # softcap actually changes the output at these magnitudes
    o_free = flash_attention(q, k, v, causal=True)
    o_cap = flash_attention(q, k, v, causal=True, softcap=10.0)
    assert not jnp.allclose(o_free, o_cap, atol=1e-3)


def test_softcap_grads_match_naive():
    from nnop_tpu.ops.flash_attention import flash_attention
    from nnop_tpu.ops import naive

    ks = jax.random.split(jax.random.key(10), 3)
    q = jax.random.normal(ks[0], (1, 2, 256, 32), jnp.float32) * 3
    k = jax.random.normal(ks[1], (1, 2, 256, 32), jnp.float32) * 3
    v = jax.random.normal(ks[2], (1, 2, 256, 32), jnp.float32)

    def lf(q, k, v):
        return flash_attention(q, k, v, causal=True, softcap=10.0).sum()

    def ln(q, k, v):
        return naive.naive_attention(q, k, v, causal=True, softcap=10.0).sum()

    gf = jax.grad(lf, (0, 1, 2))(q, k, v)
    gn = jax.grad(ln, (0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gn, "qkv"):
        assert jnp.allclose(a, b, atol=2e-2, rtol=2e-3), (
            name, jnp.abs(a - b).max()
        )


def test_softcap_decode_matches_naive():
    from nnop_tpu.ops.attention_decode import decode_attention
    from nnop_tpu.ops import naive

    ks = jax.random.split(jax.random.key(11), 4)
    B, QH, KH, S, E = 2, 4, 2, 160, 64
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.float32) * 2
    k = jax.random.normal(ks[1], (B, KH, S, E), jnp.float32) * 2
    v = jax.random.normal(ks[2], (B, KH, S, E), jnp.float32)
    lengths = jnp.array([S, 70], jnp.int32)
    got = decode_attention(q, k, v, lengths, softcap=12.0)
    mask = jnp.arange(S)[None, :] < lengths[:, None]
    want = naive.naive_attention(q, k, v, kpad_mask=mask, softcap=12.0)
    assert jnp.allclose(got, want, atol=1e-3, rtol=1e-3), (
        jnp.abs(got - want).max()
    )


def test_gemma2_forward_grads_and_decode():
    cfg = _gemma2_tiny()
    params = init_params(jax.random.key(0), cfg)
    assert "attn_post_norm" in params["layers"][0]
    tokens = jax.random.randint(jax.random.key(1), (2, 24), 0, cfg.vocab_size)
    logits = forward(params, tokens, cfg)
    # final softcap bounds the logits
    assert jnp.all(jnp.abs(logits) <= cfg.final_softcap + 1e-3)
    targets = jnp.roll(tokens, -1, axis=1)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
    assert jnp.isfinite(loss)
    assert jnp.any(grads["layers"][0]["attn_post_norm"] != 0)
    _decode_vs_full(cfg, params)


def test_gemma2_engine_matches_forward():
    from nnop_tpu.runtime.engine import Engine

    cfg = _gemma2_tiny()
    params = init_params(jax.random.key(4), cfg)
    prompt = [5, 17, 42, 7, 99, 3]
    toks = list(prompt)
    want = []
    for _ in range(8):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        want.append(nxt)
        toks.append(nxt)
    eng = Engine(params, cfg, max_batch=2, max_seq=64)
    req = eng.submit(prompt, max_new_tokens=8)
    eng.run()
    assert req.done
    assert req.out == want, (req.out, want)


# ------------------------------------------------------ Llama-3.1 rope


def test_rope_scaling_formula():
    from nnop_tpu.ops.rope import RotaryEmbedding

    dim, base = 64, 500000.0
    plain = RotaryEmbedding(dim, base)
    scaled = RotaryEmbedding(dim, base, scaling=(8.0, 1.0, 4.0, 8192))
    inv0, inv1 = plain.inv_freq, scaled.inv_freq
    wavelen = 2.0 * jnp.pi / inv0
    # short wavelengths untouched, long ones divided by factor
    hi = wavelen < 8192 / 4.0
    lo = wavelen > 8192 / 1.0
    assert jnp.allclose(inv1[hi], inv0[hi])
    assert jnp.allclose(inv1[lo], inv0[lo] / 8.0)
    # ramp region strictly between the two
    mid = ~(hi | lo)
    assert jnp.all(inv1[mid] < inv0[mid])
    assert jnp.all(inv1[mid] > inv0[mid] / 8.0)


def test_llama31_forward_runs():
    cfg = _mk_cfg(rope_scaling=(8.0, 1.0, 4.0, 64))
    params = init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (1, 16), 0, cfg.vocab_size)
    l_scaled = forward(params, tokens, cfg)
    l_plain = forward(params, tokens, _mk_cfg())
    assert jnp.all(jnp.isfinite(l_scaled))
    assert not jnp.allclose(l_scaled, l_plain, atol=1e-4)
    _decode_vs_full(cfg, params)
