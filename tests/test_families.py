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
