"""Llama model: forward, loss+grads through every fused kernel, KV-cache
decode parity (incremental decode == full forward), INT8 KV cache
quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu.models.kv_cache import KVCache
from nnop_tpu.models.llama import LlamaConfig, forward, init_params, loss_fn

CFG = LlamaConfig.tiny()


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), LlamaConfig.tiny(dtype=jnp.float32))


def test_forward_shape(params):
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.key(1), (2, 64), 0, cfg.vocab_size)
    logits = forward(params, tokens, cfg)
    assert logits.shape == (2, 64, cfg.vocab_size)
    assert jnp.all(jnp.isfinite(logits))


def test_grads_finite(params):
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    tokens = jax.random.randint(jax.random.key(2), (2, 32), 0, cfg.vocab_size)
    targets = jnp.roll(tokens, -1, axis=1)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
    assert jnp.isfinite(loss)
    leaves = jax.tree.leaves(grads)
    assert all(jnp.all(jnp.isfinite(g)) for g in leaves)
    assert any(jnp.any(g != 0) for g in leaves)


@pytest.mark.parametrize("quantized", [False, True])
def test_decode_matches_full_forward(params, quantized):
    """Prefill + token-by-token decode must match the full causal forward."""
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    B, L = 2, 24
    tokens = jax.random.randint(jax.random.key(3), (B, L), 0, cfg.vocab_size)
    full_logits = forward(params, tokens, cfg)

    caches = [
        KVCache.init(B, cfg.n_kv_heads, 64, cfg.head_dim, jnp.float32,
                     quantized=quantized)
        for _ in range(cfg.n_layers)
    ]
    prefill = 16
    logits, caches = forward(
        params, tokens[:, :prefill], cfg, kv_caches=caches
    )
    outs = [logits]
    for t in range(prefill, L):
        pos = jnp.full((B, 1), t, jnp.int32)
        logits, caches = forward(
            params, tokens[:, t : t + 1], cfg, positions=pos, kv_caches=caches
        )
        outs.append(logits)
    dec_logits = jnp.concatenate(outs, axis=1)

    if quantized:
        # int8 KV: compare argmax agreement + bounded logit error
        agree = jnp.mean(
            (jnp.argmax(dec_logits, -1) == jnp.argmax(full_logits, -1)).astype(
                jnp.float32
            )
        )
        assert agree > 0.95, f"argmax agreement {agree}"
    else:
        np.testing.assert_allclose(dec_logits, full_logits, atol=2e-3, rtol=2e-3)


def test_train_checkpoint_resume(params, tmp_path):
    """Checkpoint/resume mid-training: params + AdamW state saved after
    step k and reloaded must continue BIT-IDENTICALLY (the reference has
    no checkpointing at all — SURVEY.md §5; this is north-star scope)."""
    import numpy as np

    from nnop_tpu.models.llama import loss_fn
    from nnop_tpu.models.weights import load_checkpoint, save_checkpoint
    from nnop_tpu.parallel.tp_llama import AdamW

    opt = AdamW(lr=1e-3)
    state = opt.init(params)
    toks = jnp.arange(2 * 32, dtype=jnp.int32).reshape(2, 32) % CFG.vocab_size
    tgts = (toks + 1) % CFG.vocab_size

    @jax.jit
    def step(p, s, toks, tgts):
        loss, grads = jax.value_and_grad(loss_fn)(p, toks, tgts, CFG)
        p, s = opt.update(grads, s, p)
        return p, s, loss

    p, s = params, state
    for _ in range(2):
        p, s, _ = step(p, s, toks, tgts)

    save_checkpoint(str(tmp_path / "p.npz"), p)
    save_checkpoint(str(tmp_path / "s.npz"), s)
    p2 = load_checkpoint(str(tmp_path / "p.npz"), p)
    s2 = load_checkpoint(str(tmp_path / "s.npz"), s)

    pa, sa, la = step(p, s, toks, tgts)
    pb, sb, lb = step(p2, s2, toks, tgts)
    assert float(la) == float(lb)
    for a, b in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
