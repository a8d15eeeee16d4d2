"""Perplexity evaluation — the quality gate for quantized variants
(BASELINE.json: INT8 within 0.1 PPL of FP32)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nnop_tpu.models.llama import LlamaConfig, forward


def perplexity(params, token_ids, cfg: LlamaConfig, *, matmul=None,
               chunk: int = 512):
    """PPL of next-token prediction over a 1-D token stream."""
    n = (len(token_ids) - 1) // chunk * chunk
    if n == 0:
        raise ValueError(f"need at least {chunk + 1} tokens")
    inputs = jnp.asarray(token_ids[:n], jnp.int32).reshape(-1, chunk)
    targets = jnp.asarray(token_ids[1 : n + 1], jnp.int32).reshape(-1, chunk)

    @jax.jit
    def chunk_nll(tok, tgt):
        logits = forward(params, tok[None], cfg, matmul=matmul)[0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.sum(jnp.take_along_axis(logp, tgt[:, None], axis=-1))

    total = 0.0
    for i in range(inputs.shape[0]):
        total += float(chunk_nll(inputs[i], targets[i]))
    return float(jnp.exp(total / n))
