"""Weight-only INT8 model: forward parity, PPL gate machinery, checkpoint
roundtrip."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu.models.eval import perplexity
from nnop_tpu.models.llama import LlamaConfig, forward, init_params
from nnop_tpu.models.quantized import qmatmul, quantize_params
from nnop_tpu.models.weights import load_checkpoint, save_checkpoint

CFG = LlamaConfig.tiny(dtype=jnp.float32)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.key(0), CFG)


def test_int8_forward_close(params):
    qp = quantize_params(params)
    tokens = jax.random.randint(jax.random.key(1), (2, 32), 0, CFG.vocab_size)
    full = forward(params, tokens, CFG)
    q = forward(qp, tokens, CFG, matmul=qmatmul)
    # logits stay close and argmax mostly agrees
    agree = jnp.mean(
        (jnp.argmax(q, -1) == jnp.argmax(full, -1)).astype(jnp.float32)
    )
    assert agree > 0.9, agree


def test_int8_ppl_gate(params):
    """PPL(int8) within 0.1 of PPL(fp32) — the north-star quality gate,
    exercised end-to-end on the tiny model."""
    stream = list(
        np.asarray(
            jax.random.randint(jax.random.key(2), (257,), 0, CFG.vocab_size)
        )
    )
    ppl_fp = perplexity(params, stream, CFG, chunk=64)
    qp = quantize_params(params)
    ppl_q = perplexity(qp, stream, CFG, matmul=qmatmul, chunk=64)
    # random tiny model: PPL ~ vocab_size; quantization must not move it
    # beyond the north-star band (relative: 0.1 PPL at PPL~exp(loss)).
    assert abs(ppl_q - ppl_fp) / ppl_fp < 0.02, (ppl_fp, ppl_q)


def test_checkpoint_roundtrip(params):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_checkpoint(path, params)
        loaded = load_checkpoint(path, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
