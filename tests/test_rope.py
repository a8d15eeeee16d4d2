"""Llama RoPE parity vs naive — grids from
/root/reference/test/rope_tests.jl:21-27 (L sweep incl. off-by-one ×
independent q/k head counts, dim=16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu import RotaryEmbedding, llama_rope
from nnop_tpu.ops.naive import naive_rope

LS = [13, 255, 256, 257, 1024, 1025]


def _mk(L, QH, KH, dim, dtype=jnp.float32, B=2):
    ks = jax.random.split(jax.random.key(0), 2)
    q = jax.random.normal(ks[0], (B, QH, L, dim), dtype)
    k = jax.random.normal(ks[1], (B, KH, L, dim), dtype)
    pos = jnp.broadcast_to(jnp.arange(L)[None, :], (B, L))
    cos, sin = RotaryEmbedding(dim)(pos)
    return q, k, cos, sin


@pytest.mark.parametrize("L", LS)
def test_rope_fwd_seq(L):
    q, k, cos, sin = _mk(L, 3, 3, 16)
    qo, ko = llama_rope(q, k, cos, sin)
    qn, kn = naive_rope(q, k, cos, sin)
    np.testing.assert_allclose(qo, qn, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(ko, kn, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("QH,KH", [(1, 1), (4, 1), (3, 5), (5, 3), (4, 4)])
def test_rope_fwd_heads(QH, KH):
    q, k, cos, sin = _mk(257, QH, KH, 16)
    qo, ko = llama_rope(q, k, cos, sin)
    qn, kn = naive_rope(q, k, cos, sin)
    np.testing.assert_allclose(qo, qn, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(ko, kn, atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("L", [255, 256])
def test_rope_grad(L):
    q, k, cos, sin = _mk(L, 4, 2, 16)

    def loss(fn):
        def f(q, k):
            qo, ko = fn(q, k, cos, sin)
            return jnp.sum(qo * jnp.cos(qo)) + jnp.sum(ko * 0.5)

        return f

    gq, gk = jax.grad(loss(llama_rope), (0, 1))(q, k)
    nq, nk = jax.grad(loss(naive_rope), (0, 1))(q, k)
    np.testing.assert_allclose(gq, nq, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(gk, nk, atol=1e-5, rtol=1e-4)


def test_rope_dim128():
    q, k, cos, sin = _mk(128, 2, 2, 128)
    qo, ko = llama_rope(q, k, cos, sin)
    qn, kn = naive_rope(q, k, cos, sin)
    np.testing.assert_allclose(qo, qn, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(ko, kn, atol=1e-6, rtol=1e-5)
