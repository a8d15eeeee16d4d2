"""Layer norm parity vs naive — grids from
/root/reference/test/layernorm_tests.jl:13-17 (same emb × n sweep as
rmsnorm)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu import layer_norm
from nnop_tpu.ops.naive import naive_layer_norm

EMBS = [15, 255, 256, 257, 511, 512, 513, 1024]


@pytest.mark.parametrize("emb", EMBS)
@pytest.mark.parametrize("n", [1, 16, 25])
def test_ln_fwd(emb, n):
    kq, kw, kb = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kq, (n, emb), jnp.float32)
    w = jax.random.normal(kw, (emb,), jnp.float32)
    b = jax.random.normal(kb, (emb,), jnp.float32)
    np.testing.assert_allclose(
        layer_norm(x, w, b), naive_layer_norm(x, w, b), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("emb", [255, 512, 513])
def test_ln_grad(emb):
    kq, kw, kb = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(kq, (17, emb), jnp.float32)
    w = jax.random.normal(kw, (emb,), jnp.float32)
    b = jax.random.normal(kb, (emb,), jnp.float32)

    def loss(fn):
        return lambda x, w, b: jnp.sum(
            fn(x, w, b) * jnp.sin(jnp.arange(emb, dtype=jnp.float32))
        )

    gx, gw, gb = jax.grad(loss(layer_norm), (0, 1, 2))(x, w, b)
    nx, nw, nb = jax.grad(loss(naive_layer_norm), (0, 1, 2))(x, w, b)
    np.testing.assert_allclose(gx, nx, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(gw, nw, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(gb, nb, atol=1e-5, rtol=1e-4)
