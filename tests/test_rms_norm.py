"""RMS norm parity vs naive — grids from
/root/reference/test/rmsnorm_tests.jl:11-17 (emb × n sweep × offset)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu import rms_norm
from nnop_tpu.ops.naive import naive_rms_norm

EMBS = [15, 255, 256, 257, 511, 512, 513, 1024]
NS = [1, 2, 4, 15, 16, 17, 23, 25]


@pytest.mark.parametrize("emb", EMBS)
@pytest.mark.parametrize("n", [1, 16, 25])
@pytest.mark.parametrize("offset", [0.0, 1.0])
def test_rms_fwd(emb, n, offset):
    kq, kw = jax.random.split(jax.random.key(0))
    x = jax.random.normal(kq, (n, emb), jnp.float32)
    w = jax.random.normal(kw, (emb,), jnp.float32)
    np.testing.assert_allclose(
        rms_norm(x, w, 1e-6, offset),
        naive_rms_norm(x, w, offset=offset),
        atol=1e-6,
        rtol=1e-5,
    )


@pytest.mark.parametrize("n", NS)
def test_rms_fwd_n_sweep(n):
    kq, kw = jax.random.split(jax.random.key(1))
    x = jax.random.normal(kq, (n, 257), jnp.float32)
    w = jax.random.normal(kw, (257,), jnp.float32)
    np.testing.assert_allclose(
        rms_norm(x, w), naive_rms_norm(x, w), atol=1e-6, rtol=1e-5
    )


@pytest.mark.parametrize("emb", [255, 512, 513])
@pytest.mark.parametrize("offset", [0.0, 1.0])
def test_rms_grad(emb, offset):
    kq, kw = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kq, (17, emb), jnp.float32)
    w = jax.random.normal(kw, (emb,), jnp.float32)

    def loss(fn):
        return lambda x, w: jnp.sum(
            fn(x, w) * jnp.sin(jnp.arange(emb, dtype=jnp.float32))
        )

    gx, gw = jax.grad(loss(lambda x, w: rms_norm(x, w, 1e-6, offset)), (0, 1))(x, w)
    nx, nw = jax.grad(
        loss(lambda x, w: naive_rms_norm(x, w, offset=offset)), (0, 1)
    )(x, w)
    np.testing.assert_allclose(gx, nx, atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(gw, nw, atol=1e-5, rtol=1e-4)


def test_rms_bf16():
    kq, kw = jax.random.split(jax.random.key(3))
    x = jax.random.normal(kq, (16, 512), jnp.bfloat16)
    w = jax.random.normal(kw, (512,), jnp.bfloat16)
    got = rms_norm(x, w).astype(jnp.float32)
    want = naive_rms_norm(x, w).astype(jnp.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)
