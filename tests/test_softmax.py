"""Online softmax parity vs naive — grids from
/root/reference/test/softmax_tests.jl:12-16 (seq sweep incl. off-by-one
tile boundaries; gradient check at :28)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu import online_softmax
from nnop_tpu.ops.naive import naive_softmax

SEQS = [32, 33, 63, 255, 256, 511, 512, 513, 1024]


@pytest.mark.parametrize("seq", SEQS)
def test_softmax_fwd(seq):
    x = jax.random.normal(jax.random.key(0), (4, seq), jnp.float32)
    np.testing.assert_allclose(
        online_softmax(x), naive_softmax(x), atol=1e-6, rtol=1e-6
    )


@pytest.mark.parametrize("seq", [33, 256, 513])
def test_softmax_grad(seq):
    x = jax.random.normal(jax.random.key(1), (4, seq), jnp.float32)
    g_fused = jax.grad(lambda a: jnp.sum(online_softmax(a) * jnp.cos(a)))(x)
    g_naive = jax.grad(lambda a: jnp.sum(naive_softmax(a) * jnp.cos(a)))(x)
    np.testing.assert_allclose(g_fused, g_naive, atol=1e-6, rtol=1e-5)


def test_softmax_bf16():
    x = jax.random.normal(jax.random.key(2), (16, 256), jnp.bfloat16)
    got = online_softmax(x).astype(jnp.float32)
    want = naive_softmax(x.astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_softmax_3d():
    x = jax.random.normal(jax.random.key(3), (2, 5, 128), jnp.float32)
    np.testing.assert_allclose(
        online_softmax(x), naive_softmax(x), atol=1e-6, rtol=1e-6
    )
