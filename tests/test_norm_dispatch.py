"""The XLA-formulation dispatch (platform.norm_impl) must agree with the
pallas kernels — values AND gradients — since compiled TPU serves the XLA
path by default (measured faster at every benchmarked shape, NOTES.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def impl_env():
    def set_mode(mode):
        os.environ["NNOP_NORM_IMPL"] = mode

    yield set_mode
    os.environ.pop("NNOP_NORM_IMPL", None)


def _both(impl_env, fn, *args, argnums=None):
    from nnop_tpu.utils.platform import norm_impl  # noqa: F401

    outs = {}
    for mode in ("pallas", "xla"):
        impl_env(mode)
        outs[mode] = fn(*args)
        if argnums is not None:
            outs[mode + "_g"] = jax.grad(
                lambda *a: jnp.sum(fn(*a) * jnp.cos(jnp.arange(a[0].shape[-1]))),
                argnums,
            )(*args)
    return outs


def test_rms_dispatch(impl_env):
    from nnop_tpu import rms_norm

    x = jax.random.normal(jax.random.key(0), (33, 257), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (257,), jnp.float32)
    o = _both(impl_env, lambda x, w: rms_norm(x, w, 1e-6, 1.0), x, w,
              argnums=(0, 1))
    np.testing.assert_allclose(o["pallas"], o["xla"], atol=1e-5, rtol=1e-4)
    for a, b in zip(o["pallas_g"], o["xla_g"]):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_ln_dispatch(impl_env):
    from nnop_tpu import layer_norm

    x = jax.random.normal(jax.random.key(0), (33, 257), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (257,), jnp.float32)
    b = jax.random.normal(jax.random.key(2), (257,), jnp.float32)
    o = _both(impl_env, layer_norm, x, w, b, argnums=(0, 1, 2))
    np.testing.assert_allclose(o["pallas"], o["xla"], atol=1e-5, rtol=1e-4)
    for a, b_ in zip(o["pallas_g"], o["xla_g"]):
        np.testing.assert_allclose(a, b_, atol=1e-4, rtol=1e-3)


def test_softmax_dispatch(impl_env):
    from nnop_tpu import online_softmax

    x = jax.random.normal(jax.random.key(0), (17, 513), jnp.float32)
    o = _both(impl_env, online_softmax, x, argnums=(0,))
    np.testing.assert_allclose(o["pallas"], o["xla"], atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        o["pallas_g"][0], o["xla_g"][0], atol=1e-5, rtol=1e-4
    )


def test_rope_dispatch(impl_env):
    from nnop_tpu import RotaryEmbedding, llama_rope

    q = jax.random.normal(jax.random.key(0), (2, 3, 65, 32), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (2, 2, 65, 32), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(65)[None], (2, 65))
    cos, sin = RotaryEmbedding(32)(pos)

    def f(q, k):
        qo, ko = llama_rope(q, k, cos, sin)
        return jnp.sum(qo * jnp.cos(jnp.arange(32.0))) + jnp.sum(ko)

    outs = {}
    for mode in ("pallas", "xla"):
        impl_env(mode)
        outs[mode] = llama_rope(q, k, cos, sin)
        outs[mode + "_g"] = jax.grad(f, (0, 1))(q, k)
    for a, b in zip(outs["pallas"], outs["xla"]):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
    for a, b in zip(outs["pallas_g"], outs["xla_g"]):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
