"""Surgical in-place KV write kernel vs vmapped dynamic_update_slice."""

import jax
import jax.numpy as jnp
import numpy as np

from nnop_tpu.ops.kv_write import write_kv_token


def _oracle(cache, new, positions):
    def one(c, n, p):
        return jax.lax.dynamic_update_slice(c, n.astype(c.dtype), (0, p, 0))
    return jax.vmap(one)(cache, new, positions)


def test_write_kv_token_fp():
    B, KH, S, E = 3, 2, 64, 32
    ks = jax.random.split(jax.random.key(0), 3)
    cache = jax.random.normal(ks[0], (B, KH, S, E), jnp.float32)
    new = jax.random.normal(ks[1], (B, KH, 1, E), jnp.float32)
    pos = jnp.asarray([0, 17, 63], jnp.int32)
    got = write_kv_token(cache, new, pos)
    want = _oracle(cache, new, pos)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_write_kv_token_int8():
    B, KH, S, E = 2, 4, 96, 64
    cache = jax.random.randint(jax.random.key(1), (B, KH, S, E), -127, 128, jnp.int8)
    new = jax.random.randint(jax.random.key(2), (B, KH, 1, E), -127, 128, jnp.int8)
    pos = jnp.asarray([5, 95], jnp.int32)
    got = write_kv_token(cache, new, pos)
    want = _oracle(cache, new, pos)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_write_kv_token_jit_donated():
    B, KH, S, E = 2, 2, 32, 16
    cache = jnp.zeros((B, KH, S, E), jnp.float32)
    new = jnp.ones((B, KH, 1, E), jnp.float32)
    pos = jnp.asarray([3, 7], jnp.int32)

    @jax.jit
    def step(cache, new, pos):
        return write_kv_token(cache, new, pos)

    got = step(cache, new, pos)
    assert float(got[0, 0, 3, 0]) == 1.0
    assert float(got[1, 1, 7, 0]) == 1.0
    assert float(got[0, 0, 4, 0]) == 0.0
