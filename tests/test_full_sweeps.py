"""Exhaustive reference test grids, ported verbatim (SURVEY.md §4).

Run with `pytest -m full`. The default suite runs trimmed grids that cover
every feature and tail case; these sweeps add the reference's complete
cartesian products:
  attention_tests.jl:6-18, causal_attention_tests.jl:6-16,
  gqa_attention_tests.jl:6-18, softmax_tests.jl:12-16,
  rmsnorm_tests.jl:11-17, layernorm_tests.jl:13-17, rope_tests.jl:21-27.

Every sweep point asserts the GRADIENTS too — the reference checks
`Zygote.gradient(sum∘op)` at every point (attention_tests.jl:20-48,
rmsnorm_tests.jl:24-32, rope_tests.jl:33-55); here the cotangent is a
fixed cosine weighting (strictly stronger than the reference's all-ones).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu import (
    RotaryEmbedding,
    flash_attention,
    layer_norm,
    llama_rope,
    online_softmax,
    rms_norm,
)
from nnop_tpu.ops import naive

pytestmark = pytest.mark.full


def _loss(fn):
    """sum(op * cos-weighting): a non-degenerate fixed cotangent."""

    def wrapped(*args, **kw):
        out = fn(*args, **kw)
        w = jnp.cos(jnp.arange(out.shape[-1], dtype=jnp.float32))
        return jnp.sum(out * w)

    return wrapped


def _assert_grads(fused_fn, naive_fn, args, argnums, atol, rtol):
    gf = jax.grad(_loss(fused_fn), argnums=argnums)(*args)
    gn = jax.grad(_loss(naive_fn), argnums=argnums)(*args)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


def _mk_attn(B, QH, KH, QL, KL, E, *, pair=False, kpad=False, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    q = jax.random.normal(ks[0], (B, QH, QL, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, KH, KL, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, KH, KL, E), jnp.float32)
    p = jax.random.normal(ks[3], (B, QH, QL, KL), jnp.float32) if pair else None
    m = None
    if kpad:
        m = (jax.random.uniform(ks[4], (B, KL)) > 0.2).at[:, 0].set(True)
    return q, k, v, p, m


# attention_tests.jl:6-18: padmask x pair x E x (QL, KL), H=2, B=3
@pytest.mark.parametrize("kpad", [False, True])
@pytest.mark.parametrize("pair", [False, True])
@pytest.mark.parametrize("E", [16, 32, 64])
@pytest.mark.parametrize(
    "QL,KL",
    [(255, 255), (256, 256), (511, 511), (512, 512), (1024, 1024),
     (255, 511), (512, 255), (1024, 256)],
)
def test_attention_full(kpad, pair, E, QL, KL):
    q, k, v, p, m = _mk_attn(3, 2, 2, QL, KL, E, pair=pair, kpad=kpad)
    got = flash_attention(q, k, v, p, kpad_mask=m)
    want = naive.naive_attention(q, k, v, p, kpad_mask=m)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    argnums = (0, 1, 2, 3) if pair else (0, 1, 2)
    _assert_grads(
        lambda q, k, v, p=None: flash_attention(q, k, v, p, kpad_mask=m),
        lambda q, k, v, p=None: naive.naive_attention(q, k, v, p, kpad_mask=m),
        (q, k, v, p)[: len(argnums)], argnums, 2e-3, 2e-3,
    )


# causal_attention_tests.jl:6-16
@pytest.mark.parametrize("kpad", [False, True])
@pytest.mark.parametrize("pair", [False, True])
@pytest.mark.parametrize("E", [16, 32, 64])
@pytest.mark.parametrize("L", [255, 256, 511, 512, 1024])
def test_causal_attention_full(kpad, pair, E, L):
    q, k, v, p, m = _mk_attn(3, 2, 2, L, L, E, pair=pair, kpad=kpad)
    got = flash_attention(q, k, v, p, causal=True, kpad_mask=m)
    want = naive.naive_attention(q, k, v, p, causal=True, kpad_mask=m)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    argnums = (0, 1, 2, 3) if pair else (0, 1, 2)
    _assert_grads(
        lambda q, k, v, p=None: flash_attention(
            q, k, v, p, causal=True, kpad_mask=m
        ),
        lambda q, k, v, p=None: naive.naive_attention(
            q, k, v, p, causal=True, kpad_mask=m
        ),
        (q, k, v, p)[: len(argnums)], argnums, 2e-3, 2e-3,
    )


# gqa_attention_tests.jl:6-18
@pytest.mark.parametrize("QH", [4, 6, 8])
@pytest.mark.parametrize("KH", [1, 2])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("E", [32, 64])
@pytest.mark.parametrize("L", [255, 256, 257, 512])
def test_gqa_full(QH, KH, causal, E, L):
    q, k, v, _, _ = _mk_attn(2, QH, KH, L, L, E)
    got = flash_attention(q, k, v, causal=causal)
    want = naive.naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
    _assert_grads(
        lambda q, k, v: flash_attention(q, k, v, causal=causal),
        lambda q, k, v: naive.naive_attention(q, k, v, causal=causal),
        (q, k, v), (0, 1, 2), 2e-3, 2e-3,
    )


# softmax_tests.jl:12-16
@pytest.mark.parametrize("seq", [32, 33, 63, 255, 256, 511, 512, 513, 1024])
def test_softmax_full(seq):
    x = jax.random.normal(jax.random.key(0), (4, seq), jnp.float32)
    np.testing.assert_allclose(
        online_softmax(x), naive.naive_softmax(x), atol=1e-6, rtol=1e-6
    )
    _assert_grads(online_softmax, naive.naive_softmax, (x,), (0,), 1e-5, 1e-4)


# rmsnorm_tests.jl:11-17 / layernorm_tests.jl:13-17
@pytest.mark.parametrize("emb", [15, 255, 256, 257, 511, 512, 513, 1024])
@pytest.mark.parametrize("n", [1, 2, 4, 15, 16, 17, 23, 25])
def test_norms_full(emb, n):
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (n, emb), jnp.float32)
    w = jax.random.normal(ks[1], (emb,), jnp.float32)
    b = jax.random.normal(ks[2], (emb,), jnp.float32)
    for offset in (0.0, 1.0):
        np.testing.assert_allclose(
            rms_norm(x, w, 1e-6, offset),
            naive.naive_rms_norm(x, w, offset=offset),
            atol=1e-6, rtol=1e-5,
        )
        _assert_grads(
            lambda x, w: rms_norm(x, w, 1e-6, offset),
            lambda x, w: naive.naive_rms_norm(x, w, offset=offset),
            (x, w), (0, 1), 1e-4, 1e-3,
        )
    np.testing.assert_allclose(
        layer_norm(x, w, b), naive.naive_layer_norm(x, w, b),
        atol=1e-5, rtol=1e-5,
    )
    _assert_grads(
        layer_norm, naive.naive_layer_norm, (x, w, b), (0, 1, 2), 1e-4, 1e-3
    )


# rope_tests.jl:21-27
@pytest.mark.parametrize("L", [13, 255, 256, 257, 1024, 1025])
@pytest.mark.parametrize("QH", [1, 3, 4, 5])
@pytest.mark.parametrize("KH", [1, 3, 4, 5])
def test_rope_full(L, QH, KH):
    ks = jax.random.split(jax.random.key(0), 2)
    q = jax.random.normal(ks[0], (2, QH, L, 16), jnp.float32)
    k = jax.random.normal(ks[1], (2, KH, L, 16), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (2, L))
    cos, sin = RotaryEmbedding(16)(pos)
    qo, ko = llama_rope(q, k, cos, sin)
    qn, kn = naive.naive_rope(q, k, cos, sin)
    np.testing.assert_allclose(qo, qn, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(ko, kn, atol=1e-6, rtol=1e-5)

    def loss2(fn):
        def f(q, k):
            qo, ko = fn(q, k, cos, sin)
            wl = jnp.cos(jnp.arange(qo.shape[-1], dtype=jnp.float32))
            return jnp.sum(qo * wl) + jnp.sum(ko * wl * 0.5)
        return f

    gf = jax.grad(loss2(llama_rope), argnums=(0, 1))(q, k)
    gn = jax.grad(loss2(naive.naive_rope), argnums=(0, 1))(q, k)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)
