"""MoE layer: router, dispatch/combine, parity vs per-token oracle.

Mirrors the reference suite's naive-vs-fused oracle pattern (SURVEY.md
§4) for a north-star component the reference lacks entirely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu.models.llama import LlamaConfig, forward, init_params, loss_fn
from nnop_tpu.models.moe import (
    expert_capacity,
    load_balance_loss,
    make_dispatch,
    moe_mlp,
    moe_mlp_naive,
    router_topk,
)

CFG = LlamaConfig.tiny_moe()


def _moe_layer(key, cfg=CFG, dtype=jnp.float32):
    p = init_params(key, dataclassed(cfg, dtype=dtype))
    return p["layers"][0]


def dataclassed(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_router_topk_picks_argmax():
    h = jnp.eye(4, 8, dtype=jnp.float32) * 5.0  # token i favors expert i
    w_router = jnp.eye(8, 4, dtype=jnp.float32)
    w, idx, probs = router_topk(h, w_router, 2)
    assert idx.shape == (4, 2)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(4))
    # weights renormalized over the top-k
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=1)), 1.0, rtol=1e-6)


def test_make_dispatch_positions_and_drop():
    # 3 tokens, 2 experts, k=1: tokens 0,2 -> e0; token 1 -> e1
    idx = jnp.array([[0], [1], [0]], jnp.int32)
    w = jnp.ones((3, 1), jnp.float32)
    disp, comb = make_dispatch(idx, w, 2, capacity=2)
    d = np.asarray(disp)
    assert d[0, 0, 0] == 1  # token 0 -> expert 0 slot 0
    assert d[1, 1, 0] == 1  # token 1 -> expert 1 slot 0
    assert d[2, 0, 1] == 1  # token 2 -> expert 0 slot 1
    assert d.sum() == 3
    # capacity 1: token 2's assignment to expert 0 is dropped
    disp1, comb1 = make_dispatch(idx, w, 2, capacity=1)
    assert np.asarray(disp1).sum() == 2
    assert np.asarray(comb1)[2].sum() == 0.0


def test_expert_capacity():
    assert expert_capacity(256, 8, 2, None) == 256  # dropless
    c = expert_capacity(256, 8, 2, 1.25)
    assert c % 8 == 0 and 64 <= c <= 256
    assert expert_capacity(4, 8, 2, 1.0) == 8  # floor


@pytest.mark.parametrize("T,k", [(16, 1), (33, 2), (64, 3)])
def test_moe_mlp_vs_naive(T, k):
    cfg = dataclassed(CFG, n_experts_per_token=k, dtype=jnp.float32)
    layer = _moe_layer(jax.random.key(0), cfg)
    h = jax.random.normal(jax.random.key(1), (T, cfg.dim), jnp.float32)
    with jax.default_matmul_precision("highest"):
        got, aux = moe_mlp(layer, h, cfg, act=jax.nn.silu)
        want = moe_mlp_naive(layer, h, cfg, act=jax.nn.silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)
    assert float(aux) > 0.0


def test_moe_capacity_drops_are_zero_not_garbage():
    """Over-capacity tokens must contribute exactly zero (the residual
    carries them), not stale or mixed values."""
    cfg = dataclassed(CFG, capacity_factor=0.5, dtype=jnp.float32)
    layer = _moe_layer(jax.random.key(0), cfg)
    # route ALL tokens to one expert by biasing the router
    layer = dict(layer)
    layer["w_router"] = jnp.zeros_like(layer["w_router"]).at[:, 0].set(10.0)
    T = 32
    h = jax.random.normal(jax.random.key(1), (T, cfg.dim), jnp.float32)
    out, _ = moe_mlp(layer, h, cfg, act=jax.nn.silu)
    C = expert_capacity(T, cfg.n_experts, cfg.n_experts_per_token, 0.5)
    # tokens beyond both experts' capacity produce exactly 0
    n_served = 2 * C  # top-2 -> first C tokens on each of 2 experts
    if n_served < T:
        np.testing.assert_array_equal(np.asarray(out[n_served:]), 0.0)


def test_load_balance_loss_uniform_is_one():
    T, E, k = 512, 4, 1
    probs = jnp.full((T, E), 1.0 / E)
    idx = (jnp.arange(T, dtype=jnp.int32) % E)[:, None]
    assert abs(float(load_balance_loss(probs, idx, E)) - 1.0) < 1e-5


def test_moe_forward_and_grad():
    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 16), 0,
                                cfg.vocab_size)
    logits = forward(params, tokens, cfg)
    assert logits.shape == (2, 16, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))

    targets = jnp.roll(tokens, -1, axis=1)
    loss, grads = jax.value_and_grad(loss_fn)(params, tokens, targets, cfg)
    assert np.isfinite(float(loss))
    gnorm = jax.tree.reduce(
        lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0.0
    # the router weight must receive gradient (it only gets one through
    # the combine weights — a classic silent-failure spot)
    rg = grads["layers"][0]["w_router"]
    assert float(jnp.sum(jnp.abs(rg))) > 0.0


# ---------------------------------------------------------------------------
# grouped (expert-sorted) Pallas path: ops/grouped_matmul.py


def test_grouped_matmul_vs_dense():
    """grouped_matmul == per-block dense matmul with that block's expert."""
    from nnop_tpu.ops.grouped_matmul import grouped_matmul

    E, K, N, bm = 3, 96, 160, 8  # ragged K/N tails on purpose
    Tp = 5 * bm
    keys = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(keys[0], (Tp, K), jnp.float32)
    w = jax.random.normal(keys[1], (E, K, N), jnp.float32) * 0.1
    bg = jnp.array([0, 0, 1, 2, 2], jnp.int32)
    with jax.default_matmul_precision("highest"):
        got = grouped_matmul(x, w, bg, block_m=bm)
        want = jnp.concatenate(
            [x[i * bm:(i + 1) * bm] @ w[int(bg[i])] for i in range(5)]
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_grouped_matmul_grads():
    """custom_vjp dx/dw == autodiff through the dense formulation
    (including empty experts, whose dw must be exactly zero)."""
    from nnop_tpu.ops.grouped_matmul import grouped_matmul

    E, K, N, bm = 4, 64, 96, 8
    Tp = 4 * bm
    keys = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(keys[0], (Tp, K), jnp.float32)
    w = jax.random.normal(keys[1], (E, K, N), jnp.float32) * 0.1
    bg = jnp.array([0, 0, 2, 2], jnp.int32)  # experts 1, 3 empty

    def dense(x, w):
        sel = w[bg]  # (blocks, K, N)
        xb = x.reshape(4, bm, K)
        return jnp.einsum("bmk,bkn->bmn", xb, sel).reshape(Tp, N)

    t = jax.random.normal(keys[2], (Tp, N), jnp.float32)
    with jax.default_matmul_precision("highest"):
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(grouped_matmul(x, w, bg, block_m=bm) * t),
            argnums=(0, 1),
        )(x, w)
        nx, nw = jax.grad(
            lambda x, w: jnp.sum(dense(x, w) * t), argnums=(0, 1)
        )(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(nx),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(nw),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(gw[1]), 0.0)
    np.testing.assert_array_equal(np.asarray(gw[3]), 0.0)


def test_sort_tokens_by_expert_layout():
    from nnop_tpu.models.moe import sort_tokens_by_expert

    idx = jnp.array([[1], [0], [1], [1]], jnp.int32)  # T=4, k=1
    src, dest, bg, Tp, order = sort_tokens_by_expert(idx, n_experts=2,
                                                     block_m=8)
    assert Tp % 8 == 0
    d, s = np.asarray(dest), np.asarray(src)
    # expert 0's token (token 1) lands in block 0; expert 1's tokens in
    # the next block_m-aligned region
    assert d[list(s).index(1)] < 8
    assert all(x >= 8 for t, x in zip(s, d) if t != 1)
    # block_groups non-decreasing
    b = np.asarray(bg)
    assert (np.diff(b) >= 0).all()


@pytest.mark.parametrize("T,k", [(16, 2), (50, 3)])
def test_moe_grouped_matches_einsum(T, k):
    cfg = dataclassed(CFG, n_experts_per_token=k, dtype=jnp.float32)
    layer = _moe_layer(jax.random.key(0), cfg)
    h = jax.random.normal(jax.random.key(1), (T, cfg.dim), jnp.float32)
    with jax.default_matmul_precision("highest"):
        want, aux_w = moe_mlp(layer, h, cfg, act=jax.nn.silu)
        got, aux_g = moe_mlp(layer, h, cfg, act=jax.nn.silu, impl="grouped")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(aux_g), float(aux_w), rtol=1e-6)


def test_moe_grouped_grads_match_einsum():
    from nnop_tpu.models.moe import moe_mlp_grouped

    cfg = dataclassed(CFG, dtype=jnp.float32)
    layer = _moe_layer(jax.random.key(0), cfg)
    T = 24
    h = jax.random.normal(jax.random.key(1), (T, cfg.dim), jnp.float32)
    t = jax.random.normal(jax.random.key(2), (T, cfg.dim), jnp.float32)

    def loss(fn):
        def f(layer, h):
            out, aux = fn(layer, h, cfg, act=jax.nn.silu)
            return jnp.sum(out * t) + aux
        return f

    with jax.default_matmul_precision("highest"):
        gw = jax.grad(loss(moe_mlp), argnums=(0, 1))(layer, h)
        gg = jax.grad(loss(moe_mlp_grouped), argnums=(0, 1))(layer, h)
    for name in ("w_router", "w_gate", "w_up", "w_down"):
        np.testing.assert_allclose(
            np.asarray(gg[0][name]), np.asarray(gw[0][name]),
            atol=2e-5, rtol=2e-4, err_msg=name,
        )
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gw[1]),
                               atol=2e-5, rtol=2e-4)


def test_moe_forward_grouped_impl():
    """Full model forward with cfg.moe_impl='grouped' matches einsum."""
    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    tokens = jax.random.randint(jax.random.key(1), (2, 16), 0,
                                cfg.vocab_size)
    with jax.default_matmul_precision("highest"):
        want = forward(params, tokens, cfg)
        got = forward(params, tokens, dataclassed(cfg, moe_impl="grouped"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)


def test_grouped_matmul_quantized():
    """INT8 grouped matmul == dequantized-reference grouped matmul."""
    from nnop_tpu.ops.grouped_matmul import (
        grouped_matmul, grouped_matmul_quantized,
    )
    from nnop_tpu.ops.quantization import dequantize, quantize

    E, K, N, bm = 3, 128, 256, 8
    Tp = 4 * bm
    keys = jax.random.split(jax.random.key(5), 2)
    x = jax.random.normal(keys[0], (Tp, K), jnp.float32)
    w = jax.random.normal(keys[1], (E, K, N), jnp.float32) * 0.1
    wq = quantize(w, axis=1)
    bg = jnp.array([0, 1, 1, 2], jnp.int32)
    with jax.default_matmul_precision("highest"):
        got = grouped_matmul_quantized(x, wq, bg, block_m=bm)
        want = grouped_matmul(
            x, dequantize(wq).astype(jnp.float32), bg, block_m=bm
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)


def test_grouped_matmul_w8a8_exact():
    """W8A8 grouped matmul == exact integer reference (int32 accum)."""
    from nnop_tpu.ops.grouped_matmul import grouped_matmul_w8a8
    from nnop_tpu.ops.quantization import quantize
    from nnop_tpu.ops.quantized_matmul import quantize_act

    E, K, N, bm = 3, 200, 256, 8
    Tp = 4 * bm
    keys = jax.random.split(jax.random.key(6), 2)
    x = jax.random.normal(keys[0], (Tp, K), jnp.float32)
    w = jax.random.normal(keys[1], (E, K, N), jnp.float32) * 0.1
    wq = quantize(w, axis=1)
    bg = jnp.array([0, 1, 1, 2], jnp.int32)
    got = grouped_matmul_w8a8(x, wq, bg, block_m=bm, block_k=128)
    xq, xs = quantize_act(x)
    expert_of_row = np.repeat(np.asarray(bg), bm)
    want = np.stack([
        (np.asarray(xq[i], np.int64) @
         np.asarray(wq.values[expert_of_row[i]], np.int64)).astype(np.float64)
        * float(xs[i, 0]) * np.asarray(wq.scale[expert_of_row[i]], np.float64)
        for i in range(Tp)
    ])
    np.testing.assert_allclose(np.asarray(got, np.float64), want,
                               rtol=1e-5, atol=1e-5)
    # close to the fp reference too (act rounding only)
    from nnop_tpu.ops.grouped_matmul import grouped_matmul
    ref = grouped_matmul(x, w, bg, block_m=bm)
    rel = np.linalg.norm(np.asarray(got) - np.asarray(ref)) / np.linalg.norm(
        np.asarray(ref))
    assert rel < 0.02


# ---------------------------------------------------------------------------
# quantized MoE (int8 stacked experts) + engine serving


def test_quantized_moe_forward_close_to_fp():
    from nnop_tpu.models.quantized import qmatmul, quantize_params

    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    qparams = quantize_params(params)
    tokens = jax.random.randint(jax.random.key(1), (2, 16), 0,
                                cfg.vocab_size)
    want = forward(params, tokens, cfg)
    got = forward(qparams, tokens, cfg, matmul=qmatmul)
    # int8 per-channel weight noise; compare argmax agreement + scale
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.15, rel
    agree = float(jnp.mean(
        (jnp.argmax(got, -1) == jnp.argmax(want, -1)).astype(jnp.float32)
    ))
    assert agree >= 0.8, agree


def test_engine_serves_moe():
    """Engine greedy decode on a tiny MoE model matches the full-forward
    argmax chain (fp weights, grouped expert path in the decode loop)."""
    from nnop_tpu.runtime.engine import Engine

    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)

    prompt = [5, 17, 42, 7, 99, 3]
    toks, out = list(prompt), []
    for _ in range(6):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)

    eng = Engine(params, cfg, max_batch=2, max_seq=64)
    req = eng.submit(prompt, max_new_tokens=6)
    eng.run()
    assert req.done
    assert req.out == out, (req.out, out)


def test_engine_serves_quantized_moe():
    """Engine decode with int8 experts (grouped_matmul_quantized in the
    chunk loop) stays on-distribution vs the fp reference."""
    from nnop_tpu.models.quantized import quantize_params
    from nnop_tpu.runtime.engine import Engine

    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    qparams = quantize_params(params)

    prompt = [5, 17, 42, 7, 99, 3]
    toks, out = list(prompt), []
    for _ in range(6):
        logits = forward(params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)

    eng = Engine(qparams, cfg, max_batch=2, max_seq=64)
    req = eng.submit(prompt, max_new_tokens=6)
    eng.run()
    assert req.done
    agree = sum(a == b for a, b in zip(req.out, out)) / len(out)
    assert agree >= 0.5, (req.out, out)


def test_spec_engine_moe_matches_plain_greedy():
    """Speculative decoding over a MoE model: byte-identical greedy
    stream (verify path exercises the grouped expert MLP at T>1)."""
    from nnop_tpu.runtime.engine import Engine

    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    prompt = [5, 17, 42, 7, 5, 17, 42, 7]

    plain = Engine(params, cfg, max_batch=2, max_seq=96, chunk_size=4)
    r0 = plain.submit(prompt, max_new_tokens=10)
    plain.run()

    spec = Engine(params, cfg, max_batch=2, max_seq=96, chunk_size=4,
                  spec_k=2)
    r1 = spec.submit(prompt, max_new_tokens=10)
    spec.run()
    assert r0.done and r1.done
    assert r1.out == r0.out, (r1.out, r0.out)


def test_paged_engine_moe_matches_contiguous():
    from nnop_tpu.runtime.engine import Engine

    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    prompt = [9, 3, 1, 4, 1, 5]

    cont = Engine(params, cfg, max_batch=2, max_seq=256)
    r0 = cont.submit(prompt, max_new_tokens=8)
    cont.run()
    paged = Engine(params, cfg, max_batch=2, max_seq=256, paged=True,
                   page_size=128)
    r1 = paged.submit(prompt, max_new_tokens=8)
    paged.run()
    assert r0.done and r1.done
    assert r1.out == r0.out, (r1.out, r0.out)


def test_grouped_matmul_int4():
    """INT4 grouped matmul == dense grouped matmul on the dequantized
    expert planes (exact: f32 path, same rounding)."""
    from nnop_tpu.ops.grouped_matmul import (
        _grouped_matmul_q4, grouped_matmul, quantize4_experts,
    )
    from nnop_tpu.ops.quantization import dequantize4

    E, K, N, bm = 3, 256, 384, 8
    Tp = 4 * bm
    keys = jax.random.split(jax.random.key(6), 2)
    x = jax.random.normal(keys[0], (Tp, K), jnp.float32)
    w = jax.random.normal(keys[1], (E, K, N), jnp.float32) * 0.05
    wq = quantize4_experts(w, group=128, pack_block=256)
    bg = jnp.array([0, 1, 1, 2], jnp.int32)
    deq = jax.vmap(dequantize4)(wq)
    with jax.default_matmul_precision("highest"):
        got = _grouped_matmul_q4(x, wq, bg, block_m=bm, block_n=384)
        want = grouped_matmul(x, deq, bg, block_m=bm)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-3)


def test_engine_serves_int4_moe():
    """Engine decode with packed int4 experts matches the greedy chain
    of the DEQUANTIZED model (same int4 values, XLA einsum path) — the
    oracle that isolates engine-path differences from quantization
    noise (random tiny weights compound int4 noise; NOTES.md)."""
    from nnop_tpu.models.quantized import quantize_params
    from nnop_tpu.ops.quantization import QTensor, QTensor4, dequantize
    from nnop_tpu.ops.quantization import dequantize4
    from nnop_tpu.runtime.engine import Engine

    cfg = dataclassed(CFG, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    qparams = quantize_params(params, wbits=4, group=64)

    def deq(leaf):
        if isinstance(leaf, QTensor4):
            if leaf.packed.ndim == 3:  # stacked experts
                return jax.vmap(dequantize4)(leaf)
            return dequantize4(leaf)
        if isinstance(leaf, QTensor):
            return dequantize(leaf)
        return leaf

    is_q = lambda x: isinstance(x, (QTensor, QTensor4))
    dq_params = jax.tree.map(deq, qparams, is_leaf=is_q)
    # int4 pads K; slice dequantized planes back to the true K
    def fix(dq, ref):
        return dq[..., : ref.shape[-2], :] if dq.shape != ref.shape else dq
    dq_params = jax.tree.map(
        lambda d, r: fix(d, r) if isinstance(d, jax.Array) else d,
        dq_params, params,
    )

    prompt = [5, 17, 42, 7, 99, 3]
    toks, out = list(prompt), []
    for _ in range(6):
        logits = forward(dq_params, jnp.asarray([toks], jnp.int32), cfg)
        nxt = int(jnp.argmax(logits[0, -1]))
        out.append(nxt)
        toks.append(nxt)

    eng = Engine(qparams, cfg, max_batch=2, max_seq=64)
    req = eng.submit(prompt, max_new_tokens=6)
    eng.run()
    assert req.done
    agree = sum(a == b for a, b in zip(req.out, out)) / len(out)
    assert agree >= 0.8, (req.out, out)
