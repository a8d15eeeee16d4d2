"""LoRA fine-tuning: zero-init equivalence, frozen base, gradient
structure, training progress, and merge-for-serving parity."""

import jax
import jax.numpy as jnp
import numpy as np

from nnop_tpu.models.llama import LlamaConfig, forward, init_params
from nnop_tpu.models.lora import (
    combine,
    init_lora,
    lora_loss_fn,
    lora_matmul,
    make_lora_train_step,
    merge_lora,
)

CFG = LlamaConfig.tiny(dtype=jnp.float32)


def _data(key, B=4, L=32):
    tokens = jax.random.randint(key, (B, L), 0, CFG.vocab_size)
    return tokens, jnp.roll(tokens, -1, axis=1)


def test_lora_zero_init_matches_base():
    """b = 0 at init -> LoRA forward == base forward exactly."""
    params = init_params(jax.random.key(0), CFG)
    adapters = init_lora(jax.random.key(1), CFG, rank=4)
    tokens, _ = _data(jax.random.key(2))
    want = forward(params, tokens, CFG)
    got = forward(combine(params, adapters), tokens, CFG,
                  matmul=lora_matmul)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_lora_grad_structure():
    """At init, dL/db != 0 (a is random) while dL/da == 0 (b is zero) —
    the defining LoRA gradient structure; and the base receives no
    gradient at all (it is not an argnum)."""
    params = init_params(jax.random.key(0), CFG)
    adapters = init_lora(jax.random.key(1), CFG, rank=4)
    tokens, targets = _data(jax.random.key(2))
    g = jax.grad(lora_loss_fn)(adapters, params, tokens, targets, CFG)
    ga = g["layers"][0]["wq"]["a"]
    gb = g["layers"][0]["wq"]["b"]
    assert float(jnp.max(jnp.abs(ga))) == 0.0
    assert float(jnp.max(jnp.abs(gb))) > 0.0


def test_lora_train_step_learns_and_freezes_base():
    params = init_params(jax.random.key(0), CFG)
    adapters = init_lora(jax.random.key(1), CFG, rank=8)
    tokens, targets = _data(jax.random.key(2))
    step, opt = make_lora_train_step(CFG)
    state = opt.init(adapters)

    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    losses = []
    for _ in range(8):
        adapters, state, loss = step(adapters, state, params, tokens,
                                     targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.1, losses
    # the base is bitwise-untouched (only the rank-sized adapters moved)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # adapter b actually moved off zero
    assert float(jnp.max(jnp.abs(adapters["layers"][0]["wq"]["b"]))) > 0


def test_merge_lora_matches_low_rank_forward():
    """merge_lora folds a@b into plain weights: the merged tree is a
    drop-in params pytree whose forward matches the low-rank-applied
    forward."""
    params = init_params(jax.random.key(0), CFG)
    adapters = init_lora(jax.random.key(1), CFG, rank=4)
    # make the update nonzero
    adapters = jax.tree.map(
        lambda x: x + 0.01 * jnp.ones_like(x), adapters
    )
    tokens, _ = _data(jax.random.key(2))
    with jax.default_matmul_precision("highest"):
        want = forward(combine(params, adapters), tokens, CFG,
                       matmul=lora_matmul)
        merged = merge_lora(params, adapters)
        got = forward(merged, tokens, CFG)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)
    # merged tree has plain array leaves only (serving drop-in)
    assert all(isinstance(x, jax.Array) for x in jax.tree.leaves(merged))


def test_lora_respects_targets():
    """Adapters only wrap requested targets; others stay plain."""
    params = init_params(jax.random.key(0), CFG)
    adapters = init_lora(jax.random.key(1), CFG, rank=4,
                         targets=("wq", "wv"))
    tree = combine(params, adapters)
    from nnop_tpu.models.lora import LoRAWeight

    l0 = tree["layers"][0]
    assert isinstance(l0["wq"], LoRAWeight)
    assert isinstance(l0["wv"], LoRAWeight)
    assert isinstance(l0["wo"], jax.Array)
    assert isinstance(l0["w_gate"], jax.Array)
