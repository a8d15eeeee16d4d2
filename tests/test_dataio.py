"""Data pipeline: packing, batching, device prefetch, end-to-end train
loop on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np

from nnop_tpu.runtime.dataio import batches, pack_tokens, prefetch_to_device


def test_pack_shapes_and_targets():
    streams = [[1, 2, 3, 4, 5], [6, 7, 8], [9] * 20]
    rows = pack_tokens(streams, seq_len=8, eos_id=0)
    assert rows.shape[1] == 9
    # every row's columns 1..L equal the next row slice semantics:
    toks, tgts = next(batches(rows, 2, shuffle=False))
    np.testing.assert_array_equal(toks[:, 1:], tgts[:, :-1])


def test_batches_cover_epoch():
    rows = pack_tokens([[i] * 50 for i in range(20)], seq_len=16)
    n = rows.shape[0]
    seen = 0
    for toks, tgts in batches(rows, 4):
        assert toks.shape == (4, 16) and tgts.shape == (4, 16)
        seen += 4
    assert seen == (n // 4) * 4


def test_prefetch_device():
    rows = pack_tokens([[i % 100 for i in range(500)]], seq_len=32)
    out = list(prefetch_to_device(batches(rows, 2)))
    assert len(out) > 0
    assert isinstance(out[0][0], jax.Array)


def test_train_loop_end_to_end():
    """Tiny LM overfits a repeating pattern: loss must drop sharply."""
    from nnop_tpu.models.llama import LlamaConfig, init_params, loss_fn

    cfg = LlamaConfig.tiny(dtype=jnp.float32, n_layers=1, vocab_size=32)
    params = init_params(jax.random.key(0), cfg)
    pattern = list(range(8)) * 200
    rows = pack_tokens([pattern], seq_len=32)

    from nnop_tpu.parallel.tp_llama import AdamW

    opt = AdamW(lr=3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state, toks, tgts):
        loss, grads = jax.value_and_grad(loss_fn)(params, toks, tgts, cfg)
        params, state = opt.update(grads, state, params)
        return params, state, loss

    losses = []
    for epoch in range(6):
        for toks, tgts in batches(rows, 4, seed=epoch):
            params, state, loss = step(
                params, state, jnp.asarray(toks), jnp.asarray(tgts)
            )
            losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])


def test_segmented_packing_blocks_cross_doc_attention():
    """Packed-document training: forward with segment_ids + per-doc
    positions gives each document EXACTLY the logits it gets alone."""
    import jax
    import jax.numpy as jnp

    from nnop_tpu.models.llama import LlamaConfig, forward, init_params
    from nnop_tpu.runtime.dataio import pack_tokens_segmented

    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)

    doc_a = [5, 17, 42, 7, 99, 3, 12, 77]      # 8 tokens + EOS = 9
    doc_b = [9, 4, 88, 21, 33, 2, 64]          # 7 tokens + EOS = 8
    rows, segs, poss = pack_tokens_segmented([doc_a, doc_b], seq_len=16,
                                             eos_id=0)
    assert rows.shape == (1, 17)
    tokens = jnp.asarray(rows[:, :16])
    seg = jnp.asarray(segs[:, :16])
    pos = jnp.asarray(poss[:, :16])

    with jax.default_matmul_precision("highest"):
        packed = forward(params, tokens, cfg, positions=pos,
                         segment_ids=seg)
        alone_b = forward(
            params, jnp.asarray([doc_b + [0]], jnp.int32)[:, :8], cfg
        )
    # doc_b occupies packed positions 9..15 (7 tokens)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(packed[0, 9:16]), np.asarray(alone_b[0, :7]),
        atol=1e-5, rtol=1e-5,
    )
