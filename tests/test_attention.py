"""Flash attention fwd parity vs naive — grids from
/root/reference/test/attention_tests.jl:6-18 (padmask × pair × E × QL/KL
sweep incl. cross-attention), trimmed for interpret-mode runtime; full
sweep under -m full."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnop_tpu import flash_attention
from nnop_tpu.ops.naive import naive_attention

ATOL = 1e-3  # attention_tests.jl:42-48 tolerance
RTOL = 1e-3


def _mk(B, QH, KH, QL, KL, E, *, pair=False, kpad=False, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    q = jax.random.normal(ks[0], (B, QH, QL, E), dtype)
    k = jax.random.normal(ks[1], (B, KH, KL, E), dtype)
    v = jax.random.normal(ks[2], (B, KH, KL, E), dtype)
    p = jax.random.normal(ks[3], (B, QH, QL, KL), dtype) if pair else None
    m = None
    if kpad:
        m = jax.random.uniform(ks[4], (B, KL)) > 0.2
        # ensure no row is fully masked
        m = m.at[:, 0].set(True)
    return q, k, v, p, m


@pytest.mark.parametrize("E", [16, 32, 64])
@pytest.mark.parametrize("QL,KL", [(255, 255), (256, 256), (511, 512), (512, 511)])
def test_attention_shapes(E, QL, KL):
    q, k, v, _, _ = _mk(3, 2, 2, QL, KL, E)
    got = flash_attention(q, k, v)
    want = naive_attention(q, k, v)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("pair", [False, True])
@pytest.mark.parametrize("kpad", [False, True])
def test_attention_masks(pair, kpad):
    q, k, v, p, m = _mk(3, 2, 2, 256, 320, 32, pair=pair, kpad=kpad)
    got = flash_attention(q, k, v, p, kpad_mask=m)
    want = naive_attention(q, k, v, p, kpad_mask=m)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("L", [255, 256, 511])
@pytest.mark.parametrize("pair", [False, True])
def test_attention_causal(L, pair):
    # causal grid from causal_attention_tests.jl:6-16 (QL == KL)
    q, k, v, p, _ = _mk(3, 2, 2, L, L, 32, pair=pair)
    got = flash_attention(q, k, v, p, causal=True)
    want = naive_attention(q, k, v, p, causal=True)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("QH,KH", [(4, 1), (4, 2), (6, 2), (8, 2)])
@pytest.mark.parametrize("causal", [False, True])
def test_attention_gqa(QH, KH, causal):
    # gqa grid from gqa_attention_tests.jl:6-18
    q, k, v, _, _ = _mk(2, QH, KH, 257, 257, 32)
    got = flash_attention(q, k, v, causal=causal)
    want = naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_attention_bf16():
    q, k, v, _, _ = _mk(2, 2, 2, 256, 256, 64, dtype=jnp.bfloat16)
    got = flash_attention(q, k, v, causal=True).astype(jnp.float32)
    want = naive_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True,
    )
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_attention_scale_kwarg():
    q, k, v, _, _ = _mk(1, 2, 2, 128, 128, 32)
    got = flash_attention(q, k, v, scale=0.5)
    want = naive_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_attention_validation():
    q, k, v, _, _ = _mk(1, 3, 2, 64, 64, 32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v)  # 3 % 2 != 0
    q, k, v, _, _ = _mk(1, 2, 2, 64, 64, 32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v[:, :, :32])  # k/v shape mismatch


def test_chunked_prefill_matches_full_causal():
    """flash_attention_chunked with causal_offset reproduces the rows
    [off, off+CL) of a full causal attention."""
    from nnop_tpu.ops.flash_attention import flash_attention_chunked

    B, H, L, E = 2, 2, 384, 32
    q, k, v, _, _ = _mk(B, H, H, L, L, E)
    full = flash_attention(q, k, v, causal=True)
    off, CL = 128, 128
    kpad = jnp.broadcast_to(jnp.arange(L) < off + CL, (B, L))
    chunk = flash_attention_chunked(
        q[:, :, off : off + CL], k, v,
        causal_offset=jnp.int32(off), kpad_mask=kpad,
    )
    np.testing.assert_allclose(
        chunk, full[:, :, off : off + CL], atol=ATOL, rtol=RTOL
    )


def test_chunked_prefill_offset_zero_matches_causal():
    from nnop_tpu.ops.flash_attention import flash_attention_chunked

    q, k, v, _, _ = _mk(1, 2, 2, 256, 256, 32)
    got = flash_attention_chunked(q, k, v, causal_offset=jnp.int32(0))
    want = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("causal", [False, True])
def test_attention_segment_ids(causal):
    """Multi-document packing: only same-segment positions attend."""
    B, H, L, E = 2, 2, 256, 32
    q, k, v, _, _ = _mk(B, H, H, L, L, E)
    seg = jnp.cumsum(
        jax.random.bernoulli(jax.random.key(7), 0.02, (B, L)), axis=1
    ).astype(jnp.int32)
    got = flash_attention(q, k, v, causal=causal, segment_ids=(seg, seg))
    want = naive_attention(q, k, v, causal=causal, segment_ids=(seg, seg))
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


@pytest.mark.parametrize("E", [48, 80])
def test_attention_nonpow2_head_dim(E):
    """Non-pow2 head dims run via lane padding (the reference errors on
    these, attention.jl:143); fwd + grads match naive."""
    B, H, L = 2, 2, 128
    ks = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(ks[0], (B, H, L, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, E), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, L, E), jnp.float32)
    with jax.default_matmul_precision("highest"):
        got = flash_attention(q, k, v, causal=True)
        want = naive_attention(q, k, v, causal=True)
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)

        def loss(fn):
            return lambda *a: jnp.sum(jnp.cos(fn(*a, causal=True)))

        gf = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
        gn = jax.grad(loss(naive_attention), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


# ---- round 3: static fast-path coverage (chunked / windowed / featureful
# strips) — these shapes force the new dispatch paths explicitly ----


def test_causal_chunked_long_context():
    """QL/bq > strip-call cap -> chunk-diagonal strips + off-diagonal
    rectangles merged via the (o, lse) monoid (_fwd_causal_chunked)."""
    from nnop_tpu.ops import flash_attention as fa

    q, k, v, _, _ = _mk(2, 4, 2, 2048, 2048, 64)
    # bq=64 -> 32 q blocks > _CAUSAL_STRIP_MAX_CALLS; chunk = 1024
    o_c, lse_c = fa._fwd_causal_chunked(q, k, v, 64 ** -0.5, None, 64, 1024)
    want = naive_attention(q, k, v, causal=True)
    np.testing.assert_allclose(o_c, want, atol=ATOL, rtol=RTOL)
    # lse matches the rect pipeline's residual
    _, lse_r = fa._fwd_impl(
        q, k, v, None, None, True, 64 ** -0.5, block_q=256, block_k=512
    )
    np.testing.assert_allclose(lse_c, lse_r, atol=1e-3, rtol=1e-4)


def test_causal_chunked_streamed_rectangles(monkeypatch):
    """Oversized off-diagonal prefixes stream as equal-width
    sub-rectangles merged via lse_merge (r5: the _CHUNKED_RECT_KV_BYTES
    dispatch gate became a per-sub-window width cap). A tiny cap forces
    n_sub > 1 (incl. the prime-c width-one degenerate) at test scale."""
    from nnop_tpu.ops import flash_attention as fa

    q, k, v, _, _ = _mk(2, 4, 2, 4096, 4096, 64)
    # chunk=1024 -> n_c=4; cap 2^19 admits one 1024-wide (K+V double-
    # buffered) sub-window at E=64 f32 -> c=2 splits 2x1024, c=3 (prime)
    # streams 3x1024
    monkeypatch.setattr(fa, "_CHUNKED_RECT_KV_BYTES", 4 * 1024 * 64 * 4)
    assert fa._rect_split(2, 1024, 64, 4) == 2
    assert fa._rect_split(3, 1024, 64, 4) == 3
    o_c, _ = fa._fwd_causal_chunked(q, k, v, 64 ** -0.5, None, 64, 1024)
    want = naive_attention(q, k, v, causal=True)
    np.testing.assert_allclose(o_c, want, atol=ATOL, rtol=RTOL)


def test_chunked_dispatch_serves_any_aligned_length(monkeypatch):
    """The public dispatcher keeps long-L causal on the chunked path even
    when the full prefix blows the old VMEM gate (r5), including a
    non-power-of-two L. Strip caps are shrunk so the strip path rejects
    a CPU-testable L and dispatch genuinely crosses into chunked."""
    from nnop_tpu.ops import flash_attention as fa

    monkeypatch.setattr(fa, "_CAUSAL_STRIP_MAX_CALLS", 4)
    monkeypatch.setattr(fa, "_CHUNKED_RECT_KV_BYTES", 4 * 1024 * 64 * 4)
    called = {}
    real = fa._fwd_causal_chunked

    def spy(*a, **kw):
        called["chunk"] = a[6]
        return real(*a, **kw)

    monkeypatch.setattr(fa, "_fwd_causal_chunked", spy)
    q, k, v, _, _ = _mk(1, 2, 1, 5120, 5120, 64)  # L = 5 * 1024
    got = flash_attention(q, k, v, causal=True)
    want = naive_attention(q, k, v, causal=True)
    # bq=512 -> 10 q-blocks > 4-call cap; chunk=1024 divides 5120; the
    # monkeypatched width cap forces streamed prefixes for c >= 2
    assert called.get("chunk") == 1024
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_window_stacked_path():
    """num_q > kw/bq - 1 -> head strips + ONE stacked-KV pallas_call
    (_fwd_causal_window); parity incl. GQA and the dq grad."""
    q, k, v, _, _ = _mk(2, 4, 2, 2048, 2048, 64)
    for w in (300, 512, 1000):
        got = flash_attention(q, k, v, causal=True, window=w)
        want = naive_attention(q, k, v, causal=True, window=w)
        np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)
    gf = jax.grad(
        lambda a: jnp.sum(flash_attention(a, k, v, causal=True, window=700))
    )(q)
    gn = jax.grad(
        lambda a: jnp.sum(naive_attention(a, k, v, causal=True, window=700))
    )(q)
    np.testing.assert_allclose(gf, gn, atol=ATOL, rtol=RTOL)


def test_featureful_strips():
    """kpad + segments + softcap now ride the static strip kernels
    (L=2048, bq=512 -> 4 strip calls with mask passes)."""
    q, k, v, _, kpad = _mk(2, 4, 2, 2048, 2048, 64, kpad=True)
    seg = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 512)[None, :].repeat(2, 0)
    # keep every segment's first key valid: a fully-masked row is 0 by
    # policy in the fused kernels but uniform-softmax garbage in naive
    kpad = kpad.at[:, ::512].set(True)
    got = flash_attention(
        q, k, v, causal=True, segment_ids=(seg, seg), kpad_mask=kpad
    )
    want = naive_attention(
        q, k, v, causal=True, segment_ids=(seg, seg), kpad_mask=kpad
    )
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)
    got = flash_attention(q, k, v, causal=True, softcap=30.0)
    want = naive_attention(q, k, v, causal=True, softcap=30.0)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_chunked_gate_falls_back_beyond_vmem_budget(monkeypatch):
    """ADVICE r3 (medium): the chunked path's off-diagonal rectangles
    load the whole KV prefix as one VMEM block, so dispatch must fall
    back to the streaming pipeline once that block exceeds the budget —
    same numerics, no compile failure. Forced here by shrinking the
    budget instead of allocating 110k-token operands."""
    from nnop_tpu.ops import flash_attention as fa
    from nnop_tpu.ops import flash_attention_bwd as fab

    q, k, v, _, _ = _mk(1, 2, 1, 2048, 2048, 64)
    monkeypatch.setattr(fa, "_CAUSAL_STRIP_MAX_CALLS", 2)  # force chunked
    want = naive_attention(q, k, v, causal=True)
    got_chunked = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(got_chunked, want, atol=ATOL, rtol=RTOL)

    monkeypatch.setattr(fa, "_CHUNKED_RECT_KV_BYTES", 1)  # gate shut
    got_fallback = flash_attention(q, k, v, causal=True)
    np.testing.assert_allclose(got_fallback, want, atol=ATOL, rtol=RTOL)
    monkeypatch.setattr(fab, "_bwd_causal_chunked", None)  # must not be hit
    g = jax.grad(lambda a: jnp.sum(
        flash_attention(a, k, v, causal=True)))(q)
    gn = jax.grad(lambda a: jnp.sum(
        naive_attention(a, k, v, causal=True)))(q)
    np.testing.assert_allclose(g, gn, atol=ATOL, rtol=RTOL)


def test_window_stack_hbm_gate_falls_back(monkeypatch):
    """ADVICE r3: the stacked-window path's transient HBM copies are
    bounded; beyond the cap the general clamped-index pipeline serves
    the same numerics."""
    from nnop_tpu.ops import flash_attention as fa

    q, k, v, _, _ = _mk(2, 4, 2, 2048, 2048, 64)
    want = naive_attention(q, k, v, causal=True, window=700)
    monkeypatch.setattr(fa, "_WINDOW_STACK_HBM_BYTES", 1)
    got = flash_attention(q, k, v, causal=True, window=700)
    np.testing.assert_allclose(got, want, atol=ATOL, rtol=RTOL)


def test_causal_gstrips_parity():
    """Grouped causal strips (round 4: g adjacent q-blocks -> one call,
    g independent value-carried chains sharing the K/V stream) are
    bit-identical to the per-block strip multicall, incl. kpad +
    segments + softcap variants."""
    from nnop_tpu.ops import flash_attention as fa

    q, k, v, _, kpad = _mk(2, 4, 2, 2048, 2048, 64, kpad=True)
    scale = 64 ** -0.5
    o1, lse1 = fa._fwd_causal_multicall(q, k, v, scale, None, 512)
    for g in (2, 4):
        o2, lse2 = fa._fwd_causal_gstrips(q, k, v, scale, None, 512, g)
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(lse1, lse2)

    seg = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 512)[None, :].repeat(2, 0)
    kpad = kpad.at[:, ::512].set(True)
    for kw in (dict(kpad=kpad), dict(segment_ids=(seg, seg)),
               dict(softcap=30.0)):
        o1, lse1 = fa._fwd_causal_multicall(
            q, k, v, scale, None, 512, **kw)
        o2, lse2 = fa._fwd_causal_gstrips(
            q, k, v, scale, None, 512, 2, **kw)
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(lse1, lse2)
