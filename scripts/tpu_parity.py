"""On-chip parity suite: every featured kernel path, COMPILED through
Mosaic on the real TPU, vs naive XLA on the same chip (VERDICT r4 item 2
— the analogue of the reference running its full suite on real GPUs,
/root/reference/.buildkite/pipeline.yaml:2-35).

The CPU test suite runs these paths in interpret mode; this script is
the guard against Mosaic-compile-vs-interpret numerics divergence (and
against jaxlib bumps regressing compiled kernels). It samples every
dispatch family the 858-test suite covers:

  strips (kpad / segments / softcap / combined), windowed (stacked-KV),
  pair bias (+dpair), cross-attn, ragged L, non-pow2 E, bf16, grouped
  bwd (bit-parity + vs naive), chunked long-context fwd+bwd incl. the
  r5 STREAMED prefix rectangles, decode (fp / int8 / paged / staged /
  multi-token spec verify), qmm int8 / int4 / w8a8, grouped matmul
  (fwd + grads + int8), softmax / norms / rope.

f32 rows compare at matched MXU precision (fused precision="highest",
naive under jax.default_matmul_precision("highest")) — at default
precision both sides carry ~2e-3 of bf16-pass emulation noise.

Usage:  python scripts/tpu_parity.py [--budget 2400] [--no-md]
Writes TPU_PARITY.md (the committed result table). Reruns are cheap via
the repo-local persistent compile cache (.jax_cache/).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T0 = time.time()
ROWS = []  # (name, ok, err, tol, note)
BUDGET = [2400.0]


def left():
    return BUDGET[0] - (time.time() - T0)


def record(name, got, want, tol, note=""):
    got = np.asarray(jax.device_get(got), np.float32)
    want = np.asarray(jax.device_get(want), np.float32)
    denom = np.maximum(np.abs(want), 1.0)
    err = float(np.max(np.abs(got - want) / denom))
    ok = bool(err <= tol) and np.isfinite(got).all()
    ROWS.append((name, ok, err, tol, note))
    print(f"{'PASS' if ok else 'FAIL'} {name}: maxrelerr={err:.2e} "
          f"(tol {tol:.0e}) t+{time.time()-T0:.0f}s", flush=True)
    return ok


def skip(name, why):
    ROWS.append((name, None, None, None, why))
    print(f"SKIP {name}: {why}", flush=True)


def rnd(key, shape, dtype=jnp.float32):
    return jax.random.normal(jax.random.key(key), shape, dtype)


# ---------------------------------------------------------------- sections


def sec_attention_fwd():
    from nnop_tpu import flash_attention
    from nnop_tpu.ops.naive import naive_attention

    B, QH, KH, L, E = 2, 8, 2, 2048, 64
    q, k, v = rnd(0, (B, QH, L, E)), rnd(1, (B, KH, L, E)), rnd(2, (B, KH, L, E))
    kpad = (jax.random.uniform(jax.random.key(3), (B, L)) > 0.2).at[:, 0].set(True)
    seg = jnp.repeat(jnp.arange(4, dtype=jnp.int32), L // 4)[None].repeat(B, 0)
    kpad_seg = kpad.at[:, :: L // 4].set(True)
    pair = rnd(4, (B, QH, L, L)) * 0.1

    cases = [
        ("strips_causal", dict(causal=True)),
        ("strips_kpad", dict(causal=True, kpad_mask=kpad)),
        ("strips_segments", dict(causal=True, segment_ids=(seg, seg))),
        ("strips_softcap", dict(causal=True, softcap=30.0)),
        ("strips_kpad_seg",
         dict(causal=True, kpad_mask=kpad_seg, segment_ids=(seg, seg))),
        ("window300_stacked", dict(causal=True, window=300)),
        ("pair_bias", dict(causal=True, pair=pair)),
    ]
    with jax.default_matmul_precision("highest"):
        for name, kw in cases:
            if left() < 120:
                return skip(name, "budget")
            # large operands (the 268 MB pair tensor) must be jit ARGS,
            # not closure constants: baked-in constants blow the remote
            # compile service's request-size limit (HTTP 413)
            akw = {k_: v_ for k_, v_ in kw.items() if hasattr(v_, "shape")}
            skw = {k_: v_ for k_, v_ in kw.items() if k_ not in akw}
            got = jax.jit(lambda q, k, v, akw: flash_attention(
                q, k, v, precision="highest", **skw, **akw))(q, k, v, akw)
            want = jax.jit(lambda q, k, v, akw: naive_attention(
                q, k, v, **skw, **akw))(q, k, v, akw)
            record(f"attn_{name}", got, want, 1e-3)

        # cross-attention QL != KL
        q2 = rnd(5, (B, QH, 512, E))
        got = jax.jit(lambda a, b, c: flash_attention(
            a, b, c, precision="highest"))(q2, k, v)
        want = naive_attention(q2, k, v)
        record("attn_cross_512x2048", got, want, 1e-3)

        # ragged non-multiple L via kpad
        Lr = 1000
        qr, kr, vr = (rnd(6, (B, QH, Lr, E)), rnd(7, (B, KH, Lr, E)),
                      rnd(8, (B, KH, Lr, E)))
        mr = (jnp.arange(Lr)[None] < jnp.array([[977], [641]])).astype(bool)
        got = jax.jit(lambda a, b, c: flash_attention(
            a, b, c, causal=True, kpad_mask=mr, precision="highest"))(qr, kr, vr)
        want = naive_attention(qr, kr, vr, causal=True, kpad_mask=mr)
        record("attn_ragged_L1000", got, want, 1e-3)

        # non-pow2 head dim (lane padding path)
        qe, ke, ve = (rnd(9, (B, QH, 1024, 80)), rnd(10, (B, KH, 1024, 80)),
                      rnd(11, (B, KH, 1024, 80)))
        got = jax.jit(lambda a, b, c: flash_attention(
            a, b, c, causal=True, precision="highest"))(qe, ke, ve)
        want = naive_attention(qe, ke, ve, causal=True)
        record("attn_E80_lanepad", got, want, 1e-3)

    # bf16 end-to-end
    got = jax.jit(lambda a, b, c: flash_attention(a, b, c, causal=True))(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16))
    with jax.default_matmul_precision("highest"):
        want = naive_attention(q, k, v, causal=True)
    record("attn_bf16_causal", got.astype(jnp.float32), want, 3e-2)


def sec_attention_bwd():
    from nnop_tpu import flash_attention
    from nnop_tpu.ops import flash_attention_bwd as fab
    from nnop_tpu.ops.naive import naive_attention

    B, QH, KH, L, E = 1, 8, 2, 2048, 64
    q, k, v = rnd(20, (B, QH, L, E)), rnd(21, (B, KH, L, E)), rnd(22, (B, KH, L, E))
    with jax.default_matmul_precision("highest"):
        for name, kw in [("causal", dict(causal=True)),
                         ("window700", dict(causal=True, window=700)),
                         ("softcap", dict(causal=True, softcap=30.0))]:
            if left() < 150:
                return skip(f"attn_bwd_{name}", "budget")
            gf = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
                flash_attention(a, b, c, precision="highest", **kw)
                * jnp.cos(a[..., :1])), argnums=(0, 1, 2)))(q, k, v)
            gn = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
                naive_attention(a, b, c, **kw)
                * jnp.cos(a[..., :1])), argnums=(0, 1, 2)))(q, k, v)
            for g, w, nm in zip(gf, gn, "qkv"):
                record(f"attn_bwd_{name}_d{nm}", g, w, 2e-3)

        # pair bias gradient (dpair) — q/k/v as args, not constants
        pair = rnd(23, (B, QH, L, L)) * 0.1
        gp = jax.jit(jax.grad(lambda p, q, k, v: jnp.sum(flash_attention(
            q, k, v, p, causal=True, precision="highest"))))(pair, q, k, v)
        np_ = jax.jit(jax.grad(lambda p, q, k, v: jnp.sum(naive_attention(
            q, k, v, p, causal=True))))(pair, q, k, v)
        record("attn_bwd_dpair", gp, np_, 2e-3)

    # grouped bwd: gq=gk=2 vs ungrouped, BIT parity on-chip
    if left() < 150:
        return skip("grouped_bwd_bitparity", "budget")
    scale = E ** -0.5
    from nnop_tpu.ops.flash_attention import _fwd_impl
    o, lse = _fwd_impl(q, k, v, None, None, True, scale,
                       block_q=256, block_k=512)
    do = rnd(24, o.shape)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)
    f = jax.jit(lambda gq, gk: fab._bwd_causal_multicall(
        q, k, v, lse, delta, do, scale, "highest", 512, gq=gq, gk=gk),
        static_argnums=(0, 1))
    base = f(1, 1)
    grp = f(2, 2)
    for g, b, nm in zip(grp, base, "qkv"):
        record(f"grouped_bwd_bit_d{nm}", g, b, 1.2e-7,
               "gq=gk=2 vs ungrouped; exact in interpret, <=1 ulp compiled")


def sec_chunked():
    from nnop_tpu import flash_attention
    from nnop_tpu.ops import flash_attention as fa
    from nnop_tpu.ops.naive import naive_attention

    # real dispatch at L=16384 (QL/bq=32 > strip cap -> chunked)
    B, QH, KH, L, E = 1, 2, 1, 16384, 64
    q, k, v = rnd(30, (B, QH, L, E)), rnd(31, (B, KH, L, E)), rnd(32, (B, KH, L, E))
    if left() > 300:
        with jax.default_matmul_precision("highest"):
            got = jax.jit(lambda a, b, c: flash_attention(
                a, b, c, causal=True, precision="highest"))(q, k, v)
            want = jax.jit(lambda a, b, c: naive_attention(
                a, b, c, causal=True))(q, k, v)
        record("chunked_fwd_L16384", got, want, 1e-3)
    else:
        skip("chunked_fwd_L16384", "budget")

    # streamed prefix rectangles + grouped chunked bwd, forced at a
    # naive-oracle-affordable L by shrinking the caps (same code paths
    # the real 131k dispatch runs, compiled on-chip)
    if left() < 300:
        return skip("chunked_streamed*", "budget")
    old_calls, old_rect = fa._CAUSAL_STRIP_MAX_CALLS, fa._CHUNKED_RECT_KV_BYTES
    fa._CAUSAL_STRIP_MAX_CALLS = 2
    fa._CHUNKED_RECT_KV_BYTES = 4 * 1024 * 64 * 4  # one 1024-chunk window
    try:
        B, QH, KH, L = 1, 4, 2, 4096
        q, k, v = (rnd(33, (B, QH, L, E)), rnd(34, (B, KH, L, E)),
                   rnd(35, (B, KH, L, E)))
        assert fa._pick_chunk(L, 512, E, 4) == 1024
        with jax.default_matmul_precision("highest"):
            got = jax.jit(lambda a, b, c: flash_attention(
                a, b, c, causal=True, precision="highest"))(q, k, v)
            want = jax.jit(lambda a, b, c: naive_attention(
                a, b, c, causal=True))(q, k, v)
            record("chunked_streamed_fwd", got, want, 1e-3,
                   "prefixes split 2x/3x")
            gf = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
                flash_attention(a, b, c, causal=True, precision="highest")
                * jnp.cos(a[..., :1])), argnums=(0, 1, 2)))(q, k, v)
            gn = jax.jit(jax.grad(lambda a, b, c: jnp.sum(
                naive_attention(a, b, c, causal=True)
                * jnp.cos(a[..., :1])), argnums=(0, 1, 2)))(q, k, v)
        for g, w, nm in zip(gf, gn, "qkv"):
            record(f"chunked_streamed_bwd_d{nm}", g, w, 2e-3,
                   "gq=gk=2 diagonals + streamed dQ rects")
    finally:
        fa._CAUSAL_STRIP_MAX_CALLS = old_calls
        fa._CHUNKED_RECT_KV_BYTES = old_rect


def sec_decode():
    from nnop_tpu.ops.attention_decode import decode_attention
    from nnop_tpu.ops.naive import naive_attention

    def naive_decode(q, k, v, lengths):
        S = k.shape[2]
        mask = jnp.arange(S)[None, :] < lengths[:, None]
        out = naive_attention(q, k, v, kpad_mask=mask)
        return jnp.where((lengths > 0)[:, None, None, None], out, 0.0)

    B, QH, KH, S, E = 3, 8, 2, 1000, 64
    q = rnd(40, (B, QH, 1, E))
    k, v = rnd(41, (B, KH, S, E)), rnd(42, (B, KH, S, E))
    lengths = jnp.array([977, 64, 1000], jnp.int32)
    if left() < 120:
        return skip("decode_*", "budget")
    got = jax.jit(decode_attention)(q, k, v, lengths)
    record("decode_fp_S1000", got, naive_decode(q, k, v, lengths),
           1e-2, "default-precision MXU emulation noise, both sides")

    def quant(x):
        amax = jnp.max(jnp.abs(x), axis=-1)
        sc = jnp.maximum(amax, 1e-8) / 127.0
        qq = jnp.clip(jnp.round(x / sc[..., None]), -127, 127).astype(jnp.int8)
        return qq, sc

    kq, ksc = quant(k)
    vq, vsc = quant(v)
    got = jax.jit(decode_attention)(q, kq, vq, lengths, ksc, vsc)
    want = naive_decode(q, kq.astype(jnp.float32) * ksc[..., None],
                        vq.astype(jnp.float32) * vsc[..., None], lengths)
    record("decode_int8_S1000", got, want, 2e-2)

    # staged (bf16 staging buffer) + multi-token spec verify
    W, T, staged_n = 32, 4, 9
    lengths = jnp.array([5, 40, 256], jnp.int32)
    kst = rnd(43, (B, KH, W, E)).astype(jnp.bfloat16)
    vst = rnd(44, (B, KH, W, E)).astype(jnp.bfloat16)
    kb = k.astype(jnp.bfloat16)
    vb = v.astype(jnp.bfloat16)
    o1 = jax.jit(lambda q: decode_attention(
        q, kb, vb, lengths, k_stage=kst, v_stage=vst, staged_n=1))(q)
    kall = jnp.concatenate([kb.astype(jnp.float32),
                            kst.astype(jnp.float32)[:, :, :1]], axis=2)
    vall = jnp.concatenate([vb.astype(jnp.float32),
                            vst.astype(jnp.float32)[:, :, :1]], axis=2)
    # staged token occupies position `lengths[b]` -> emulate by moving it
    # there in a dense cache
    kd = kall[:, :, :S, :]
    vd = vall[:, :, :S, :]
    idx = jnp.arange(B)
    kd = kd.at[idx, :, lengths, :].set(kst.astype(jnp.float32)[:, :, 0])
    vd = vd.at[idx, :, lengths, :].set(vst.astype(jnp.float32)[:, :, 0])
    want = naive_decode(q, kd, vd, lengths + 1)
    record("decode_staged1", o1, want, 2e-2)

    qT = rnd(45, (B, QH, T, E))
    got = jax.jit(lambda q: decode_attention(
        q, kb, vb, lengths, k_stage=kst, v_stage=vst, staged_n=staged_n))(qT)
    # oracle: python loop (matches tests/test_staged_decode.py)
    scale = 1.0 / (E ** 0.5)
    kall = jnp.concatenate([kb.astype(jnp.float32),
                            kst.astype(jnp.float32)], axis=2)
    vall = jnp.concatenate([vb.astype(jnp.float32),
                            vst.astype(jnp.float32)], axis=2)
    want = np.zeros((B, QH, T, E), np.float32)
    G = QH // KH
    for b in range(B):
        Lb = int(lengths[b])
        for h in range(QH):
            s = np.asarray(qT[b, h] @ kall[b, h // G].T) * scale
            cols = np.arange(S + W)
            for t in range(T):
                okm = (cols < Lb) | ((cols >= S)
                                     & (cols - S <= staged_n - T + t)
                                     & (Lb > 0))
                srow = np.where(okm, s[t], -1e30)
                if Lb == 0:
                    continue
                p = np.exp(srow - srow.max())
                want[b, h, t] = (p / p.sum()) @ np.asarray(vall[b, h // G])
    record("decode_verify_T4", got, want, 2e-2)

    # paged pool (fp + int8) with ragged pages
    if left() < 120:
        return skip("decode_paged*", "budget")
    from nnop_tpu.ops.attention_decode_paged import paged_decode_attention
    from nnop_tpu.runtime.paged_cache import PagedKVCache

    for quantized in (False, True):
        cache = PagedKVCache.create(32, KH, 64, E, dtype=jnp.float32,
                                    quantized=quantized)
        seqs = {0: 100, 1: 37, 2: 164}
        key = jax.random.key(50)
        dense = {}
        for sid, n in seqs.items():
            cache.alloc_seq(sid)
            key, k1, k2 = jax.random.split(key, 3)
            kt = jax.random.normal(k1, (KH, n, E), jnp.float32)
            vt = jax.random.normal(k2, (KH, n, E), jnp.float32)
            for t in range(n):
                cache.append_token(sid, kt[:, t], vt[:, t])
            dense[sid] = (kt, vt)
        qp = rnd(51, (len(seqs), QH, 1, E))
        table, lens = cache.batch_views(list(seqs), max_pages=4)
        got = jax.jit(paged_decode_attention)(
            qp, cache.pool_k, cache.pool_v, table, lens,
            cache.pool_k_scale, cache.pool_v_scale)
        Sp = 256
        wants = []
        for i, sid in enumerate(seqs):
            kd, vd = dense[sid]
            n = seqs[sid]
            kfull = jnp.zeros((1, KH, Sp, E)).at[0, :, :n].set(kd)
            vfull = jnp.zeros((1, KH, Sp, E)).at[0, :, :n].set(vd)
            mask = (jnp.arange(Sp) < n)[None]
            wants.append(naive_attention(qp[i:i+1], kfull, vfull,
                                         kpad_mask=mask))
        tag = "int8" if quantized else "fp"
        record(f"decode_paged_{tag}", got, jnp.concatenate(wants),
               2e-2 if quantized else 1e-2)


def sec_quant():
    from nnop_tpu.ops.quantization import QTensor, quantize, quantize4
    from nnop_tpu.ops.quantized_matmul import (
        quantized_matmul, quantized_matmul4, quantized_matmul_w8a8)

    if left() < 180:
        return skip("qmm_*", "budget")
    M, K, N = 256, 1024, 2048
    x = rnd(60, (M, K), jnp.bfloat16)
    w = rnd(61, (K, N)) * 0.05
    q8 = quantize(w, axis=0)  # reduce over K -> per-N scales
    got = jax.jit(quantized_matmul)(x, q8)
    want = x.astype(jnp.float32) @ (
        q8.values.astype(jnp.float32) * q8.scale[None, :])
    record("qmm_int8", got.astype(jnp.float32), want, 2e-2)

    q4 = quantize4(w)
    got4 = jax.jit(quantized_matmul4)(x, q4)
    from nnop_tpu.ops.quantization import dequantize4
    want4 = x.astype(jnp.float32) @ dequantize4(q4).astype(jnp.float32)
    record("qmm_int4", got4.astype(jnp.float32), want4, 2e-2)

    # w8a8: the exactness claim is the int8 MXU accumulation, so feed
    # the kernel PRE-QUANTIZED activations (its own quantize_act, run
    # on-device) and compare against a host int64 matmul of those same
    # int8 values. (Quantizing independently on host differs by +-1
    # quantum on rounding-boundary values — TPU divides via reciprocal
    # multiply — which showed as a benign 3.9e-3 = 0.5/127 mismatch.)
    from nnop_tpu.ops.quantized_matmul import quantize_act

    xq, xs = jax.jit(quantize_act)(x)
    got8 = jax.jit(lambda xq, xs: quantized_matmul_w8a8(
        (xq, xs), q8, out_dtype=jnp.float32))(xq, xs)
    acc = np.einsum("mk,kn->mn", np.asarray(xq, np.int64),
                    np.asarray(q8.values, np.int64))
    want8 = (acc.astype(np.float64) * np.asarray(xs)
             * np.asarray(q8.scale)[None, :])
    record("qmm_w8a8_exact", got8, want8, 1e-5,
           "int8 MXU accumulation vs host int64")

    # grouped (MoE expert) matmul: fwd + grads + int8 experts
    from nnop_tpu.ops.grouped_matmul import (grouped_matmul,
                                             grouped_matmul_quantized)

    Eexp, T, d, h = 4, 512, 256, 512
    # expert id per 128-token block (non-decreasing; expert 1 empty)
    bgroups = jnp.array([0, 2, 2, 3], jnp.int32)
    xg = rnd(62, (T, d))
    wg = rnd(63, (Eexp, d, h)) * 0.05
    eids = jnp.repeat(bgroups, 128)
    with jax.default_matmul_precision("highest"):
        got = jax.jit(lambda x, w: grouped_matmul(x, w, bgroups))(xg, wg)
        want = jnp.einsum("td,tdh->th", xg, wg[eids])
        record("grouped_matmul", got, want, 2e-3)
        gx, gw = jax.jit(jax.grad(lambda x, w: jnp.sum(
            grouped_matmul(x, w, bgroups) * jnp.cos(x[:, :1])),
            argnums=(0, 1)))(xg, wg)
        nx, nw = jax.jit(jax.grad(lambda x, w: jnp.sum(
            jnp.einsum("td,tdh->th", x, w[eids]) * jnp.cos(x[:, :1])),
            argnums=(0, 1)))(xg, wg)
        record("grouped_matmul_dx", gx, nx, 2e-3)
        record("grouped_matmul_dw", gw, nw, 2e-3)

    q8g = QTensor(
        jnp.stack([quantize(wg[e], axis=0).values for e in range(Eexp)]),
        jnp.stack([quantize(wg[e], axis=0).scale for e in range(Eexp)]),
        1)
    got = jax.jit(lambda x: grouped_matmul_quantized(x, q8g, bgroups))(xg)
    wdq = q8g.values.astype(jnp.float32) * q8g.scale[:, None, :]
    want = jnp.einsum("td,tdh->th", xg, wdq[eids])
    record("grouped_matmul_int8", got, want, 2e-2)


def sec_pointwise():
    from nnop_tpu import (RotaryEmbedding, layer_norm, llama_rope,
                          online_softmax, rms_norm)
    from nnop_tpu.ops import naive

    if left() < 60:
        return skip("pointwise", "budget")
    x = rnd(70, (4096, 1024))
    record("softmax", jax.jit(online_softmax)(x), naive.naive_softmax(x),
           1e-5)
    w = rnd(71, (1024,))
    b = rnd(72, (1024,))
    record("rms_norm", jax.jit(rms_norm)(x, w), naive.naive_rms_norm(x, w),
           1e-4)
    record("layer_norm", jax.jit(layer_norm)(x, w, b),
           naive.naive_layer_norm(x, w, b), 1e-4)
    B, H, L, E = 2, 4, 1024, 128
    qq, kk = rnd(73, (B, H, L, E)), rnd(74, (B, H, L, E))
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    cos, sin = RotaryEmbedding(E)(pos)
    go = jax.jit(llama_rope)(qq, kk, cos, sin)
    no = naive.naive_rope(qq, kk, cos, sin)
    record("rope_q", go[0], no[0], 1e-5)
    record("rope_k", go[1], no[1], 1e-5)


def write_md():
    lines = [
        "# TPU on-chip parity (compiled Mosaic vs naive XLA, same chip)",
        "",
        f"Generated by `python scripts/tpu_parity.py` on "
        f"{time.strftime('%Y-%m-%d')} — device: "
        f"{jax.devices()[0].device_kind}, jax {jax.__version__}. "
        f"Total {time.time()-T0:.0f}s. "
        "f32 rows at matched MXU precision (see script docstring).",
        "",
        "| # | config | max rel err | tol | result |",
        "|---|---|---|---|---|",
    ]
    for i, (name, ok, err, tol, note) in enumerate(ROWS, 1):
        if ok is None:
            lines.append(f"| {i} | {name} | — | — | SKIP ({note}) |")
        else:
            n = f" ({note})" if note else ""
            lines.append(f"| {i} | {name}{n} | {err:.2e} | {tol:.0e} | "
                         f"{'PASS' if ok else '**FAIL**'} |")
    done = [r for r in ROWS if r[1] is not None]
    npass = sum(1 for r in done if r[1])
    lines += ["", f"**{npass}/{len(done)} configs pass** "
              f"({len(ROWS)-len(done)} skipped on budget)."]
    with open(os.path.join(HERE, "TPU_PARITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=2400.0)
    ap.add_argument("--no-md", action="store_true")
    args = ap.parse_args()
    BUDGET[0] = args.budget

    print(f"device: {jax.devices()}, budget {args.budget:.0f}s", flush=True)
    for fn in (sec_attention_fwd, sec_attention_bwd, sec_chunked,
               sec_decode, sec_quant, sec_pointwise):
        try:
            fn()
        except Exception as e:
            ROWS.append((fn.__name__, False, float("inf"), 0.0,
                         f"{type(e).__name__}: {e}"))
            print(f"FAIL {fn.__name__}: {type(e).__name__}: {e}", flush=True)
    if not args.no_md:
        write_md()
    done = [r for r in ROWS if r[1] is not None]
    npass = sum(1 for r in done if r[1])
    print(f"total {npass}/{len(done)} pass, {len(ROWS)-len(done)} skipped, "
          f"{time.time()-T0:.0f}s", flush=True)
    sys.exit(0 if npass == len(done) else 1)


if __name__ == "__main__":
    main()
