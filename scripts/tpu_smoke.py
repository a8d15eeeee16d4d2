"""Real-TPU smoke test: compile + run every Pallas kernel via Mosaic and
check numerics against the naive oracles. Run WITHOUT the test conftest so
the axon TPU backend stays active:  python scripts/tpu_smoke.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, atol, rtol=1e-3):
    got = np.asarray(got, dtype=np.float32)
    want = np.asarray(want, dtype=np.float32)
    err = np.max(np.abs(got - want))
    ok = np.allclose(got, want, atol=atol, rtol=rtol)
    print(f"{'PASS' if ok else 'FAIL'} {name}: maxerr={err:.2e}")
    return ok


def main():
    print("backend:", jax.default_backend(), jax.devices())
    from nnop_tpu import (
        RotaryEmbedding,
        flash_attention,
        layer_norm,
        llama_rope,
        online_softmax,
        rms_norm,
    )
    from nnop_tpu.ops import naive
    from nnop_tpu.ops.quantization import quantize
    from nnop_tpu.ops.quantized_matmul import quantized_matmul

    ok = True
    t0 = time.time()

    # softmax
    x = jax.random.normal(jax.random.key(0), (513, 1024), jnp.float32)
    ok &= check("softmax", online_softmax(x), naive.naive_softmax(x), 1e-6)
    g1 = jax.grad(lambda a: jnp.sum(online_softmax(a) * jnp.cos(a)))(x)
    g2 = jax.grad(lambda a: jnp.sum(naive.naive_softmax(a) * jnp.cos(a)))(x)
    ok &= check("softmax_grad", g1, g2, 1e-5)

    # rms norm
    w = jax.random.normal(jax.random.key(1), (1024,), jnp.float32)
    ok &= check("rms", rms_norm(x, w), naive.naive_rms_norm(x, w), 1e-5)
    gx, gw = jax.grad(lambda x, w: jnp.sum(rms_norm(x, w) * jnp.cos(x)), (0, 1))(x, w)
    nx, nw = jax.grad(
        lambda x, w: jnp.sum(naive.naive_rms_norm(x, w) * jnp.cos(x)), (0, 1)
    )(x, w)
    ok &= check("rms_dx", gx, nx, 1e-4)
    ok &= check("rms_dw", gw, nw, 1e-3)

    # layer norm
    b = jax.random.normal(jax.random.key(2), (1024,), jnp.float32)
    ok &= check("ln", layer_norm(x, w, b), naive.naive_layer_norm(x, w, b), 1e-5)
    gx, gw, gb = jax.grad(
        lambda x, w, b: jnp.sum(layer_norm(x, w, b) * jnp.cos(x)), (0, 1, 2)
    )(x, w, b)
    nx, nw, nb = jax.grad(
        lambda x, w, b: jnp.sum(naive.naive_layer_norm(x, w, b) * jnp.cos(x)),
        (0, 1, 2),
    )(x, w, b)
    ok &= check("ln_dx", gx, nx, 1e-4)
    ok &= check("ln_dw", gw, nw, 1e-3)
    ok &= check("ln_db", gb, nb, 1e-3)

    # rope
    ks = jax.random.split(jax.random.key(3), 2)
    q = jax.random.normal(ks[0], (2, 4, 257, 64), jnp.float32)
    k = jax.random.normal(ks[1], (2, 2, 257, 64), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(257)[None], (2, 257))
    cos, sin = RotaryEmbedding(64)(pos)
    qo, ko = llama_rope(q, k, cos, sin)
    qn, kn = naive.naive_rope(q, k, cos, sin)
    ok &= check("rope_q", qo, qn, 1e-5)
    ok &= check("rope_k", ko, kn, 1e-5)

    # flash attention fwd/bwd: plain, causal, gqa, kpad, pair, ragged
    for tag, (B, QH, KH, QL, KL, E), causal, use_pair, use_kpad in [
        ("attn", (2, 2, 2, 256, 256, 64), False, False, False),
        ("attn_causal", (2, 2, 2, 512, 512, 64), True, False, False),
        ("attn_gqa", (2, 4, 2, 255, 255, 64), True, False, False),
        ("attn_kpad", (2, 2, 2, 256, 320, 64), False, False, True),
        ("attn_pair", (1, 2, 2, 192, 192, 32), True, True, False),
    ]:
        kk = jax.random.split(jax.random.key(5), 5)
        q = jax.random.normal(kk[0], (B, QH, QL, E), jnp.float32)
        k = jax.random.normal(kk[1], (B, KH, KL, E), jnp.float32)
        v = jax.random.normal(kk[2], (B, KH, KL, E), jnp.float32)
        p = (
            jax.random.normal(kk[3], (B, QH, QL, KL), jnp.float32)
            if use_pair
            else None
        )
        m = None
        if use_kpad:
            m = (jax.random.uniform(kk[4], (B, KL)) > 0.2).at[:, 0].set(True)
        # f32 on TPU: compare at matched 'highest' MXU precision so logic
        # errors aren't hidden by (or blamed on) bf16-pass f32 emulation —
        # both paths at default precision differ by ~2e-3 from true f32
        # (measured: naive-TPU itself is 3e-3 off a CPU ground truth).
        got = flash_attention(
            q, k, v, p, causal=causal, kpad_mask=m, precision="highest"
        )
        with jax.default_matmul_precision("highest"):
            want = naive.naive_attention(q, k, v, p, causal=causal, kpad_mask=m)
        ok &= check(tag, got, want, 1e-3)
        got_def = flash_attention(q, k, v, p, causal=causal, kpad_mask=m)
        ok &= check(tag + "_defprec", got_def, want, 2e-2, 2e-2)

        def loss(fn):
            def f(*args):
                pair = args[3] if len(args) > 3 else None
                o = fn(args[0], args[1], args[2], pair, causal=causal, kpad_mask=m)
                return jnp.sum(o * jnp.sin(0.1 * jnp.arange(E, dtype=jnp.float32)))
            return f

        def loss_hi(fn):
            def f(*args):
                pair = args[3] if len(args) > 3 else None
                o = fn(args[0], args[1], args[2], pair, causal=causal,
                       kpad_mask=m, precision="highest")
                return jnp.sum(o * jnp.sin(0.1 * jnp.arange(E, dtype=jnp.float32)))
            return f

        args = (q, k, v) + ((p,) if use_pair else ())
        gf = jax.grad(loss_hi(flash_attention), tuple(range(len(args))))(*args)
        with jax.default_matmul_precision("highest"):
            gn = jax.grad(loss(naive.naive_attention), tuple(range(len(args))))(*args)
        names = ["dq", "dk", "dv", "dpair"]
        for gg, nn, nm in zip(gf, gn, names):
            ok &= check(f"{tag}_{nm}", gg, nn, 1e-3)

    # bf16 attention
    q = jax.random.normal(jax.random.key(7), (2, 4, 512, 128), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(8), (2, 4, 512, 128), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(9), (2, 4, 512, 128), jnp.bfloat16)
    got = flash_attention(q, k, v, causal=True)
    want = naive.naive_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True,
    )
    ok &= check("attn_bf16", got.astype(jnp.float32), want, 3e-2, 3e-2)

    # sliding-window attention (Mistral): fwd + grads + windowed decode
    kk = jax.random.split(jax.random.key(21), 3)
    q = jax.random.normal(kk[0], (2, 4, 512, 64), jnp.float32)
    k = jax.random.normal(kk[1], (2, 2, 512, 64), jnp.float32)
    v = jax.random.normal(kk[2], (2, 2, 512, 64), jnp.float32)
    got = flash_attention(
        q, k, v, causal=True, window=100, precision="highest"
    )
    with jax.default_matmul_precision("highest"):
        want = naive.naive_attention(q, k, v, causal=True, window=100)
    ok &= check("attn_window", got, want, 1e-3)

    def wloss(fn):
        def f(a, b, c):
            o = fn(a, b, c, causal=True, window=100, precision="highest")
            return jnp.sum(o * jnp.sin(0.1 * jnp.arange(64, dtype=jnp.float32)))
        return f

    def wloss_n(a, b, c):
        o = naive.naive_attention(a, b, c, causal=True, window=100)
        return jnp.sum(o * jnp.sin(0.1 * jnp.arange(64, dtype=jnp.float32)))

    gf = jax.grad(wloss(flash_attention), (0, 1, 2))(q, k, v)
    with jax.default_matmul_precision("highest"):
        gn = jax.grad(wloss_n, (0, 1, 2))(q, k, v)
    for gg, nn, nm in zip(gf, gn, ["dq", "dk", "dv"]):
        ok &= check(f"attn_window_{nm}", gg, nn, 1e-3)

    # quantized matmul
    xk = jax.random.normal(jax.random.key(10), (256, 512), jnp.bfloat16)
    wf = jax.random.normal(jax.random.key(11), (512, 1024), jnp.float32)
    wq = quantize(wf, axis=0)
    got = quantized_matmul(xk, wq).astype(jnp.float32)
    want = (xk.astype(jnp.float32) @ wf).astype(jnp.float32)
    rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
    print(f"{'PASS' if rel < 0.02 else 'FAIL'} qmm: rel_fro_err={rel:.4f}")
    ok &= rel < 0.02

    # int4 packed matmul: exact vs its own dequantized reference in f32
    from nnop_tpu.ops.quantization import dequantize4, quantize4
    from nnop_tpu.ops.quantized_matmul import quantized_matmul4

    w4f = jax.random.normal(jax.random.key(20), (1024, 512), jnp.float32) * 0.05
    q4 = quantize4(w4f)
    x4 = jax.random.normal(jax.random.key(21), (32, 1024), jnp.float32)
    got4 = np.asarray(quantized_matmul4(x4, q4))
    want4 = np.asarray(x4 @ dequantize4(q4))
    err4 = np.abs(got4 - want4).max()
    print(f"{'PASS' if err4 < 1e-4 else 'FAIL'} qmm4: maxerr={err4:.2e}")
    ok &= err4 < 1e-4

    # staged decode + flush (the serving fast path, round 2)
    from nnop_tpu.ops.attention_decode import decode_attention
    from nnop_tpu.ops.kv_write import flush_staging

    NL, B, KH, G, E, S, W = 2, 3, 2, 4, 128, 256, 32
    kk = jax.random.split(jax.random.key(12), 6)
    kc = jnp.zeros((NL, B, KH, S, E), jnp.int8)
    vc = jnp.zeros((NL, B, KH, S, E), jnp.int8)
    ksc = jnp.zeros((NL, B, KH, S), jnp.float32)
    vsc = jnp.zeros((NL, B, KH, S), jnp.float32)
    kst = jax.random.normal(kk[0], (B, NL, KH, W, E), jnp.bfloat16)
    vst = jax.random.normal(kk[1], (B, NL, KH, W, E), jnp.bfloat16)
    base = jnp.array([0, 17, 50], jnp.int32)
    kc2, vc2, ksc2, vsc2 = flush_staging(kc, vc, ksc, vsc, kst, vst, base)
    b_, p_ = 1, 17
    got = (
        np.asarray(kc2, np.float32)[0, b_, :, p_ : p_ + W]
        * np.asarray(ksc2)[0, b_, :, p_ : p_ + W][..., None]
    )
    ok &= check(
        "flush_staging", got, np.asarray(kst, np.float32)[b_, 0], 2e-2, 2e-2
    )

    qd = jax.random.normal(kk[2], (B, KH * G, 1, E), jnp.bfloat16)
    o_flushed = decode_attention(
        qd, kc2[0], vc2[0], base + W * (base > 0), ksc2[0], vsc2[0]
    )
    o_staged = decode_attention(
        qd, kc2, vc2, base, ksc2, vsc2,
        k_stage=kst, v_stage=vst, staged_n=W, layer=0,
    )
    # staged path attends staging in bf16 vs the flushed int8 rows:
    # differences are quantization-level
    ok &= check(
        "decode_staged_vs_flushed", o_staged[:2], o_flushed[:2], 4e-2, 4e-2
    )

    # windowed decode (staging-aware) vs the flushed-cache windowed result
    o_flushed_w = decode_attention(
        qd, kc2[0], vc2[0], base + W * (base > 0), ksc2[0], vsc2[0],
        window=40,
    )
    o_staged_w = decode_attention(
        qd, kc2, vc2, base, ksc2, vsc2,
        k_stage=kst, v_stage=vst, staged_n=W, layer=0, window=40,
    )
    ok &= check(
        "decode_window_staged", o_staged_w[:2], o_flushed_w[:2], 4e-2, 4e-2
    )

    # native int8 MXU dots (q + P quantized in/around the kernel): must
    # track the dequant path within the requant noise (~1.2%)
    o_i8 = decode_attention(
        qd, kc2, vc2, base, ksc2, vsc2,
        k_stage=kst, v_stage=vst, staged_n=W, layer=0, int8_dots=True,
    )
    ok &= check("decode_int8_dots", o_i8[:2], o_staged[:2], 4e-2, 4e-2)

    # multi-token (speculative verify) decode: row t must equal a
    # single-token decode whose staging is truncated to the same visible
    # prefix (staged cols <= staged_n - T + t) — CPU oracle coverage is in
    # tests/test_staged_decode.py; this checks the Mosaic-compiled masks
    T = 3
    qmt = jax.random.normal(kk[3], (B, KH * G, T, E), jnp.bfloat16)
    o_mt = decode_attention(
        qmt, kc2, vc2, base, ksc2, vsc2,
        k_stage=kst, v_stage=vst, staged_n=W, layer=0,
    )
    for t in range(T):
        o_1 = decode_attention(
            qmt[:, :, t : t + 1], kc2, vc2, base, ksc2, vsc2,
            k_stage=kst, v_stage=vst, staged_n=W - T + 1 + t, layer=0,
        )
        ok &= check(
            f"decode_multitoken_t{t}", o_mt[:, :, t : t + 1], o_1, 2e-2, 2e-2
        )

    # grouped matmul (MoE fast path): fwd + custom_vjp grads vs dense
    from nnop_tpu.ops.grouped_matmul import grouped_matmul

    Eg, Kg, Ng, bmg = 4, 256, 384, 128
    Tpg = 6 * bmg
    gk = jax.random.split(jax.random.key(30), 3)
    xg = jax.random.normal(gk[0], (Tpg, Kg), jnp.float32)
    wg = jax.random.normal(gk[1], (Eg, Kg, Ng), jnp.float32) * 0.1
    bgg = jnp.array([0, 0, 1, 1, 3, 3], jnp.int32)  # expert 2 empty
    tg = jax.random.normal(gk[2], (Tpg, Ng), jnp.float32)

    def dense_g(x, w):
        sel = w[bgg]
        return jnp.einsum(
            "bmk,bkn->bmn", x.reshape(6, bmg, Kg), sel
        ).reshape(Tpg, Ng)

    with jax.default_matmul_precision("highest"):
        got_g = grouped_matmul(xg, wg, bgg, block_m=bmg)
        want_g = dense_g(xg, wg)
        ok &= check("grouped_matmul", got_g, want_g, 1e-4, 1e-4)
        gxg, gwg = jax.grad(
            lambda x, w: jnp.sum(grouped_matmul(x, w, bgg, block_m=bmg) * tg),
            argnums=(0, 1),
        )(xg, wg)
        nxg, nwg = jax.grad(
            lambda x, w: jnp.sum(dense_g(x, w) * tg), argnums=(0, 1)
        )(xg, wg)
        ok &= check("grouped_matmul_dx", gxg, nxg, 1e-3, 1e-3)
        ok &= check("grouped_matmul_dw", gwg, nwg, 1e-3, 1e-3)
        ok &= check("grouped_matmul_dw_empty", gwg[2],
                    np.zeros_like(np.asarray(gwg[2])), 0.0, 0.0)

    # quantized grouped matmul (Mixtral serving path)
    from nnop_tpu.ops.grouped_matmul import grouped_matmul_quantized

    wq = quantize(wg * 0.05, axis=1)
    got_q = grouped_matmul_quantized(xg, wq, bgg, block_m=bmg)
    want_q = grouped_matmul(
        xg,
        (wq.values.astype(jnp.float32) * wq.scale[:, None, :]),
        bgg, block_m=bmg,
    )
    ok &= check("grouped_matmul_q", got_q, want_q, 1e-3, 1e-3)

    # int4 packed-expert grouped matmul
    from nnop_tpu.ops.grouped_matmul import (
        _grouped_matmul_q4, quantize4_experts,
    )

    wq4 = quantize4_experts(wg * 0.05, group=128, pack_block=256)
    got_q4 = _grouped_matmul_q4(xg, wq4, bgg, block_m=bmg, block_n=Ng)
    want_q4 = grouped_matmul(
        xg, jax.vmap(dequantize4)(wq4), bgg, block_m=bmg
    )
    ok &= check("grouped_matmul_q4", got_q4, want_q4, 1e-3, 1e-3)

    # W8A8: native int8-MXU matmul must match the exact integer reference
    from nnop_tpu.ops.quantized_matmul import (
        quantize_act, quantized_matmul_w8a8,
    )

    xw = jax.random.normal(jax.random.key(30), (512, 1024), jnp.bfloat16)
    ww = quantize(
        jax.random.normal(jax.random.key(31), (1024, 768), jnp.float32),
        axis=0,
    )
    got_w8 = quantized_matmul_w8a8(xw, ww, out_dtype=jnp.float32)
    xq, xs = quantize_act(xw)
    want_w8 = (
        (xq.astype(jnp.int32) @ ww.values.astype(jnp.int32)).astype(
            jnp.float32
        )
        * xs
        * ww.scale[None, :]
    )
    ok &= check("qmm_w8a8", got_w8, want_w8, 1e-5, 1e-5)

    print(f"total {time.time()-t0:.1f}s")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
