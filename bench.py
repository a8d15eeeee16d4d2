"""Benchmark harness: fused Pallas kernels vs naive XLA, on real TPU.

Mirrors the reference's naive-vs-fused methodology
(/root/reference/benchmarks/main.jl): same workload shapes (attention
E=64 L=2048 H=4 B=4; softmax 8192x1024; norms 1024x1024; rope dim=64 H=3
L=1024 B=4), wall time fwd and fwd+bwd, synchronized. Prints ONE JSON line
on stdout (headline metric); per-op detail goes to stderr.

Usage: python bench.py [--quick] [--json-all]
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp


def _timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_attention(results, quick):
    from nnop_tpu import flash_attention
    from nnop_tpu.ops.naive import naive_attention

    B, H, L, E = 4, 4, 2048, 64  # benchmarks/main.jl:308-310
    ks = jax.random.split(jax.random.key(0), 3)
    for dtype, tag in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        q = jax.random.normal(ks[0], (B, H, L, E), dtype)
        k = jax.random.normal(ks[1], (B, H, L, E), dtype)
        v = jax.random.normal(ks[2], (B, H, L, E), dtype)
        for causal in ([False, True] if not quick else [True]):
            flops = 4 * B * H * L * L * E  # fwd: QK^T + PV
            if causal:
                flops //= 2
            fused = jax.jit(lambda q, k, v: flash_attention(q, k, v, causal=causal))
            naive = jax.jit(lambda q, k, v: naive_attention(q, k, v, causal=causal))
            tf = _timeit(fused, q, k, v)
            tn = _timeit(naive, q, k, v)
            name = f"attn_fwd_{tag}{'_causal' if causal else ''}"
            results[name] = dict(
                fused_s=tf,
                naive_s=tn,
                speedup=tn / tf,
                tflops=flops / tf / 1e12,
            )
            log(f"{name}: fused {tf*1e3:.3f} ms ({flops/tf/1e12:.2f} TFLOP/s) "
                f"naive {tn*1e3:.3f} ms speedup {tn/tf:.2f}x")

            # fwd+bwd
            def loss_fused(q, k, v):
                return jnp.sum(flash_attention(q, k, v, causal=causal))

            def loss_naive(q, k, v):
                return jnp.sum(naive_attention(q, k, v, causal=causal))

            gf = jax.jit(jax.grad(loss_fused, (0, 1, 2)))
            gn = jax.jit(jax.grad(loss_naive, (0, 1, 2)))
            tf = _timeit(gf, q, k, v)
            tn = _timeit(gn, q, k, v)
            bwd_flops = flops * 2.5  # recompute + 4 matmuls vs 2
            name = f"attn_bwd_{tag}{'_causal' if causal else ''}"
            results[name] = dict(
                fused_s=tf, naive_s=tn, speedup=tn / tf,
                tflops=bwd_flops / tf / 1e12,
            )
            log(f"{name}: fused {tf*1e3:.3f} ms naive {tn*1e3:.3f} ms "
                f"speedup {tn/tf:.2f}x")


def bench_softmax(results):
    from nnop_tpu import online_softmax
    from nnop_tpu.ops.naive import naive_softmax

    x = jax.random.normal(jax.random.key(0), (8192, 1024), jnp.float32)
    fused = jax.jit(online_softmax)
    naive = jax.jit(naive_softmax)
    tf, tn = _timeit(fused, x), _timeit(naive, x)
    gb = 2 * x.size * 4 / 1e9
    results["softmax_fwd"] = dict(
        fused_s=tf, naive_s=tn, speedup=tn / tf, gbps=gb / tf
    )
    log(f"softmax_fwd: fused {tf*1e3:.3f} ms ({gb/tf:.0f} GB/s) "
        f"naive {tn*1e3:.3f} ms speedup {tn/tf:.2f}x")


def bench_norms(results):
    from nnop_tpu import layer_norm, rms_norm
    from nnop_tpu.ops.naive import naive_layer_norm, naive_rms_norm

    n, e = 1024, 1024
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (n, e), jnp.float32)
    w = jax.random.normal(ks[1], (e,), jnp.float32)
    b = jax.random.normal(ks[2], (e,), jnp.float32)

    for name, fused, naive, args in [
        ("rms", rms_norm, naive_rms_norm, (x, w)),
        ("ln", lambda x, w, b: layer_norm(x, w, b),
         lambda x, w, b: naive_layer_norm(x, w, b), (x, w, b)),
    ]:
        f, nv = jax.jit(fused), jax.jit(naive)
        tf, tn = _timeit(f, *args), _timeit(nv, *args)
        results[f"{name}_fwd"] = dict(fused_s=tf, naive_s=tn, speedup=tn / tf)
        log(f"{name}_fwd: fused {tf*1e3:.3f} ms naive {tn*1e3:.3f} ms "
            f"speedup {tn/tf:.2f}x")

        gf = jax.jit(jax.grad(lambda *a: jnp.sum(fused(*a)), tuple(range(len(args)))))
        gn = jax.jit(jax.grad(lambda *a: jnp.sum(naive(*a)), tuple(range(len(args)))))
        tf, tn = _timeit(gf, *args), _timeit(gn, *args)
        results[f"{name}_bwd"] = dict(fused_s=tf, naive_s=tn, speedup=tn / tf)
        log(f"{name}_bwd: fused {tf*1e3:.3f} ms naive {tn*1e3:.3f} ms "
            f"speedup {tn/tf:.2f}x")


def bench_rope(results):
    from nnop_tpu import RotaryEmbedding, llama_rope
    from nnop_tpu.ops.naive import naive_rope

    B, H, L, E = 4, 3, 1024, 64  # benchmarks/main.jl:190
    ks = jax.random.split(jax.random.key(0), 2)
    q = jax.random.normal(ks[0], (B, H, L, E), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, L, E), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    cos, sin = RotaryEmbedding(E)(pos)
    fused = jax.jit(llama_rope)
    naive = jax.jit(naive_rope)
    tf = _timeit(fused, q, k, cos, sin)
    tn = _timeit(naive, q, k, cos, sin)
    results["rope_fwd"] = dict(fused_s=tf, naive_s=tn, speedup=tn / tf)
    log(f"rope_fwd: fused {tf*1e3:.3f} ms naive {tn*1e3:.3f} ms "
        f"speedup {tn/tf:.2f}x")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--json-all", action="store_true")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    results = {}
    bench_attention(results, args.quick)
    if not args.quick:
        bench_softmax(results)
        bench_norms(results)
        bench_rope(results)

    if args.json_all:
        log(json.dumps(results, indent=2))

    head = results.get("attn_fwd_bf16_causal") or results.get("attn_fwd_bf16")
    print(
        json.dumps(
            {
                "metric": "flash_attention_fwd_bf16_causal_L2048_TFLOPs",
                "value": round(head["tflops"], 3),
                "unit": "TFLOP/s",
                "vs_baseline": round(head["speedup"], 3),
            }
        )
    )


if __name__ == "__main__":
    main()
