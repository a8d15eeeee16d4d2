"""Llama-3-8B weight-only-INT8 + INT8-KV decode throughput on one chip.

The north-star serving number (BASELINE.json: "decode tokens/sec/chip
(INT8 KV) at 8B"). Random int8 weights built directly as QTensors (no fp
materialization), fused qkv/gate-up projections, UNROLLED layer loop (a
lax.scan over stacked weights dynamic-slices ~14 GB/step of hidden weight
copies), decode steps chained inside one jit (loop-carried caches alias
in place), marginal-timed.

Measured (v5e, vocab trimmed to 32000 to fit the 16 GB single-program
budget alongside the KV cache):
  B=16: 21.6 ms/step =  742 tok/s/chip
  B=32: 31.3 ms/step = 1024 tok/s/chip
  B=64: 50.3 ms/step = 1272 tok/s/chip
Component bisect at B=32: qmm weight stream 11.5 ms (630 GB/s — at the
chip's pallas ceiling), attention ~5.5 ms, KV append scatters ~13 ms (the
next optimization target; see NOTES.md).

Usage: python scripts/bench_8b.py [--batch 32] [--context 512]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--context", type=int, default=512)
    ap.add_argument("--max-seq", type=int, default=640)
    ap.add_argument("--vocab", type=int, default=32000)
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.runtime.engine import (
        fuse_decode_weights, make_decode_step_unrolled,
    )

    cfg = LlamaConfig.llama3_8b(vocab_size=args.vocab)
    print("building random INT8 8B params...", file=sys.stderr, flush=True)
    params = fuse_decode_weights(init_quantized_params(jax.random.key(0), cfg))
    jax.block_until_ready(jax.tree.leaves(params)[0])

    raw = make_decode_step_unrolled(cfg, quantized=True)
    nl, KH, E = cfg.n_layers, cfg.n_kv_heads, cfg.head_dim
    B, S, ctx = args.batch, args.max_seq, args.context
    lengths = jnp.full((B,), ctx, jnp.int32)

    @jax.jit
    def chain(params, ks, vs, kss, vss, last, key, n):
        def body(i, carry):
            ks, vs, kss, vss, last, key = carry
            key, sub = jax.random.split(key)
            _, ks, vs, kss, vss, _, last = raw(
                params, ks, vs, kss, vss, lengths, last, sub
            )
            return (ks, vs, kss, vss, last, key)

        ks, vs, kss, vss, last, _ = jax.lax.fori_loop(
            0, n, body, (ks, vs, kss, vss, last, key)
        )
        return jnp.sum(last)

    ks = [jnp.zeros((B, KH, S, E), jnp.int8) for _ in range(nl)]
    vs = [jnp.zeros((B, KH, S, E), jnp.int8) for _ in range(nl)]
    kss = [jnp.zeros((B, KH, S), jnp.float32) for _ in range(nl)]
    vss = [jnp.zeros((B, KH, S), jnp.float32) for _ in range(nl)]
    key = jax.random.key(1)
    last = jnp.ones((B,), jnp.int32)

    print("compiling decode chain...", file=sys.stderr, flush=True)
    t0 = time.time()
    float(chain(params, ks, vs, kss, vss, last, key, jnp.int32(2)))
    print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(params, ks, vs, kss, vss, last, key, jnp.int32(4)))
        t1 = time.perf_counter()
        float(chain(params, ks, vs, kss, vss, last, key, jnp.int32(16)))
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / 12)
    vals.sort()
    step = vals[1]

    wbytes = sum(
        v.size for v in jax.tree.leaves(params)
        if hasattr(v, "dtype") and v.dtype == jnp.int8
    )
    print(
        f"8B INT8 decode: B={B} ctx={ctx}: {step*1e3:.2f} ms/step = "
        f"{B/step:.0f} tokens/s/chip "
        f"({wbytes/1e9:.1f} GB int8 weights -> {wbytes/step/1e9:.0f} GB/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
