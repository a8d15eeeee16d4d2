"""Llama-3-8B weight-only-INT8 + INT8-KV decode throughput on one chip.

The north-star serving number (BASELINE.json: "decode tokens/sec/chip
(INT8 KV) at 8B"). This drives the ENGINE's own fast path
(runtime/engine.make_decode_chunk): random int8 weights as QTensors,
fused qkv/gate-up projections, unrolled layers, staged KV appends
(uniform-index DUS in-place + one flush_staging per chunk) — the same
jitted chunk program the Engine dispatches, chained n_chunks times inside
one jit for marginal timing.

Round-1 path (per-token scatters/kv_write) measured 31.3 ms/step at B=32;
the staged path replaces the ~13 ms/step append cost with ~us-level
amortized flushes.

Usage: python scripts/bench_8b.py [--batch 32] [--context 512] [--chunk 16]
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
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--wbits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--spec", type=int, default=0,
                    help="speculative mode: drafts per verify step; "
                    "measures the T=spec+1 verify-step cost vs plain")
    ap.add_argument("--model", type=str, default="8b",
                    choices=("8b", "mixtral"))
    ap.add_argument("--layers", type=int, default=0,
                    help="override n_layers (mixtral 8x7b int8 needs "
                    "<=6 layers to fit one v5e; tokens/s scales ~1/layers)")
    ap.add_argument("--prefill", type=int, default=0,
                    help="measure PREFILL instead: time the engine's "
                    "prefill program (make_prefill_unrolled) at this "
                    "prompt length, batch --batch")
    ap.add_argument("--w8a8", action="store_true",
                    help="prefill mode: activation-quantized int8-MXU "
                    "matmuls (quantized_matmul_w8a8)")
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.runtime.engine import (
        STAGE_W, fuse_decode_weights, init_state, make_decode_chunk,
        make_spec_chunk,
    )

    kw = dict(vocab_size=args.vocab)
    if args.layers:
        kw["n_layers"] = args.layers
    cfg = (LlamaConfig.mixtral_8x7b(**kw) if args.model == "mixtral"
           else LlamaConfig.llama3_8b(**kw))
    print(f"building random INT{args.wbits} {args.model} params "
          f"({cfg.n_layers} layers)...", file=sys.stderr, flush=True)
    params = fuse_decode_weights(
        init_quantized_params(jax.random.key(0), cfg, wbits=args.wbits)
    )
    jax.block_until_ready(jax.tree.leaves(params)[0])

    if args.prefill:
        _bench_prefill(args, cfg, params)
        return

    B, ctx, chunk = args.batch, args.context, args.chunk
    alloc = -(-(args.max_seq + STAGE_W + 32) // 32) * 32
    state = init_state(cfg, B, alloc, quantized=True, chunk=chunk)
    state.lengths = jnp.full((B,), ctx, jnp.int32)
    state.last_token = jnp.ones((B,), jnp.int32)

    if args.spec:
        chunk_fn = make_spec_chunk(cfg, quantized=True, n_steps=chunk,
                                   spec_k=args.spec)
        history0 = jnp.zeros((B, alloc), jnp.int32)
    else:
        chunk_fn = make_decode_chunk(cfg, quantized=True, chunk=chunk)

    @jax.jit
    def chain(params, state, key, n_chunks):
        def body(i, carry):
            state, history, key = carry
            key, sub = jax.random.split(key)
            if args.spec:
                toks, counts, state, history = chunk_fn(
                    params, state, history, sub
                )
            else:
                toks, state = chunk_fn(params, state, sub)
            # keep lengths pinned so the KV stream per step is constant
            # across the chain (marginal timing isolates steady-state cost)
            state.lengths = jnp.full((B,), ctx, jnp.int32)
            return (state, history, key)

        state, _, _ = jax.lax.fori_loop(
            0, n_chunks, body, (state, history0 if args.spec else 0, key)
        )
        return jnp.sum(state.last_token)

    key = jax.random.key(1)
    print("compiling decode chain...", file=sys.stderr, flush=True)
    t0 = time.time()
    float(chain(params, state, key, jnp.int32(1)))
    print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(params, state, key, jnp.int32(1)))
        t1 = time.perf_counter()
        float(chain(params, state, key, jnp.int32(5)))
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / (4 * chunk))
    vals.sort()
    step = vals[1]

    wbytes = sum(
        v.size for v in jax.tree.leaves(params)
        if hasattr(v, "dtype") and v.dtype == jnp.int8
    )
    if args.spec:
        T = args.spec + 1
        print(
            f"{args.model} INT{args.wbits} SPEC decode (k={args.spec}, verify T={T}): "
            f"B={B} ctx={ctx} chunk={chunk}: {step*1e3:.2f} ms/verify-step; "
            f"tokens/s/chip = {B/step:.0f} at zero acceptance .. "
            f"{B*T/step:.0f} at full acceptance "
            f"({wbytes/step/1e9:.0f} GB/s weight stream)",
            flush=True,
        )
    else:
        print(
            f"{args.model} INT{args.wbits} decode ({cfg.n_layers} layers, staged engine path): B={B} ctx={ctx} chunk={chunk}: "
            f"{step*1e3:.2f} ms/step = {B/step:.0f} tokens/s/chip "
            f"({wbytes/1e9:.1f} GB packed weights -> {wbytes/step/1e9:.0f} GB/s)",
            flush=True,
        )


def _bench_prefill(args, cfg, params):
    """Engine prefill program (make_prefill_unrolled) at (B, L):
    tokens/s and TFLOP/s. The TTFT a request sees is this time plus one
    host round-trip (~40 ms on this tunnel)."""
    from nnop_tpu.runtime.engine import make_prefill_unrolled

    B, L = args.batch, args.prefill
    prefill = make_prefill_unrolled(cfg, w8a8=args.w8a8)
    tokens0 = jax.random.randint(
        jax.random.key(2), (B, L), 0, cfg.vocab_size, jnp.int32
    )

    @jax.jit
    def chain(params, tokens0, n):
        def body(i, carry):
            tokens, acc = carry
            logits, k, v = prefill(params, tokens)
            # thread a data dependence so XLA can't hoist the call
            bump = (logits[0, -1, 0] * 0.0).astype(jnp.int32)
            return ((tokens + bump) % cfg.vocab_size,
                    acc + logits[0, -1, 0].astype(jnp.float32))

        _, acc = jax.lax.fori_loop(0, n, body, (tokens0, jnp.float32(0)))
        return acc

    print("compiling prefill chain...", file=sys.stderr, flush=True)
    t0 = time.time()
    float(chain(params, tokens0, jnp.int32(1)))
    print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    vals = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(params, tokens0, jnp.int32(1)))
        t1 = time.perf_counter()
        float(chain(params, tokens0, jnp.int32(4)))
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / 3)
    vals.sort()
    t = vals[1]

    # matmul weight flops: 2 * tokens * (one MAC per int8 weight byte);
    # attention: QK + PV = 2 * 2 * L^2 * E * QH per layer (causal halves
    # the realized work but the MACs visited are what we count for MFU)
    wbytes = sum(
        v.size for v in jax.tree.leaves(params)
        if hasattr(v, "dtype") and v.dtype == jnp.int8
    )
    flops = 2 * B * L * wbytes + (
        2 * 2 * B * L * L * cfg.head_dim * cfg.n_heads * cfg.n_layers
    )
    print(
        f"{args.model} INT{args.wbits} PREFILL ({cfg.n_layers} layers, "
        f"engine unrolled path): B={B} L={L}: {t*1e3:.2f} ms = "
        f"{B*L/t:.0f} tokens/s/chip, {flops/t/1e12:.1f} TFLOP/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
