"""Llama-3-8B weight-only-INT8 + INT8-KV decode throughput on one chip.

The north-star serving number (BASELINE.json: "decode tokens/sec/chip
(INT8 KV) at 8B"). Random int8 weights (built directly as QTensors — no
fp materialization), engine decode step (scan over stacked layers,
fused-dequant matmuls, fused INT8-KV flash-decode), marginal-timed.

Roofline: each decode step streams all weights (~8 GB int8) + the live KV
(~B*KH*S*E*2*n_layers bytes) once; tokens/s/chip = B / step_time.

Usage: python scripts/bench_8b.py [--batch 8] [--context 2048]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--context", type=int, default=2048)
    ap.add_argument("--max-seq", type=int, default=4096)
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.runtime.engine import (
        EngineState, init_state, make_decode_step, stack_layers,
    )

    cfg = LlamaConfig.llama3_8b()
    print(f"building random INT8 8B params...", file=sys.stderr, flush=True)
    params = init_quantized_params(jax.random.key(0), cfg)
    sp = stack_layers(params)
    sp = jax.device_put(sp)
    jax.block_until_ready(jax.tree.leaves(sp)[0])

    B, S = args.batch, args.max_seq
    state = init_state(cfg, B, S, quantized=True)
    # pretend a prefill of `context` tokens already happened
    state = EngineState(
        k=state.k, v=state.v, k_scale=state.k_scale, v_scale=state.v_scale,
        lengths=jnp.full((B,), args.context, jnp.int32),
        last_token=jnp.ones((B,), jnp.int32),
    )

    decode = make_decode_step(cfg, quantized=True)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def chain(sp, state, key, n):
        def body(i, carry):
            st, ky = carry
            ky, sub = jax.random.split(ky)
            _, st = decode(sp, st, sub)
            # keep lengths fixed so every step costs the same
            st = EngineState(
                k=st.k, v=st.v, k_scale=st.k_scale, v_scale=st.v_scale,
                lengths=jnp.full((B,), args.context, jnp.int32),
                last_token=st.last_token,
            )
            return (st, ky)
        st, _ = jax.lax.fori_loop(0, n, body, (state, key))
        return jnp.sum(st.last_token)

    key = jax.random.key(1)
    print("compiling decode chain...", file=sys.stderr, flush=True)
    t0 = time.time()

    def run(st, n):
        # state is donated; rebuild it fresh each call
        return float(chain(sp, st, key, jnp.int32(n)))

    def fresh():
        st = init_state(cfg, B, S, quantized=True)
        return EngineState(
            k=st.k, v=st.v, k_scale=st.k_scale, v_scale=st.v_scale,
            lengths=jnp.full((B,), args.context, jnp.int32),
            last_token=jnp.ones((B,), jnp.int32),
        )

    run(fresh(), 2)
    print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    vals = []
    for _ in range(3):
        s4 = fresh(); s16 = fresh()
        t0 = time.perf_counter(); run(s4, 4)
        t1 = time.perf_counter(); run(s16, 16)
        t2 = time.perf_counter()
        vals.append(((t2 - t1) - (t1 - t0)) / 12)
    vals.sort()
    step = vals[1]

    weights_gb = sum(
        v.size for v in jax.tree.leaves(sp)
        if v.dtype == jnp.int8 and v.ndim >= 2
    ) / 1e9
    kv_gb = 2 * cfg.n_layers * B * cfg.n_kv_heads * args.context * cfg.head_dim / 1e9
    toks = B / step
    print(
        f"8B INT8 decode: B={B} ctx={args.context}: {step*1e3:.2f} ms/step "
        f"= {toks:.0f} tokens/s/chip "
        f"(streams ~{weights_gb:.1f} GB weights + {kv_gb:.2f} GB KV/step "
        f"-> {(weights_gb+kv_gb)/step:.0f} GB/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
