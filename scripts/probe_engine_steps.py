"""Per-phase timing of Engine.step() under mixed load (VERDICT r3
item 3 follow-up: the measured mixed-load retention was 7% with 24 s
TTFT — this probe attributes each step's wall time to admission
dispatch, decode dispatch, and collection so the bottleneck is a
measurement, not a guess).

Usage: python scripts/probe_engine_steps.py [--batch 32] [--wbits 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--context", type=int, default=512)
    ap.add_argument("--wbits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--layers", type=int, default=0,
                    help="override layer count (0 = full 8B)")
    ap.add_argument("--paged", action="store_true")
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.runtime import engine as eng_mod
    from nnop_tpu.runtime.engine import Engine

    kw = {}
    if args.layers:
        kw["n_layers"] = args.layers
    cfg = LlamaConfig.llama3_8b(vocab_size=32000, **kw)
    print(f"building random INT{args.wbits} params "
          f"({cfg.n_layers} layers)...", file=sys.stderr, flush=True)
    params = init_quantized_params(jax.random.key(0), cfg,
                                   wbits=args.wbits)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    eng = Engine(params, cfg, max_batch=args.batch,
                 max_seq=1024 + 128 + 8, quantized_kv=True,
                 chunk_size=args.chunk, paged=args.paged)

    # instrument: wrap _admit and _collect
    t_admit = [0.0]
    t_collect = [0.0]
    orig_admit, orig_collect = eng._admit, eng._collect

    def admit():
        t0 = time.perf_counter()
        orig_admit()
        t_admit[0] += time.perf_counter() - t0

    def collect(*a, **k):
        t0 = time.perf_counter()
        orig_collect(*a, **k)
        t_collect[0] += time.perf_counter() - t0

    eng._admit, eng._collect = admit, collect

    # finer: phase timers inside _admit_one (prefill / write / sample)
    orig_admit_one = eng._admit_one
    orig_finalize = eng._finalize_admit

    def admit_one(slot, req, L, n_match, shared):
        t0 = time.perf_counter()
        orig_admit_one(slot, req, L, n_match, shared)
        print(f"    admit_one slot={slot} {time.perf_counter()-t0:.2f}s",
              flush=True)

    def finalize(slot, req, logits, ks, vs, L, n_match):
        t0 = time.perf_counter()
        jax.block_until_ready(logits)
        t_pf = time.perf_counter() - t0  # prefill wait lands here
        t0 = time.perf_counter()
        orig_finalize(slot, req, logits, ks, vs, L, n_match)
        print(f"      prefill-wait {t_pf:.2f}s finalize "
              f"{time.perf_counter()-t0:.2f}s", flush=True)

    eng._admit_one = admit_one
    eng._finalize_admit = finalize

    prompt = [7] * args.context
    for _ in range(args.batch - 2):
        eng.submit(prompt, max_new_tokens=128)
    t0 = time.perf_counter()
    eng.step()
    print(f"first step (admits {args.batch - 2} slots): "
          f"{time.perf_counter()-t0:.1f}s "
          f"(admit {t_admit[0]:.1f}s collect {t_collect[0]:.1f}s)",
          flush=True)

    # pure decode steady state
    for phase in ("decode-only", "decode+2x1024-admission"):
        if phase.endswith("admission"):
            eng.submit([11] * 1024, max_new_tokens=64)
            eng.submit([11] * 1024, max_new_tokens=64)
        n = 8
        t_admit[0] = t_collect[0] = 0.0
        t0 = time.perf_counter()
        for _ in range(n):
            ts = time.perf_counter()
            eng.step()
            print(f"  step {time.perf_counter()-ts:.3f}s", flush=True)
        dt = (time.perf_counter() - t0) / n
        print(f"{phase}: {dt*1e3:.0f} ms/step "
              f"(admit {t_admit[0]/n*1e3:.0f} ms, "
              f"collect {t_collect[0]/n*1e3:.0f} ms, "
              f"dispatch+rest {dt*1e3 - (t_admit[0]+t_collect[0])/n*1e3:.0f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
