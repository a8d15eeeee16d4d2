"""Engine-measured serving throughput (VERDICT r1 #3 done-criterion:
engine tok/s within 10% of bench_8b at the same batch).

Unlike scripts/bench_8b.py (which times the raw jitted chunk program),
this drives the ACTUAL Engine object — host scheduler, slot bookkeeping,
token collection, chunk dispatch — so the number includes every real
serving overhead. Requests are sized so all slots stay busy through the
measurement window.

Usage: python scripts/bench_engine.py [--batch 32] [--chunk 16]
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
    ap.add_argument("--new-tokens", type=int, default=128)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--wbits", type=int, default=8, choices=(4, 8))
    ap.add_argument("--mixed-load", action="store_true",
                    help="measure decode tok/s while LONG prompts admit "
                    "concurrently (interleaved chunked admission), plus "
                    "each admission's TTFT (VERDICT r2 item 5)")
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig.llama3_8b(vocab_size=args.vocab)
    print(f"building random INT{args.wbits} 8B params...", file=sys.stderr, flush=True)
    t0 = time.time()
    params = init_quantized_params(jax.random.key(0), cfg, wbits=args.wbits)
    jax.block_until_ready(jax.tree.leaves(params)[0])
    print(f"param init {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    eng = Engine(
        params, cfg,
        max_batch=args.batch,
        max_seq=(max(args.context, 1024) if args.mixed_load
                 else args.context) + args.new_tokens + 8,
        quantized_kv=True,
        chunk_size=args.chunk,
        paged=args.paged,
    )
    print("warmup (compiles all serving-path programs)...",
          file=sys.stderr, flush=True)
    t0 = time.time()
    eng.warmup(prompt_lengths=(args.context, 1024)
               if args.mixed_load else (args.context,))
    print(f"warmup {time.time()-t0:.0f}s", file=sys.stderr, flush=True)

    prompt = [7] * args.context
    n_initial = args.batch - 2 if args.mixed_load else args.batch
    # mixed mode: the background streams must outlast first step + 4
    # discard + 10 baseline + ~16 mixed-window chunks
    initial_new = (min(36 * args.chunk, eng.max_seq - args.context - 8)
                   if args.mixed_load else args.new_tokens)
    for _ in range(n_initial):
        eng.submit(prompt, max_new_tokens=initial_new)

    print("prefill...", file=sys.stderr, flush=True)
    t0 = time.time()
    eng.step()  # admits all slots (prefill) + first decode chunk
    print(f"first step {time.time()-t0:.0f}s",
          file=sys.stderr, flush=True)

    if args.mixed_load:
        # discard a few post-admission steps (pipeline fill + stragglers
        # from the 30-slot admission burst), THEN take the baseline over
        # a real window
        for _ in range(4):
            eng.step()
        n_base = 10
        t0 = time.perf_counter()
        for _ in range(n_base):
            eng.step()
        base_dt = (time.perf_counter() - t0) / n_base
        base_tps = (args.batch - 2) * args.chunk / base_dt  # 2 slots spare

        # hold 2 slots back for admissions: two LONG prompts arrive while
        # all other streams decode; the mixed window spans submit ->
        # both admitted + a few follow-on steps (the disturbance window)
        long_prompt = [11] * 1024
        t_sub = time.perf_counter()
        r1 = eng.submit(long_prompt, max_new_tokens=args.new_tokens)
        r2 = eng.submit(long_prompt, max_new_tokens=args.new_tokens)
        ttft = {}
        n_mix = 0
        t0 = time.perf_counter()
        while not (r1.out and r2.out) or n_mix < 8:
            eng.step()
            n_mix += 1
            now = time.perf_counter()
            for name, r in (("r1", r1), ("r2", r2)):
                if r.out and name not in ttft:
                    ttft[name] = now - t_sub
        mix_dt = (time.perf_counter() - t0) / max(1, n_mix)
        mix_tps = (args.batch - 2) * args.chunk / mix_dt
        print(
            f"mixed-load: decode {base_tps:.0f} -> {mix_tps:.0f} tok/s "
            f"during 2x1024-token admissions "
            f"({100 * mix_tps / base_tps:.0f}% retained), "
            f"TTFT {ttft['r1'] * 1e3:.0f} / {ttft['r2'] * 1e3:.0f} ms "
            f"(B={args.batch} chunk={args.chunk})",
            flush=True,
        )
        return

    # steady-state measurement: count tokens collected across chunks
    n_chunks = max(2, (args.new_tokens // args.chunk) - 2)
    tok0 = sum(len(r.out) for r in eng.slots if r is not None)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        eng.step()
    dt = time.perf_counter() - t0
    tok1 = sum(
        len(r.out) for r in eng.slots if r is not None
    ) + 0  # finished slots excluded; sized to stay busy
    toks = args.batch * args.chunk * n_chunks  # all slots active by design
    print(
        f"engine-measured: {dt/n_chunks*1e3:.1f} ms/chunk = "
        f"{toks/dt:.0f} tokens/s/chip "
        f"(B={args.batch} chunk={args.chunk} paged={args.paged})",
        flush=True,
    )
    del tok0, tok1


if __name__ == "__main__":
    main()
