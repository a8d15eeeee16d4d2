"""TTFT-vs-retention frontier for the mixed-load admission policy
(VERDICT r4 item 5: attribute the ~1 s TTFT and sweep the knobs).

The engine admits long prompts as interleaved 512-token prefill chunks —
`prefill_chunks_per_step` chunks per engine step, each step gated by one
full decode chunk (`chunk_size` tokens/slot). So, mechanically,

    TTFT ~= ceil(n_chunks / k) x (T_decode_chunk + k x T_prefill_chunk)
            + T_decode_chunk                     (the finalize step)

with T_decode_chunk ~300 ms (B=30, chunk 16) and T_prefill_chunk ~65 ms
of W8A8 compute: the wait is the INTERLEAVE, not the prefill. This
script measures the real frontier over k (and a smaller decode chunk)
through the actual Engine, same workload as bench_engine --mixed-load:
30 active decode streams, two 1024-token prompts admitted concurrently.

Usage: python scripts/bench_ttft_policy.py [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def measure(eng, batch, chunk, new_tokens=128):
    prompt = [7] * 512
    initial_new = min(36 * chunk, eng.max_seq - 512 - 8)
    for _ in range(batch - 2):
        eng.submit(prompt, max_new_tokens=initial_new)
    eng.step()
    for _ in range(4):
        eng.step()
    n_base = 10
    t0 = time.perf_counter()
    for _ in range(n_base):
        eng.step()
    base_dt = (time.perf_counter() - t0) / n_base
    base_tps = (batch - 2) * chunk / base_dt

    long_prompt = [11] * 1024
    t_sub = time.perf_counter()
    r1 = eng.submit(long_prompt, max_new_tokens=new_tokens)
    r2 = eng.submit(long_prompt, max_new_tokens=new_tokens)
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
    mix_tps = (batch - 2) * chunk / mix_dt
    # drain so the next policy starts clean
    eng.run()
    return base_tps, mix_tps, ttft["r1"], ttft["r2"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=32000)
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig, init_quantized_params
    from nnop_tpu.runtime.engine import Engine

    cfg = LlamaConfig.llama3_8b(vocab_size=args.vocab)
    print("building random INT8 8B params...", file=sys.stderr, flush=True)
    params = init_quantized_params(jax.random.key(0), cfg, wbits=8)
    jax.block_until_ready(jax.tree.leaves(params)[0])

    # (label, chunk_size, prefill_chunks_per_step, interleave)
    policies = [
        ("k1_c16 (r4 default)", 16, 1, True),
        ("k2_c16", 16, 2, True),
        ("k4_c16", 16, 4, True),
        ("k1_c8", 8, 1, True),
        ("drain_c16", 16, 1, False),
    ]
    print(f"{'policy':>20} | {'base tok/s':>10} | {'mixed tok/s':>11} | "
          f"{'retained':>8} | {'TTFT r1/r2 (ms)':>16}", flush=True)
    for label, chunk, k, inter in policies:
        eng = Engine(
            params, cfg, max_batch=args.batch, max_seq=1024 + 128 + 8,
            quantized_kv=True, chunk_size=chunk,
            prefill_chunks_per_step=k, interleave_prefill=inter,
        )
        t0 = time.time()
        eng.warmup(prompt_lengths=(512, 1024))
        print(f"  [{label}: warmup {time.time()-t0:.0f}s]",
              file=sys.stderr, flush=True)
        base, mix, t1, t2 = measure(eng, args.batch, chunk)
        print(f"{label:>20} | {base:10.0f} | {mix:11.0f} | "
              f"{100*mix/base:7.0f}% | {t1*1e3:6.0f} / {t2*1e3:6.0f}",
              flush=True)
        del eng
        jax.clear_caches()


if __name__ == "__main__":
    main()
