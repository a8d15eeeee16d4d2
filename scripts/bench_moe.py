"""MoE layer benchmark: grouped (Pallas, exact work) vs dispatch-einsum
vs dense-equivalent FLOPs, on real TPU.

Shapes: Mixtral-8x7B layer geometry (d=4096, hidden=14336, E=8, top-2)
at serving (T=64) and training (T=8192) token counts, bf16.

Usage: python scripts/bench_moe.py [--dim 4096] [--hidden 14336]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def marginal(fn, h, layer, n1, n2):
    """Fixed-spread marginal timing (bench.py methodology: ~40 ms host
    RTT on this stack, so the n2-n1 spread must represent well over
    0.25 s of device work; sized from the known per-iteration cost).
    `layer` MUST be a jit argument, not a closure capture — captured
    weights become 2.8 GB of embedded program constants that re-upload
    through the axon tunnel on every compile (measured: wedged the
    worker for over an hour)."""
    import time

    @jax.jit
    def chain(h, layer, n):
        def body(i, hh):
            out, _ = fn(hh, layer)
            return jax.lax.optimization_barrier(hh + 1e-6 * out)

        return jnp.sum(
            jax.lax.fori_loop(0, n, body, h).astype(jnp.float32)
        )

    float(chain(h, layer, jnp.int32(2)))  # compile + warm

    def timed(n):
        t0 = time.perf_counter()
        float(chain(h, layer, jnp.int32(n)))
        return time.perf_counter() - t0

    vals = []
    for _ in range(3):
        ta, tb = timed(n1), timed(n2)
        vals.append((tb - ta) / (n2 - n1))
    vals.sort()
    return max(vals[1], 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--hidden", type=int, default=14336)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--topk", type=int, default=2)
    ap.add_argument("--t", type=int, default=0,
                    help="single token count (0 = sweep)")
    ap.add_argument("--impl", type=str, default="",
                    help="single impl: grouped|einsum|grouped_q|"
                    "grouped_q_w8a8 ('' = both)")
    args = ap.parse_args()

    from nnop_tpu.models.llama import LlamaConfig
    from nnop_tpu.models.moe import init_moe_layer, moe_mlp

    cfg = LlamaConfig.tiny(
        dim=args.dim, hidden_dim=args.hidden, n_experts=args.experts,
        n_experts_per_token=args.topk, dtype=jnp.bfloat16,
    )

    def dense(key, shape):
        return jax.random.normal(key, shape, jnp.bfloat16) * 0.02

    layer = init_moe_layer(jax.random.key(0), cfg, dense)
    if args.impl.startswith("grouped_q"):
        from nnop_tpu.ops.quantization import quantize

        qlayer = {
            "w_router": layer["w_router"],
            **{k: quantize(layer[k].astype(jnp.float32), axis=1)
               for k in ("w_gate", "w_up", "w_down")},
        }
    else:
        qlayer = None
    wbytes = sum(v.size * v.dtype.itemsize for v in layer.values())
    print(f"layer: d={args.dim} h={args.hidden} E={args.experts} "
          f"top{args.topk}, {wbytes/1e9:.2f} GB expert weights", flush=True)

    import dataclasses

    t_values = (args.t,) if args.t else (64, 256, 2048, 8192)
    impls = (args.impl,) if args.impl else ("grouped", "einsum")
    for T in t_values:
        h = jax.random.normal(jax.random.key(1), (T, args.dim), jnp.bfloat16)
        # big-T einsum runs at a realistic training capacity factor;
        # dropless einsum at T=8192 is pathological (C = T per expert)
        ecfg = (cfg if T <= 256 else
                dataclasses.replace(cfg, capacity_factor=1.25))
        row = [f"T={T:5d}"]
        for impl in impls:
            lyr = qlayer if impl.startswith("grouped_q") else layer
            # einsum at large T pays O(T*E*C*d) dispatch-mask FLOPs --
            # ~0.9 s/iter at T=2048, ~7 s/iter at T=8192; shrink spreads
            n1, n2 = (32, 288) if T <= 256 else (4, 40)
            if impl == "einsum" and T >= 2048:
                n1, n2 = 2, 12
            def f(h, layer, _impl=impl, _cfg=ecfg):
                c = cfg if _impl != "einsum" else _cfg
                base = "grouped" if _impl.startswith("grouped") else _impl
                return moe_mlp(layer, h, c, act=jax.nn.silu, impl=base,
                               w8a8=_impl.endswith("w8a8"))

            try:
                t = marginal(f, h, lyr, n1, n2)
                # exact-work flops: T*topk tokens x 3 matmuls
                fl = 2 * T * args.topk * 3 * args.dim * args.hidden
                row.append(f"{impl}: {t*1e3:7.3f} ms ({fl/t/1e12:5.1f} TF/s)")
            except Exception as e:  # noqa: BLE001
                row.append(f"{impl}: FAILED {type(e).__name__}: {e}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
