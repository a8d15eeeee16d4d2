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
    """Fixed-spread marginal timing (see bench.py for the methodology:
    ~40 ms host RTT on this stack means the n2-n1 spread must represent
    well over 0.25 s of device work; callers size it from the known
    per-iteration cost instead of bench.py's 512-iteration pilot, which
    at Mixtral-layer cost would take minutes)."""
    from bench import marginal_time

    def body(i, hh):
        out, _ = fn(hh, layer)
        return hh + 1e-6 * out  # data dependence chains iterations

    return marginal_time(body, h, n1=n1, n2=n2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=4096)
    ap.add_argument("--hidden", type=int, default=14336)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--topk", type=int, default=2)
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
    wbytes = sum(v.size * v.dtype.itemsize for v in layer.values())
    print(f"layer: d={args.dim} h={args.hidden} E={args.experts} "
          f"top{args.topk}, {wbytes/1e9:.2f} GB expert weights", flush=True)

    import dataclasses

    for T in (64, 256, 2048, 8192):
        h = jax.random.normal(jax.random.key(1), (T, args.dim), jnp.bfloat16)
        # big-T einsum runs at a realistic training capacity factor;
        # dropless einsum at T=8192 is pathological (C = T per expert)
        ecfg = (cfg if T <= 256 else
                dataclasses.replace(cfg, capacity_factor=1.25))
        n1, n2 = (32, 288) if T <= 256 else (4, 40)
        row = [f"T={T:5d}"]
        for impl in ("grouped", "einsum"):
            def f(h, layer, _impl=impl, _cfg=ecfg):
                c = cfg if _impl == "grouped" else _cfg
                return moe_mlp(layer, h, c, act=jax.nn.silu, impl=_impl)

            try:
                t = marginal(f, h, layer, n1, n2)
                # exact-work flops: T*topk tokens x 3 matmuls
                fl = 2 * T * args.topk * 3 * args.dim * args.hidden
                row.append(f"{impl}: {t*1e3:7.3f} ms ({fl/t/1e12:5.1f} TF/s)")
            except Exception as e:  # noqa: BLE001
                row.append(f"{impl}: FAILED {type(e).__name__}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
