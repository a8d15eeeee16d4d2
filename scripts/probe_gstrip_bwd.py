"""Probe: grouped backward strips at the 8B training geometry.

Two separate levers (flash_attention_bwd._bwd_causal_multicall):
- gq: g adjacent q-blocks per dQ call (g independent chains, shared KV
  prefix stream — same idea as the fwd gstrips, which measured NEUTRAL).
- gk: gk-wide dKdV KV blocks. Unlike the fwd, this cuts REAL DMA bytes:
  every dKdV call re-reads the FULL q/do/lse/delta tensors for the GQA
  group, so call count is a first-order bandwidth term (~(QL/bq) full
  re-reads). gk=2 halves it.

Usage: python scripts/probe_gstrip_bwd.py [--seq 4096 8192]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _probe_util import marginal

import nnop_tpu.ops.flash_attention as fa
import nnop_tpu.ops.flash_attention_bwd as fab
from nnop_tpu.utils.profiling import attention_flops

B, QH, KH, E = 2, 32, 8, 128


def mk(L):
    ks = jax.random.split(jax.random.key(0), 4)
    return (jax.random.normal(ks[0], (B, QH, L, E), jnp.bfloat16),
            jax.random.normal(ks[1], (B, KH, L, E), jnp.bfloat16),
            jax.random.normal(ks[2], (B, KH, L, E), jnp.bfloat16),
            jax.random.normal(ks[3], (B, QH, L, E), jnp.bfloat16))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, nargs="+", default=[4096, 8192])
    ap.add_argument("--groups", type=str, nargs="+",
                    default=["1,1", "2,1", "1,2", "2,2", "1,4"])
    args = ap.parse_args()

    scale = E ** -0.5
    for L in args.seq:
        q, k, v, do = mk(L)
        # bwd flops = 2.5x fwd (dq + dkdv + score recompute x2)
        fl = attention_flops(B, QH, L, L, E, causal=True) * 2.5
        bq, _ = fa.default_blocks(L, L, E, q.dtype, causal=True)
        o, lse = fa._fwd_causal_multicall(q, k, v, scale, None, bq)
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=-1, keepdims=True)

        for gs in args.groups:
            gq, gk = (int(x) for x in gs.split(","))

            def body(i, c, gq=gq, gk=gk):
                dq, dk, dv = fab._bwd_causal_multicall(
                    c, k, v, lse, delta, do, scale, None, bq, gq=gq, gk=gk)
                return dq.astype(c.dtype)

            t = marginal(body, q)
            print(f"L={L} gq={gq} gk={gk}: {t*1e3:.3f} ms  "
                  f"{fl/t/1e12:.1f} TF/s (bwd-only)", flush=True)


if __name__ == "__main__":
    main()
