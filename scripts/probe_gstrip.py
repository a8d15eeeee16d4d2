"""Probe: grouped causal strips (g adjacent q-blocks per call, g
independent softmax chains sharing the K/V stream) vs the per-block
strip multicall, at the 8B training geometry.

Round-4 follow-up to the mid-L attribution (NOTES.md): the L=4–8k
residual is per-call ramp / chain-boundary exposure across ~QL/bq strip
calls. Grouping keeps exact causal MXU work while cutting call count g×
and deduplicating the shared KV-prefix DMA.

Usage: python scripts/probe_gstrip.py [--seq 4096 8192]
(backward grouping lives in probe_gstrip_bwd.py)
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
from nnop_tpu.utils.profiling import attention_flops

B, QH, KH, E = 2, 32, 8, 128


def mk(L):
    ks = jax.random.split(jax.random.key(0), 3)
    return (jax.random.normal(ks[0], (B, QH, L, E), jnp.bfloat16),
            jax.random.normal(ks[1], (B, KH, L, E), jnp.bfloat16),
            jax.random.normal(ks[2], (B, KH, L, E), jnp.bfloat16))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, nargs="+", default=[2048, 4096, 8192])
    args = ap.parse_args()

    scale = E ** -0.5
    for L in args.seq:
        q, k, v = mk(L)
        fl = attention_flops(B, QH, L, L, E, causal=True)
        bq, _ = fa.default_blocks(L, L, E, q.dtype, causal=True)

        def body_multi(i, c):
            o, _ = fa._fwd_causal_multicall(c, k, v, scale, None, bq)
            return o.astype(c.dtype)

        t = marginal(body_multi, q)
        print(f"L={L} multicall bq={bq}: {t*1e3:.3f} ms  "
              f"{fl/t/1e12:.1f} TF/s", flush=True)

        for g in (2, 4, 8):
            if (L // bq) % g or L // bq < g:
                continue

            def body_g(i, c, g=g):
                o, _ = fa._fwd_causal_gstrips(c, k, v, scale, None, bq, g)
                return o.astype(c.dtype)

            t = marginal(body_g, q)
            print(f"L={L} gstrips g={g}:    {t*1e3:.3f} ms  "
                  f"{fl/t/1e12:.1f} TF/s", flush=True)


if __name__ == "__main__":
    main()
