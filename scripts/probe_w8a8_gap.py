"""Probe: where does 8B W8A8 prefill leave int8-MXU throughput (VERDICT
r2 item 6)?

Round 2 measured 237 TF/s at 8B L=512 B=1 vs ~280 TF/s for isolated
w8a8 qmm at M=2048. Candidate residuals: (a) the kernel itself is slower
at M=512 (the prefill-chunk row count), (b) per-row activation quant +
scale fixup, (c) the attention / norm / rope share of the layer, (d) the
last-K-step scale fixup at small M.

This probe times quantized_matmul_w8a8 (and weight-only) at the three 8B
matmul shapes for M in {512, 1024, 2048}, so the engine number can be
compared against a flops-weighted kernel bound at its own M.

Usage: python scripts/probe_w8a8_gap.py [M ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from nnop_tpu.ops.quantization import QTensor
from nnop_tpu.ops.quantized_matmul import quantized_matmul, quantized_matmul_w8a8


def marginal(fn, x, n1=10, n2=60):
    @jax.jit
    def chain(n, x):
        def body(i, c):
            r = fn(c)
            return c + (r.astype(jnp.float32).sum() * 1e-30).astype(c.dtype)

        return jax.lax.fori_loop(0, n, body, x).astype(jnp.float32).sum()

    float(chain(jnp.int32(2), x))
    t0 = time.perf_counter(); float(chain(jnp.int32(n1), x))
    t1 = time.perf_counter(); float(chain(jnp.int32(n2), x))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


SHAPES = [  # the 8B layer matmuls (fused qkv / gate-up / down / wo)
    ("qkv", 4096, 6144),
    ("gateup", 4096, 28672),
    ("down", 14336, 4096),
    ("wo", 4096, 4096),
]


def main():
    ms = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048]
    print(f"devices: {jax.devices()}", flush=True)
    for M in ms:
        tot_fl = tot_w8a8 = tot_wonly = 0.0
        for name, K, N in SHAPES:
            x = jax.random.normal(jax.random.key(0), (M, K), jnp.bfloat16)
            w = QTensor(
                jax.random.randint(jax.random.key(1), (K, N), -127, 128,
                                   jnp.int8),
                jnp.full((N,), 1e-3, jnp.float32),
                0,
            )
            fl = 2 * M * K * N
            ta = marginal(lambda a: quantized_matmul_w8a8(a, w), x)
            tw = marginal(lambda a: quantized_matmul(a, w), x)
            tot_fl += fl
            tot_w8a8 += ta
            tot_wonly += tw
            print(f"M={M} {name} ({K}x{N}): w8a8 {ta*1e3:.3f} ms "
                  f"({fl/ta/1e12:.0f} TF/s) weight-only {tw*1e3:.3f} ms "
                  f"({fl/tw/1e12:.0f} TF/s)", flush=True)
        print(f"M={M} LAYER-WEIGHTED: w8a8 {tot_fl/tot_w8a8/1e12:.0f} TF/s "
              f"weight-only {tot_fl/tot_wonly/1e12:.0f} TF/s", flush=True)


if __name__ == "__main__":
    main()
