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


def breakdown(L):
    """Per-component accounting of one 8B W8A8 prefill layer at M=L
    (VERDICT r3 item 5): matmuls, causal attention, norms+rope,
    activation quantization — summed against the engine's measured
    end-to-end per-layer cost to locate the 252-vs-313 TF/s residual."""
    from nnop_tpu import flash_attention, rms_norm
    from nnop_tpu.ops.quantized_matmul import quantize_act
    from nnop_tpu.ops.rope import RotaryEmbedding, llama_rope

    B, QH, KH, E, D = 1, 32, 8, 128, 4096
    comps = {}

    # matmuls (w8a8 kernel at this M)
    t_mm = 0.0
    for name, K, N in SHAPES:
        x = jax.random.normal(jax.random.key(0), (L, K), jnp.bfloat16)
        w = QTensor(
            jax.random.randint(jax.random.key(1), (K, N), -127, 128,
                               jnp.int8),
            jnp.full((N,), 1e-3, jnp.float32), 0)
        t_mm += marginal(lambda a, w=w: quantized_matmul_w8a8(a, w), x)
    comps["matmuls_w8a8"] = t_mm

    # causal attention at the 8B geometry
    ks = jax.random.split(jax.random.key(2), 3)
    q = jax.random.normal(ks[0], (B, QH, L, E), jnp.bfloat16)
    kk = jax.random.normal(ks[1], (B, KH, L, E), jnp.bfloat16)
    vv = jax.random.normal(ks[2], (B, KH, L, E), jnp.bfloat16)
    comps["attention"] = marginal(
        lambda a: flash_attention(a, kk, vv, causal=True)[:, :, :, :], q)

    # two rms norms + rope per layer
    h = jax.random.normal(jax.random.key(3), (B, L, D), jnp.bfloat16)
    gw = jnp.ones((D,), jnp.float32)
    comps["norms_x2"] = 2 * marginal(lambda a: rms_norm(a, gw), h)
    pos = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
    cos, sin = RotaryEmbedding(E, base=500000.0)(pos)
    qr = jax.random.normal(ks[0], (B, QH, L, E), jnp.bfloat16)
    kr = jax.random.normal(ks[1], (B, KH, L, E), jnp.bfloat16)
    comps["rope"] = marginal(lambda a: llama_rope(a, kr, cos, sin)[0], qr)

    # activation quant: once for qkv input (D), once for gate-up (D),
    # once for down (14336), once for wo (D) — the kernel quantizes
    # per-row inside, but this isolates its cost
    t_q = 0.0
    for K in (D, D, 14336, D):
        x = jax.random.normal(jax.random.key(4), (L, K), jnp.bfloat16)
        t_q += marginal(lambda a: quantize_act(a)[0], x)
    comps["act_quant_x4"] = t_q

    tot = sum(comps.values())
    fl = sum(2 * L * K * N for _, K, N in SHAPES) + 4 * 1 * QH * L * L * E / 2
    print(f"\n--- layer breakdown at L={L} ---")
    for k, v in comps.items():
        print(f"  {k}: {v*1e3:.3f} ms ({100*v/tot:.0f}%)")
    print(f"  SUM {tot*1e3:.3f} ms -> layer-sum bound "
          f"{fl/tot/1e12:.0f} TF/s (matmul-only bound "
          f"{sum(2*L*K*N for _, K, N in SHAPES)/comps['matmuls_w8a8']/1e12:.0f})",
          flush=True)


def main():
    if sys.argv[1:2] == ["--breakdown"]:
        for L in [int(a) for a in sys.argv[2:]] or [512, 1024]:
            breakdown(L)
        return
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
