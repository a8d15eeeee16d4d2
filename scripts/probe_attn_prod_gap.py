"""Probe: close or prove the mid-L causal attention gap (VERDICT r3
item 4).

At the 8B training geometry (B2 QH32 KH8 E128, causal bf16) the strip
path measures ~126 TF/s fwd / ~128 fwd+bwd at L=4096 vs 164 TF/s at
L=32k. This probe (a) sweeps the strip tile parameters (bq, sk) at
L=4096/8192 for fwd and fwd+bwd, and (b) prints a roofline accounting
(DMA bytes at the 670 GB/s measured copy rate, MXU time at the 206 TF/s
measured matmul rate, and a VPU estimate for the exp/mask/state passes)
so a residual can be attributed rather than hand-waved.

The sk sweep monkeypatches flash_attention._CAUSAL_STRIP_SK (probe-only;
the shipped constant is chosen from this probe's results).

Usage: python scripts/probe_attn_prod_gap.py [--seq 4096] [--bwd]
"""

import argparse
import itertools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import nnop_tpu.ops.flash_attention as fa
import nnop_tpu.ops.flash_attention_bwd as fab
from nnop_tpu import flash_attention

B, QH, KH, E = 2, 32, 8, 128
MXU_TFS = 206.0   # measured bf16 matmul rate (NOTES.md calibration)
HBM_GBS = 670.0   # measured copy rate


def mk(L):
    ks = jax.random.split(jax.random.key(0), 3)
    return (jax.random.normal(ks[0], (B, QH, L, E), jnp.bfloat16),
            jax.random.normal(ks[1], (B, KH, L, E), jnp.bfloat16),
            jax.random.normal(ks[2], (B, KH, L, E), jnp.bfloat16))


def marginal(body, init, n1=6, n2=30):
    @jax.jit
    def chain(n, c):
        def step(i, c):
            return jax.lax.optimization_barrier(body(i, c))
        out = jax.lax.fori_loop(0, n, step, c)
        return jnp.sum(out[0].astype(jnp.float32))

    float(chain(jnp.int32(2), init))
    ts = {}
    for n in (n1, n2, n1, n2):
        t0 = time.perf_counter()
        float(chain(jnp.int32(n), init))
        ts[n] = time.perf_counter() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


_ORIG_BLOCKS = fa.default_blocks


def time_cfg(L, bq, sk, bwd):
    # probe-only: force the strip tile sizes through the module knobs
    # (the public API deliberately has no block args — launchers own
    # block selection, SURVEY L3)
    fa._CAUSAL_STRIP_SK = sk

    def forced(q_len, kv_len, head_dim, dtype, causal=False):
        return bq, _ORIG_BLOCKS(q_len, kv_len, head_dim, dtype, causal)[1]

    fa.default_blocks = forced
    fab.default_blocks = forced

    if bwd:
        def body(i, c):
            q, k, v = c
            g = jax.grad(lambda a: jnp.sum(flash_attention(
                a, k, v, causal=True).astype(jnp.float32)))(q)
            return (q + 1e-9 * g, k, v)
    else:
        def body(i, c):
            q, k, v = c
            return (q + 1e-6 * flash_attention(
                q, k, v, causal=True), k, v)
    t = marginal(body, mk(L))
    fl = 4 * B * QH * L * L * E / 2 * (2.5 if bwd else 1.0)
    return t, fl / t / 1e12


def roofline(L, bwd):
    """Analytic floors for the strip decomposition at (L, bq=512)."""
    bq = 512
    n = L // bq
    # KV DMA: call i fetches (i+1)*bq keys+values per (b, kh) — the
    # pipeliner reuses the block across the GQA group (index map is
    # h//group); q/o stream once per (b, qh)
    kv_bytes = 2 * B * KH * sum((i + 1) * bq for i in range(n)) * E * 2
    qo_bytes = 2 * B * QH * L * E * 2 * n / n  # q in + o out, once each
    lse = B * QH * L * 4
    dma = kv_bytes + qo_bytes + lse
    flops = 4 * B * QH * L * L * E / 2
    if bwd:
        # dq strips + dkv strips revisit the same tiles with ~2.5x MXU
        # work; dkv also streams the GQA group's q/do per kv strip
        dma = dma * 3.2  # fwd recompute-free: o/lse/do/dq/dk/dv streams
        flops *= 2.5
    t_dma = dma / (HBM_GBS * 1e9)
    t_mxu = flops / (MXU_TFS * 1e12)
    # VPU: ~6 f32 element-passes over visited score tiles (exp, mask
    # where diagonal, m/l updates, p scale+cast) at ~1e12 f32 ops/s
    # effective on v5e VPU (8x128 lanes, ~0.94 GHz)
    visited = B * QH * L * L / 2
    t_vpu = 6 * visited / 1e12 * (2.2 if bwd else 1.0)
    print(f"  roofline L={L} {'bwd' if bwd else 'fwd'}: "
          f"DMA {t_dma*1e3:.2f} ms, MXU {t_mxu*1e3:.2f} ms, "
          f"VPU~ {t_vpu*1e3:.2f} ms -> max(...)="
          f"{max(t_dma, t_mxu, t_vpu)*1e3:.2f} ms = "
          f"{flops/max(t_dma, t_mxu, t_vpu)/1e12:.0f} TF/s bound",
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, nargs="*", default=[4096, 8192])
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--bq", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--sk", type=int, nargs="*", default=[256, 512, 1024])
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    sk0 = fa._CAUSAL_STRIP_SK

    for L in args.seq:
        for bwd in ([False, True] if args.bwd else [False]):
            roofline(L, bwd)
            for bq, sk in itertools.product(args.bq, args.sk):
                if sk > bq or L % bq or (L // bq) > 32:
                    continue
                # keep the widest strip inside the KV VMEM budget
                if 4 * L * E * 2 > 24 * 1024 * 1024:
                    continue
                fa._CAUSAL_STRIP_MAX_CALLS = max(
                    fa._CAUSAL_STRIP_MAX_CALLS, L // bq)
                try:
                    t, tf = time_cfg(L, bq, sk, bwd)
                    print(f"L={L} {'bwd' if bwd else 'fwd'} bq={bq} "
                          f"sk={sk}: {t*1e3:.3f} ms = {tf:.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"L={L} bq={bq} sk={sk}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
    fa._CAUSAL_STRIP_SK = sk0


if __name__ == "__main__":
    main()
