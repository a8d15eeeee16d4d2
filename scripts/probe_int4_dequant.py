"""Probe: int4 dequant VPU-chain variants in the dense qmm4 kernel.

The int4 kernels are VPU-unpack-bound, not DMA-bound (round-4 analysis:
at 32x4096x28672 the measured 0.117 ms ~= 4.5 VPU passes over 58.7M
packed bytes at ~3.9e12 op/s, vs 0.088 ms of pure packed-byte DMA at
670 GB/s; the grouped MoE variant shows the same bound wiping out
int4's halved stream entirely — Mixtral int4 2028 vs int8 2017 tok/s).

Variants over the dequant chain (per element):
  A (shipped): i8->i32, shift, i32->f32, f32 scale mul, ->bf16   (~4.5)
  B: i8->i32, shift, i32->bf16, bf16 scale mul                   (~3.5)
     (weights -8..7 are exact in bf16; the scale mul rounds in bf16
      instead of f32 — quant noise is ~2^-3 of a step, cast noise 2^-8)

Usage: python scripts/probe_int4_dequant.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _probe_util import marginal
from nnop_tpu.ops.quantized_matmul import cdiv
from nnop_tpu.ops.quantization import dequantize4, quantize4
from nnop_tpu.utils.platform import interpret_default

M, K, N = 32, 4096, 28672


def _kernel(x_ref, w_ref, s_ref, o_ref, acc, *, n_k, groups, group,
            variant):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    b = w_ref[...].astype(jnp.int32)
    half, bn = b.shape
    planes = ((b << 28) >> 28, b >> 4)
    x = x_ref[...].astype(jnp.bfloat16)
    s = s_ref[...]
    gh = groups // 2
    for h, w in enumerate(planes):
        sw = s[h * gh:(h + 1) * gh].reshape(gh, 1, bn)
        if variant == "A":
            wsc = (
                (w.astype(jnp.float32).reshape(gh, group, bn) * sw)
                .reshape(half, bn).astype(jnp.bfloat16)
            )
        else:  # B: direct bf16 convert + bf16 scale mul
            wsc = (
                w.astype(jnp.bfloat16).reshape(gh, group, bn)
                * sw.astype(jnp.bfloat16)
            ).reshape(half, bn)
        acc[...] += jax.lax.dot_general(
            x[:, h * half:(h + 1) * half], wsc,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def run(x, wq, variant, bm=32, bn=2048):
    P = wq.pack_block
    groups = P // wq.group
    kp = 2 * wq.packed.shape[0]
    kernel = functools.partial(
        _kernel, n_k=kp // P, groups=groups, group=wq.group,
        variant=variant,
    )
    return pl.pallas_call(
        kernel,
        grid=(cdiv(N, bn), cdiv(M, bm), kp // P),
        in_specs=[
            pl.BlockSpec((bm, P), lambda n, m, k: (m, k)),
            pl.BlockSpec((P // 2, bn), lambda n, m, k: (k, n)),
            pl.BlockSpec((groups, bn), lambda n, m, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, m, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret_default(),
    )(x, wq.packed, wq.scale)


def main():
    ks = jax.random.split(jax.random.key(0), 2)
    x = jax.random.normal(ks[0], (M, K), jnp.bfloat16)
    w = jax.random.normal(ks[1], (K, N), jnp.bfloat16) * 0.02
    wq = quantize4(w)

    # reference: dequantized bf16 matmul
    ref = jnp.asarray(x, jnp.float32) @ dequantize4(wq)
    packed_bytes = wq.packed.size + wq.scale.size * 4
    for variant in ("A", "B", "A", "B"):
        out = run(x, wq, variant)
        err = float(jnp.linalg.norm(out.astype(jnp.float32) - ref)
                    / jnp.linalg.norm(ref))

        def body(i, c, variant=variant):
            return c + 1e-9 * run(c, wq, variant)[:, :K]

        t = marginal(body, x, n1=8, n2=40)
        print(f"variant {variant}: {t*1e3:.3f} ms  "
              f"{packed_bytes/t/1e9:.0f} GB/s packed  rel_err {err:.5f}",
              flush=True)


if __name__ == "__main__":
    main()
