"""Probe: causal flash attention at L=8192 — strip variants vs the
rectangular fallback pipeline.

Round-2 gates cap the static strip path at QL//bq <= 8 (L <= 4096 at
bq=512); beyond that causal falls back to the clamped-index rectangular
pipeline, which realizes none of the triangular flop saving. This probe
measures, on the real chip at B2 H4 L8192 E64 bf16:

  A. rect fallback (current behavior for L=8192)
  B. strips bq=512  -> 16 calls
  C. strips bq=1024 -> 8 calls
and fwd+bwd for the winner vs fallback.

Writes /tmp/probe_causal_8k.json.
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nnop_tpu.ops import flash_attention as fa
from nnop_tpu.ops import flash_attention_bwd as fab
from nnop_tpu.utils.profiling import marginal_time

B, H, L, E = 2, 4, 8192, 64
DT = jnp.bfloat16


def make_inputs():
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, H, L, E), DT)
    k = jax.random.normal(ks[1], (B, H, L, E), DT)
    v = jax.random.normal(ks[2], (B, H, L, E), DT)
    return q, k, v


def flops_causal_fwd():
    return 4 * B * H * L * L * E / 2


def run():
    q, k, v = make_inputs()
    scale = E ** -0.5
    results = {}

    def body_public(i, x):
        o = fa.flash_attention(x, k, v, causal=True)
        return x + 1e-6 * o

    def body_strips(bq):
        def f(i, x):
            o, _ = fa._fwd_causal_multicall(x, k, v, scale, None, bq)
            return x + 1e-6 * o
        return f

    t = marginal_time(body_public, q)
    results["rect_fallback_fwd"] = dict(
        time_s=t, tflops=flops_causal_fwd() / t / 1e12)
    print(f"A rect fallback fwd: {t*1e3:.3f} ms "
          f"{flops_causal_fwd()/t/1e12:.1f} TF/s", flush=True)

    for bq in (512,):  # bq=1024 OOMs scoped VMEM at kw=8192 (measured)
        t = marginal_time(body_strips(bq), q)
        results[f"strips_bq{bq}_fwd"] = dict(
            time_s=t, tflops=flops_causal_fwd() / t / 1e12)
        print(f"strips bq={bq} ({L//bq} calls) fwd: {t*1e3:.3f} ms "
              f"{flops_causal_fwd()/t/1e12:.1f} TF/s", flush=True)

    if "--fwd-only" in sys.argv:
        with open("/tmp/probe_causal_8k.json", "w") as f:
            json.dump(results, f, indent=2)
        return

    # fwd+bwd: public path (rect fallback today) vs forced strips
    def loss_public(x):
        return jnp.sum(fa.flash_attention(x, k, v, causal=True)
                       .astype(jnp.float32))

    def fb_public(i, x):
        g = jax.grad(loss_public)(x)
        return x + 1e-6 * g

    t = marginal_time(fb_public, q)
    fl = flops_causal_fwd() * 3.5
    results["rect_fallback_fwdbwd"] = dict(time_s=t, tflops=fl / t / 1e12)
    print(f"A rect fallback fwd+bwd: {t*1e3:.3f} ms {fl/t/1e12:.1f} TF/s",
          flush=True)

    for bq in (512,):
        def fb_strips(i, x, bq=bq):
            o, lse = fa._fwd_causal_multicall(x, k, v, scale, None, bq)
            do = jnp.ones_like(o)
            delta = jnp.sum(
                do.astype(jnp.float32) * o.astype(jnp.float32),
                axis=-1, keepdims=True)
            dq, dk, dv = fab._bwd_causal_multicall(
                x, k, v, lse, delta, do, scale, None, bq)
            return x + 1e-6 * dq

        t = marginal_time(fb_strips, q)
        results[f"strips_bq{bq}_fwdbwd"] = dict(time_s=t, tflops=fl / t / 1e12)
        print(f"strips bq={bq} fwd+bwd: {t*1e3:.3f} ms {fl/t/1e12:.1f} TF/s",
              flush=True)

    with open("/tmp/probe_causal_8k.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    run()
