"""Probe: attention at the 8B *training* geometry (VERDICT r2 item 1).

Round-2 benches only ran the reference's toy shape (H=4, E=64). This
probe measures, on the real chip, the shapes the 8B train step actually
uses — B=2, QH=32, KH=8 (GQA group 4), E=128, bf16, causal — plus the
featureful variants (segments / kpad / window) that packed-document and
Mistral/Gemma training hit, so round-3 tuning starts from measured facts.

Writes incrementally to /tmp/probe_prod.json (one line per case) so a
timeout loses nothing.

Usage: python scripts/probe_prod_geom.py [case ...]
  cases: fwd4k bwd4k seg4k segbwd4k kpad4k win4k fwd8k bwd8k fwd16k
"""

import functools
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from nnop_tpu import flash_attention
from nnop_tpu.utils.profiling import marginal_time

B, QH, KH, E = 2, 32, 8, 128
DT = jnp.bfloat16
OUT = "/tmp/probe_prod.json"


def inputs(L):
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, QH, L, E), DT)
    k = jax.random.normal(ks[1], (B, KH, L, E), DT)
    v = jax.random.normal(ks[2], (B, KH, L, E), DT)
    return q, k, v


def seg_ids(L, n_docs=4):
    seg = jnp.repeat(jnp.arange(n_docs, dtype=jnp.int32), L // n_docs)
    seg = jnp.broadcast_to(seg, (B, L))
    return (seg, seg)


def flops(L, causal=True, window=None, bwd=False):
    f = 4 * B * QH * L * L * E
    if window is not None:
        # each row attends ~min(window, row+1) keys
        f = 4 * B * QH * L * min(window, L) * E  # upper bound-ish
    elif causal:
        f //= 2
    return f * (2.5 if bwd else 1.0)


def record(name, t, fl):
    row = dict(name=name, ms=t * 1e3, tflops=fl / t / 1e12)
    print(f"{name}: {t*1e3:.3f} ms = {fl/t/1e12:.1f} TF/s", flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")


# k/v ride the fori_loop carry: closure-captured arrays become PROGRAM
# CONSTANTS in the jitted chain (NOTES.md bench hazard #1) — at L=32k
# that is 2 x 134 MB serialized into the remote-compile request (HTTP 413)


def bench_fwd(name, L, fl, **kw):
    def body(i, c):
        x, k, v = c
        o = flash_attention(x, k, v, causal=True, **kw)
        return (x + 1e-6 * o, k, v)

    t = marginal_time(body, inputs(L), n1=10, n2=60)
    record(name, t, fl)


def bench_bwd(name, L, fl, **kw):
    def body(i, c):
        x, k, v = c
        g = jax.grad(
            lambda a: jnp.sum(
                flash_attention(a, k, v, causal=True, **kw
                                ).astype(jnp.float32)
            )
        )(x)
        return (x + 1e-9 * g, k, v)

    t = marginal_time(body, inputs(L), n1=5, n2=30)
    record(name, t, fl)


CASES = {
    "fwd4k": lambda: bench_fwd("fwd4k", 4096, flops(4096)),
    "bwd4k": lambda: bench_bwd("bwd4k", 4096, flops(4096, bwd=True)),
    "seg4k": lambda: bench_fwd(
        "seg4k", 4096, flops(4096), segment_ids=seg_ids(4096)
    ),
    "segbwd4k": lambda: bench_bwd(
        "segbwd4k", 4096, flops(4096, bwd=True), segment_ids=seg_ids(4096)
    ),
    "kpad4k": lambda: bench_fwd(
        "kpad4k", 4096, flops(4096),
        kpad_mask=jnp.ones((B, 4096), bool),
    ),
    "win4k": lambda: bench_fwd(
        "win4k", 4096, flops(4096, window=1024), window=1024
    ),
    "fwd8k": lambda: bench_fwd("fwd8k", 8192, flops(8192)),
    "bwd8k": lambda: bench_bwd("bwd8k", 8192, flops(8192, bwd=True)),
    "fwd16k": lambda: bench_fwd("fwd16k", 16384, flops(16384)),
    "fwd32k": lambda: bench_fwd("fwd32k", 32768, flops(32768)),
    "bwd16k": lambda: bench_bwd("bwd16k", 16384, flops(16384, bwd=True)),
    "softcap4k": lambda: bench_fwd("softcap4k", 4096, flops(4096), softcap=30.0),
    "win8k": lambda: bench_fwd(
        "win8k", 8192, flops(8192, window=4096), window=4096
    ),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(CASES)
    print(f"devices: {jax.devices()}", flush=True)
    for n in names:
        CASES[n]()
