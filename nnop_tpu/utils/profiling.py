"""Profiling & roofline utilities.

SURVEY.md §5 "Tracing/profiling": the reference only has @btime wall
timing + AllocCache peak memory (benchmarks/main.jl:91-127). The TPU build
needs per-kernel roofline accounting for the ≥85%-of-roofline target, and
a timing method that survives this environment's async dispatch queue
(block_until_ready returns before execution completes; host round-trip is
~40 ms — see bench.py).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp

# TPU v5e (v5 lite) per-chip peaks
PEAK_BF16_TFLOPS = 197.0
PEAK_INT8_TOPS = 394.0
PEAK_HBM_GBPS = 819.0


@dataclasses.dataclass
class Roofline:
    flops: float
    bytes: float
    seconds: float

    @property
    def tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def gbps(self) -> float:
        return self.bytes / self.seconds / 1e9

    @property
    def compute_frac(self) -> float:
        return self.tflops / PEAK_BF16_TFLOPS

    @property
    def hbm_frac(self) -> float:
        return self.gbps / PEAK_HBM_GBPS

    @property
    def bound(self) -> str:
        # which roofline the op is closer to saturating
        return "compute" if self.compute_frac >= self.hbm_frac else "memory"

    def summary(self) -> str:
        return (
            f"{self.seconds*1e3:.3f} ms  {self.tflops:.1f} TF/s "
            f"({100*self.compute_frac:.0f}% MXU)  {self.gbps:.0f} GB/s "
            f"({100*self.hbm_frac:.0f}% HBM)  [{self.bound}-bound]"
        )


def attention_flops(B, H, QL, KL, E, causal=False, bwd=False) -> float:
    f = 4 * B * H * QL * KL * E
    if causal:
        f //= 2
    return f * (2.5 if bwd else 1.0)


def attention_bytes(B, QH, KH, QL, KL, E, itemsize=2) -> float:
    return itemsize * (B * QH * QL * E * 2 + B * KH * KL * E * 2)


def marginal_time(body, init, n1=50, n2=200, reps=3) -> float:
    """Per-iteration seconds of `body(i, x) -> x` chained inside one jit,
    synced by fetching a scalar to host. Marginal between two chain
    lengths cancels dispatch + host latency. See bench.py."""

    @jax.jit
    def chain(x, n):
        out = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(
            jax.tree.reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
                out,
                jnp.float32(0),
            )
        )

    float(chain(init, jnp.int32(2)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(init, jnp.int32(n1)))
        t1 = time.perf_counter()
        float(chain(init, jnp.int32(n2)))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return max(best, 1e-9)


@contextlib.contextmanager
def trace(path: str = "/tmp/jax_trace"):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
