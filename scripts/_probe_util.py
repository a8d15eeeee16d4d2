"""Shared marginal-timing harness for the probe scripts.

marginal() times a jitted fori_loop chain of the body at two lengths and
reports the per-iteration difference — host-RTT/dispatch overhead on
this 40 ms-RTT tunnel stack cancels out (same technique as
nnop_tpu/utils/profiling.py; see NOTES "probe variance": +-20% at
~100 us scales, only deltas >30% are actionable there).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def marginal(body, init, n1=6, n2=30):
    @jax.jit
    def chain(n, c):
        def step(i, c):
            return jax.lax.optimization_barrier(body(i, c))
        out = jax.lax.fori_loop(0, n, step, c)
        first = out[0] if isinstance(out, tuple) else out
        return jnp.sum(first.astype(jnp.float32))

    float(chain(jnp.int32(2), init))
    ts = {}
    for n in (n1, n2, n1, n2):
        t0 = time.perf_counter()
        float(chain(jnp.int32(n), init))
        ts[n] = time.perf_counter() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)
