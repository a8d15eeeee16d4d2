"""Probe: native int8 MXU matmul (W8A8) vs the cast->bf16 weight-only path.

Prefill is MXU-bound (151 TF/s bf16-equivalent at 8B L=512, ~77% of the
~200 TF/s bf16 peak). v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16
rate (~394 TOPS), so quantizing activations per-token and keeping the dot
in int8 could lift prefill past the bf16 peak. This probe times, at qmm
prefill shapes:

  a) current kernel:  int8 w, cast->bf16, bf16 dot, f32 acc
  b) w8a8 kernel:     int8 x, int8 w, int8 dot, i32 acc, scale at the end
  c) activation quant cost: rowwise amax+scale of x in XLA (the extra pass)

Usage: python scripts/probe_w8a8.py [M ...]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def marginal(fn, args, n1=20, n2=60):
    @jax.jit
    def chain(n, *a):
        def body(i, c):
            r = fn(a[0] + (c * 1e-30).astype(a[0].dtype), *a[1:])
            return c + r.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(chain(n1, *args))
    t0 = time.perf_counter()
    float(chain(n1, *args))
    t1 = time.perf_counter()
    float(chain(n2, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def marginal_int(fn, args, n1=20, n2=60):
    # variant for int8 first arg: perturb by xor-ing low bit of one element
    @jax.jit
    def chain(n, *a):
        def body(i, c):
            x = a[0].at[0, 0].set((c & 1).astype(a[0].dtype))
            r = fn(x, *a[1:])
            return c + r.astype(jnp.int32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    int(chain(n1, *args))
    t0 = time.perf_counter()
    int(chain(n1, *args))
    t1 = time.perf_counter()
    int(chain(n2, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def _cast_kernel(x_ref, w_ref, o_ref, acc, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[...].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def _w8a8_kernel(x_ref, w_ref, o_ref, acc, *, n_k):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_ref[...],
        w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(ik == n_k - 1)
    def _():
        o_ref[...] = acc[...]


def run(kernel, x, w, bm, bk, bn, out_dtype, acc_dtype):
    M, K = x.shape
    N = w.shape[1]
    return pl.pallas_call(
        functools.partial(kernel, n_k=K // bk),
        grid=(N // bn, M // bm, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda n, m, k: (m, k)),
            pl.BlockSpec((bk, bn), lambda n, m, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda n, m, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, w)


def main():
    ms = [int(a) for a in sys.argv[1:]] or [512, 2048]
    K, N = 4096, 14336
    key = jax.random.PRNGKey(0)
    w8 = jax.random.randint(key, (K, N), -127, 128, jnp.int8)
    for M in ms:
        xb = jax.random.normal(key, (M, K), jnp.bfloat16)
        x8 = jax.random.randint(key, (M, K), -127, 128, jnp.int8)
        flops = 2 * M * K * N
        bm = min(512, M)
        t_cast = marginal(
            lambda x, w: run(_cast_kernel, x, w, bm, 1024, 512,
                             jnp.bfloat16, jnp.float32),
            (xb, w8))
        t_w8 = marginal_int(
            lambda x, w: run(_w8a8_kernel, x, w, bm, 1024, 512,
                             jnp.int32, jnp.int32),
            (x8, w8))

        def act_quant(x):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                           keepdims=True)
            s = amax / 127.0
            return jnp.round(x / s).astype(jnp.int8)

        t_q = marginal(act_quant, (xb,))
        print(f"M={M} K={K} N={N}")
        print(f"  cast->bf16 : {t_cast*1e3:8.3f} ms  {flops/t_cast/1e12:6.1f} TF/s")
        print(f"  int8 MXU   : {t_w8*1e3:8.3f} ms  {flops/t_w8/1e12:6.1f} TF/s")
        print(f"  act quant  : {t_q*1e3:8.3f} ms  (overhead {100*t_q/t_w8:.1f}% of int8 mm)")


if __name__ == "__main__":
    main()
