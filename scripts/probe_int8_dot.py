"""Locate the int8 decode-attention bottleneck: cast vs dot strategy.

At engine shapes (S=640) decode_attention streams int8 K/V at ~453 GB/s
while the bf16 variant sustains 722 GB/s on 2x the bytes — the per-
element int8->bf16 cast (10.5M casts/step) is suspected to out-cost the
DMA. This probe times three minimal QK kernels over the same stream:

  a) bf16 K, bf16 dot                      (upper bound)
  b) int8 K, cast->bf16, bf16 dot          (current decode kernel)
  c) int8 K, int8 q, native int8 MXU dot   (candidate: no cast at all)

plus the PV side (p @ V) in the same three flavors. Usage:
  python scripts/probe_int8_dot.py
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def marginal(fn, args, n1, n2):
    @jax.jit
    def chain(n, *a):
        def body(i, c):
            r = fn(a[0] + (c * 1e-30).astype(a[0].dtype), *a[1:])
            return c + r.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    import time

    chain(n1, *args).block_until_ready()
    t0 = time.perf_counter()
    float(chain(n1, *args))
    t1 = time.perf_counter()
    float(chain(n2, *args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def qk_kernel(q_ref, k_ref, o_ref, *, mode):
    # q: (KH, G, E)  k: (KH, S, E)  o: (KH, G, 128)
    KH = k_ref.shape[0]
    for kh in range(KH):
        q = q_ref[kh]
        k = k_ref[kh]
        if mode == "bf16":
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "cast":
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "int8":
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        o_ref[kh] = jnp.sum(
            s.reshape(q.shape[0], -1, 128), axis=1)


def pv_kernel(p_ref, v_ref, o_ref, *, mode):
    # p: (KH, G, S)  v: (KH, S, E)  o: (KH, G, E)
    KH = v_ref.shape[0]
    for kh in range(KH):
        p = p_ref[kh]
        v = v_ref[kh]
        if mode == "bf16":
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "cast":
            o = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        elif mode == "int8":
            pi = jnp.clip(jnp.round(p * 127.0), -127, 127).astype(
                jnp.int8)
            o = jax.lax.dot_general(
                pi, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        o_ref[kh] = o


def run(name, kernel, mode, a, b, oshape, grid_b):
    f = pl.pallas_call(
        functools.partial(kernel, mode=mode),
        grid=(grid_b,),
        in_specs=[
            pl.BlockSpec(a.shape[1:], lambda i: (0,) * (a.ndim - 1)),
            pl.BlockSpec(b.shape[1:], lambda i: (0,) * (b.ndim - 1)),
        ],
        out_specs=pl.BlockSpec(
            oshape, lambda i: (0,) * len(oshape)),
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
    )

    def call(a, b):
        return f(a[0], b[0])

    t = marginal(call, (a, b), 60, 360)
    stream = b[0].size * b.dtype.itemsize * grid_b
    print(f"  {name:28s} {t*1e6:8.1f} us  {stream/t/1e9:6.0f} GB/s",
          flush=True)
    return t


def main():
    B, KH, G, S, E = 32, 8, 4, 640, 128
    ks = jax.random.split(jax.random.key(0), 4)
    # leading dummy batch dim of 1 so marginal() can thread the carry
    q8 = jax.random.randint(ks[0], (1, KH, G, E), -127, 128, jnp.int8)
    qf = (q8.astype(jnp.bfloat16) * 0.01)
    k8 = jax.random.randint(ks[1], (1, KH, S, E), -127, 128, jnp.int8)
    kf = k8.astype(jnp.bfloat16) * 0.01
    p = jax.nn.softmax(
        jax.random.normal(ks[2], (1, KH, G, S), jnp.float32), axis=-1)
    v8 = jax.random.randint(ks[3], (1, KH, S, E), -127, 128, jnp.int8)
    vf = v8.astype(jnp.bfloat16) * 0.01

    print(f"QK side: stream = B*KH*S*E = {B*KH*S*E/1e6:.1f} M "
          f"int8-elems x{B} grid steps", flush=True)
    run("qk bf16 (2x bytes)", qk_kernel, "bf16", qf, kf,
        (KH, G, 128), B)
    run("qk int8 cast->bf16 dot", qk_kernel, "cast", q8, k8,
        (KH, G, 128), B)
    try:
        run("qk int8 native dot", qk_kernel, "int8", q8, k8,
            (KH, G, 128), B)
    except Exception as e:
        print(f"  qk int8 native dot: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    print("PV side:", flush=True)
    run("pv bf16 (2x bytes)", pv_kernel, "bf16", p, vf, (KH, G, E), B)
    run("pv int8 cast->bf16 dot", pv_kernel, "cast", p, v8,
        (KH, G, E), B)
    try:
        run("pv int8 quantize-p dot", pv_kernel, "int8", p, v8,
            (KH, G, E), B)
    except Exception as e:
        print(f"  pv int8 quantize-p dot: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
