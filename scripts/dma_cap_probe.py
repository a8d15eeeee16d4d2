"""Probe the pallas HBM write-path cap on this stack (VERDICT r1 #4).

Round 1 measured: XLA's fused elementwise loops full-duplex at ~670 GB/s
while write-heavy pallas kernels cap at ~331 GB/s aggregate, and a manual
double-buffered DMA pipeline measured IDENTICAL to the automatic block
pipeline. This probe tries the remaining queued ideas:

  A. auto block pipeline (baseline, 1 in + 1 out stream)
  B. manual pipeline with K parallel out-DMA channels (K semaphores,
     interleaved row chunks, all in flight at once)
  C. write-only kernel (isolates the write direction)
  D. XLA fused elementwise copy (the naive formulation's transport)

If B cannot beat A, the cap is a stack/hardware property of pallas HBM
writes and the library is right to dispatch norm/softmax-style streaming
ops to their XLA formulations (see ops/rms_norm.py dispatch).

Usage: python scripts/dma_cap_probe.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import marginal_time

N, E = 16384, 4096  # 256 MB f32
BLK = 256  # 2 pipelines x 2 slots x (BLK,E) f32 = 8 MB VMEM


def copy_block_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] + 1.0


def auto_pipeline(x):
    return pl.pallas_call(
        copy_block_kernel,
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec((BLK, E), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((BLK, E), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, E), jnp.float32),
    )(x)


def manual_kchan_kernel(x_hbm, o_hbm, *, k_chan):
    nblk = N // BLK

    def body(inbuf, outbuf, in_sems, out_sems):
        def get_in(slot, i):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * BLK, BLK)], inbuf.at[slot], in_sems.at[slot]
            )

        def put_out(slot, i, chan):
            # split the block into k_chan interleaved row chunks, one DMA
            # per chunk on its own semaphore — all concurrently in flight
            rows = BLK // k_chan
            return pltpu.make_async_copy(
                outbuf.at[slot, pl.ds(chan * rows, rows)],
                o_hbm.at[pl.ds(i * BLK + chan * rows, rows)],
                out_sems.at[slot, chan],
            )

        get_in(0, 0).start()

        def loop(i, _):
            slot = i % 2
            nxt = (i + 1) % 2

            @pl.when(i + 1 < nblk)
            def _():
                get_in(nxt, i + 1).start()

            get_in(slot, i).wait()

            @pl.when(i >= 2)
            def _():
                for c in range(k_chan):
                    put_out(slot, i - 2, c).wait()

            outbuf[slot] = inbuf[slot] + 1.0
            for c in range(k_chan):
                put_out(slot, i, c).start()
            return 0

        jax.lax.fori_loop(0, nblk, loop, 0)
        for i in (nblk - 2, nblk - 1):
            slot = i % 2
            for c in range(k_chan):
                put_out(slot, i, c).wait()

    pl.run_scoped(
        body,
        pltpu.VMEM((2, BLK, E), jnp.float32),
        pltpu.VMEM((2, BLK, E), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2, 8)),
    )


def manual_kchan(x, k_chan):
    return pl.pallas_call(
        functools.partial(manual_kchan_kernel, k_chan=k_chan),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, E), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


def write_only_kernel(o_ref):
    o_ref[...] = jnp.full((BLK, E), 3.0, jnp.float32)


def write_only(x):
    del x
    return pl.pallas_call(
        write_only_kernel,
        grid=(N // BLK,),
        out_specs=pl.BlockSpec((BLK, E), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, E), jnp.float32),
    )()


def main():
    x = jax.random.normal(jax.random.key(0), (N, E), jnp.float32)
    gb_rw = 2 * N * E * 4 / 1e9
    gb_w = N * E * 4 / 1e9

    rows = [
        ("A auto pipeline (r+w)", lambda i, a: auto_pipeline(a), gb_rw),
        ("C write-only", lambda i, a: write_only(a), gb_w),
        ("D xla fused copy (r+w)", lambda i, a: a + 1.0, gb_rw),
        ("B manual 1-chan (r+w)", lambda i, a: manual_kchan(a, 1), gb_rw),
        ("B manual 4-chan (r+w)", lambda i, a: manual_kchan(a, 4), gb_rw),
        ("B manual 8-chan (r+w)", lambda i, a: manual_kchan(a, 8), gb_rw),
    ]
    for name, body, gb in rows:
        t = marginal_time(body, x)
        print(f"{name}: {t*1e3:.3f} ms = {gb/t:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
