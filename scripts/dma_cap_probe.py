"""Probe the pallas HBM write-path cap on this stack (VERDICT r1 #4).

Round 1 measured: XLA's fused elementwise loops full-duplex at ~670 GB/s
while write-heavy pallas kernels cap at ~331 GB/s aggregate, and a manual
double-buffered DMA pipeline measured IDENTICAL to the automatic block
pipeline (NOTES.md). This probe pins down the remaining queued ideas
WITHOUT hand-rolled semaphore pipelines (a manual multi-channel DMA
variant wedged the TPU worker on this stack — axon watchdog recovery,
nothing learned; the automatic pipeline already issues one DMA per
block/output, so splitting outputs is the supported way to get multiple
concurrent write streams):

  A. auto block pipeline, 1 output        (baseline: 1 out-DMA stream)
  B. auto block pipeline, 2/4 outputs     (2/4 concurrent out-DMA streams)
  C. write-only kernel                    (isolates the write direction)
  D. XLA fused elementwise copy           (the naive formulation)

If B cannot beat A, the cap is a stack property of pallas HBM writes and
the library is right to dispatch norm/softmax-style streaming ops to
their XLA formulations (utils/platform.py::norm_impl).

Usage: python scripts/dma_cap_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bench import marginal_time

N, E = 16384, 4096  # 256 MB f32
BLK = 256


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


def split_kernel(x_ref, *o_refs):
    n = len(o_refs)
    rows = BLK // n
    for c, o_ref in enumerate(o_refs):
        o_ref[...] = x_ref[c * rows : (c + 1) * rows, :] + 1.0


def split_pipeline(x, n_out):
    """Same traffic as A, but each block's rows go out through n_out
    separate OUTPUT ARRAYS — the block pipeline issues one out-DMA per
    output per grid step, so n_out write streams are concurrently in
    flight (the supported analogue of parallel out-DMA channels)."""
    rows = BLK // n_out
    nblk = N // BLK
    return pl.pallas_call(
        split_kernel,
        grid=(nblk,),
        in_specs=[pl.BlockSpec((BLK, E), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((rows, E), lambda i: (i, 0)) for _ in range(n_out)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblk * rows, E), jnp.float32)
            for _ in range(n_out)
        ],
    )(x)


def any_out_kernel(x_ref, o_hbm, buf, sem):
    """Variant E (the last r1-queued idea): output lives in ANY/HBM and
    the kernel issues its own out-DMA with ONE outstanding copy and an
    in-order wait at the start of the next step — the same safe
    discipline as ops/kv_write.py (hand-rolled multi-channel rotation is
    what wedged the worker in r2; not retried). Double-buffered `buf` so
    the copy overlaps the next block's compute."""
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)

    @pl.when(i > 0)
    def _wait_prev():
        pltpu.make_async_copy(
            buf.at[1 - slot], o_hbm.at[pl.ds((i - 1) * BLK, BLK)], sem
        ).wait()

    buf[slot] = x_ref[...] + 1.0
    pltpu.make_async_copy(
        buf.at[slot], o_hbm.at[pl.ds(i * BLK, BLK)], sem
    ).start()

    @pl.when(i == pl.num_programs(0) - 1)
    def _wait_last():
        pltpu.make_async_copy(
            buf.at[slot], o_hbm.at[pl.ds(i * BLK, BLK)], sem
        ).wait()


def any_out(x):
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        any_out_kernel,
        grid=(N // BLK,),
        in_specs=[pl.BlockSpec((BLK, E), lambda i: (i, 0))],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((N, E), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, BLK, E), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
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

    # couple each variant's output into the carry through a 1-element
    # slice: keeps the carry shape fixed (split/E variants return other
    # shapes) and the pallas call alive under DCE
    rows = [
        ("A auto pipeline (r+w)", lambda i, a: auto_pipeline(a), gb_rw),
        ("C write-only", lambda i, a: write_only(a), gb_w),
        ("D xla fused copy (r+w)", lambda i, a: a + 1.0, gb_rw),
        ("B 2-output split (r+w)",
         lambda i, a: a + split_pipeline(a, 2)[0][:1, :1] * 1e-30, gb_rw),
        ("B 4-output split (r+w)",
         lambda i, a: a + split_pipeline(a, 4)[0][:1, :1] * 1e-30, gb_rw),
        ("E ANY-out manual DMA (r+w)",
         lambda i, a: a + any_out(a)[:1, :1] * 1e-30, gb_rw),
    ]
    for name, body, gb in rows:
        t = marginal_time(body, x)
        print(f"{name}: {t*1e3:.3f} ms = {gb/t:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
