"""Surgical in-place KV-cache token writes.

The straightforward cache append — vmap(dynamic_update_slice) with
per-sequence positions — lowers to an XLA scatter that copies the ENTIRE
cache buffer every decode step (measured: ~8 ms/step of hidden traffic for
an 8B at B=32, scaling with batch). This kernel instead aliases the cache
through pallas `input_output_aliases` (zero data movement for the buffer
itself) and read-modify-writes only a small aligned window around each
sequence's position: Mosaic's tiled memrefs forbid size-1 row slices, so
the kernel DMAs a WIN-row window into VMEM, selects the new row in with an
iota compare (the new token is pre-broadcast over the window rows), and
DMAs the window back. Traffic per step: O(B*KH*WIN*E) bytes instead of the
whole cache.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import interpret_default

WIN = 32  # window rows; multiple of every dtype's sublane tiling


def _write_kernel(lens_ref, new_ref, cache_in_ref, cache_out_ref):
    """grid (B, KH): RMW the WIN-row window containing lens[b]."""
    b = pl.program_id(0)
    kh = pl.program_id(1)
    pos = lens_ref[b]
    base = pl.multiple_of((pos // WIN) * WIN, WIN)
    off = pos - base

    def body(win_buf, new_buf, sem_a, sem_b):
        dma_in = pltpu.make_async_copy(
            cache_in_ref.at[b, kh, pl.ds(base, WIN)], win_buf, sem_a
        )
        dma_new = pltpu.make_async_copy(new_ref.at[b, kh], new_buf, sem_b)
        dma_in.start()
        dma_new.start()
        dma_in.wait()
        dma_new.wait()
        rows = jax.lax.broadcasted_iota(jnp.int32, win_buf.shape, 0)
        win_buf[...] = jnp.where(rows == off, new_buf[...], win_buf[...])
        dma_out = pltpu.make_async_copy(
            win_buf, cache_out_ref.at[b, kh, pl.ds(base, WIN)], sem_a
        )
        dma_out.start()
        dma_out.wait()

    E = cache_in_ref.shape[-1]
    pl.run_scoped(
        body,
        pltpu.VMEM((WIN, E), cache_in_ref.dtype),
        pltpu.VMEM((WIN, E), cache_in_ref.dtype),
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    )


def write_kv_token(cache: jax.Array, new: jax.Array, positions: jax.Array):
    """cache (B, KH, S, E) <- new (B, KH, 1, E) at positions (B,); S must be
    a multiple of WIN (=32). Returns the cache updated in place (aliased).
    Also used for scale caches via a trailing singleton: (B, KH, S, 1).
    """
    B, KH, S = cache.shape[:3]
    if S % WIN != 0:
        raise ValueError(f"cache length {S} must be a multiple of {WIN}")
    # pre-broadcast the token row over the window so the kernel never
    # slices a single (tiling-misaligned) row
    new_w = jnp.broadcast_to(new.astype(cache.dtype), (B, KH, WIN, *cache.shape[3:]))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KH),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},  # alias the cache operand
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret_default(),
    )(positions.astype(jnp.int32), new_w, cache)
