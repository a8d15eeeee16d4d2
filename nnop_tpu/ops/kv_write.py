"""Surgical in-place KV-cache token writes.

The straightforward cache append — vmap(dynamic_update_slice) with
per-sequence positions — lowers to an XLA scatter that copies the ENTIRE
cache buffer every decode step (measured: ~8 ms/step of hidden traffic for
an 8B at B=32, scaling with batch). This kernel instead aliases the cache
through pallas `input_output_aliases` (zero data movement for the buffer
itself) and DMAs ONLY the new token rows into place: the cache stays in
HBM (`memory_space=ANY`), the (1, E) row rides through VMEM, and a manual
async copy lands it at the per-sequence offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nnop_tpu.utils.platform import interpret_default


def _write_kernel(lens_ref, new_ref, cache_in_ref, cache_out_ref):
    """grid (B, KH): copy new[b, kh, 0, :] into cache[b, kh, lens[b], :].

    cache_in/cache_out are the SAME HBM buffer (aliased); only the token
    row moves.
    """
    b = pl.program_id(0)
    kh = pl.program_id(1)
    pos = lens_ref[b]

    def body(sem):
        dma = pltpu.make_async_copy(
            new_ref.at[b, kh],                      # (1, E) row in HBM
            cache_out_ref.at[b, kh, pl.ds(pos, 1)],  # target row
            sem,
        )
        dma.start()
        dma.wait()

    pl.run_scoped(body, pltpu.SemaphoreType.DMA)
    del cache_in_ref


def write_kv_token(cache: jax.Array, new: jax.Array, positions: jax.Array):
    """cache (B, KH, S, ...) <- new (B, KH, 1, ...) at positions (B,).

    Returns the updated cache, aliased in-place (donate the input!).
    Works for the (B, KH, S, E) value caches and (B, KH, S) scale caches
    (the latter reshaped to (B, KH, S, 1) by the caller).
    """
    B, KH = cache.shape[:2]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KH),
        in_specs=[
            # both stay in HBM: untiled memrefs allow the size-1 row
            # slices the DMA needs (int8 VMEM tiling would forbid them)
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},  # alias the cache operand
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret_default(),
    )(positions.astype(jnp.int32), new, cache)
