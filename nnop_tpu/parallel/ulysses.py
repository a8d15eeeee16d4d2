"""Ulysses (DeepSpeed-style) context parallelism: head-scatter /
sequence-gather via all-to-all.

SURVEY.md §2.5 lists this as the optional alternative CP mode to ring
attention: instead of rotating KV chunks (ring_attention.py), each device
trades its sequence shard for a head shard with ONE all_to_all, runs a
full-sequence flash attention on its local heads, and trades back. Two
collectives total (vs n-1 ppermutes), better when heads >= devices and
sequence lengths are moderate; ring wins at very long context (memory).

Must be called inside shard_map over `axis_name`. Differentiable through
JAX's all_to_all transpose + the flash kernel's custom VJP — no dedicated
backward needed.
"""

from __future__ import annotations

import jax

from nnop_tpu.ops.flash_attention import flash_attention


def _heads_to_seq(x, axis_name):
    # (B, H, L/n, E) -> (B, H/n, L, E)
    return jax.lax.all_to_all(
        x, axis_name, split_axis=1, concat_axis=2, tiled=True
    )


def _seq_to_heads(x, axis_name):
    # (B, H/n, L, E) -> (B, H, L/n, E)
    return jax.lax.all_to_all(
        x, axis_name, split_axis=2, concat_axis=1, tiled=True
    )


def ulysses_attention(q, k, v, axis_name: str, causal: bool = True,
                      scale: float | None = None, kpad_mask=None,
                      segment_ids=None):
    """q/k/v: LOCAL shards (B, H, L/n, E), sequence-sharded over axis_name.
    H must be divisible by the axis size. Returns the local (B, H, L/n, E)
    output shard.

    kpad_mask / segment_ids are LOCAL (B, L/n) shards; after the
    head-scatter every device holds the FULL sequence, so the masks are
    all-gathered along the sequence (cheap: O(B*L) bools vs O(B*H*L*E)
    activations) and applied by the full-sequence flash kernel.
    """
    n = jax.lax.psum(1, axis_name)
    if q.shape[1] % n != 0:
        raise ValueError(
            f"Ulysses needs heads ({q.shape[1]}) divisible by axis size {n}"
        )
    qg = _heads_to_seq(q, axis_name)
    kg = _heads_to_seq(k, axis_name)
    vg = _heads_to_seq(v, axis_name)

    def gather_seq(m):
        if m is None:
            return None
        g = jax.lax.all_gather(m, axis_name)  # (n, B, L/n)
        return g.transpose(1, 0, 2).reshape(m.shape[0], -1)

    kpad_g = gather_seq(kpad_mask)
    seg_g = None
    if segment_ids is not None:
        seg_g = (gather_seq(segment_ids[0]), gather_seq(segment_ids[1]))
    og = flash_attention(
        qg, kg, vg, causal=causal, scale=scale, kpad_mask=kpad_g,
        segment_ids=seg_g,
    )
    return _seq_to_heads(og, axis_name)
