"""Sharded checkpoint save/restore (orbax) for distributed training.

Extends the dependency-free npz checkpointing in models/weights.py
(single-host trees) to SHARDED pytrees: every host writes only its own
array shards (orbax/tensorstore OCDBT), and restore can re-shard onto a
DIFFERENT mesh layout than the one that saved — the standard
elastic-resume need (e.g. save on dp=4,tp=2; resume on dp=2,tp=4).

The reference has no checkpointing at all (SURVEY.md §5 "Checkpoint /
resume: none"); this is north-star scope for the multi-host training
path. Train-state trees (params + optimizer moments + step counters) are
plain pytrees here, so one save/restore pair covers them.
"""

from __future__ import annotations

import jax


def save_sharded(path: str, tree) -> None:
    """Write `tree` (a pytree of jax.Arrays, sharded or not) to `path`.

    Multi-host safe: each process writes only addressable shards.
    Overwrites an existing checkpoint at `path`.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()


def restore_sharded(path: str, like):
    """Restore a checkpoint into the structure AND shardings of `like`.

    `like` supplies dtypes/shapes and target shardings — pass a tree of
    jax.Arrays (e.g. a freshly initialized, device_put train state) or
    jax.ShapeDtypeStruct(shape, dtype, sharding=...) leaves. The on-disk
    layout may have been written from a different mesh; orbax reshards
    on read, fetching only the shards each host needs.
    """
    import orbax.checkpoint as ocp

    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if isinstance(x, jax.Array) else x,
        like,
    )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target)
