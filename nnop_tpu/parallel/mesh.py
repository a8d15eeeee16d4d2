"""Device mesh helpers.

The TPU-native equivalent of a comm backend (SURVEY.md §2.5: the reference
has none — single device): axes are logical ("data", "model", "seq"),
collectives are XLA psum/ppermute over ICI inside shard_map.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, model: int = 1, seq: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model * seq
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return jax.make_mesh(
        (data, seq, model), ("data", "seq", "model"), devices=devices[:n]
    )
