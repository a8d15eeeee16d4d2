"""Multi-host initialization and mesh construction over DCN.

North-star scope (BASELINE.json: "≥90% tokens/s scaling 1 host -> 4
hosts"). The reference has no distributed layer at all (SURVEY.md §2.5);
on TPU the comm backend IS jax.distributed + XLA collectives: ICI within a
slice, DCN across hosts. This module is the thin host-topology layer —
everything else (tp_llama, ring_attention) is topology-agnostic because it
only sees mesh axis names.

Single-host environments (including this one) exercise the same code with
num_processes=1; the driver's dryrun validates the sharded program
compiles and runs on an n-device mesh.
"""

from __future__ import annotations

import os

import jax
from jax.sharding import Mesh

from nnop_tpu.parallel.mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR etc.).

    No-op on single-process setups.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR"
    )
    if coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")),
        process_id=process_id or int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def make_multihost_mesh(*, data_per_host: int = 1, model: int | None = None,
                        seq: int = 1) -> Mesh:
    """Mesh layout for multi-host pods: the "data" axis spans hosts (DCN —
    only gradient/batch collectives cross it), while "model" and "seq"
    stay inside a host's chips (ICI — the latency-sensitive TP psums and
    ring-attention ppermutes never leave the slice)."""
    n_local = jax.local_device_count()
    n_hosts = jax.process_count()
    if model is None:
        model = max(1, n_local // (seq * data_per_host))
    data = n_hosts * data_per_host
    return make_mesh(data=data, model=model, seq=seq)
