"""Platform helpers: TPU detection, interpret-mode defaults, VMEM budget.

TPU-native analogue of the reference's device-property layer
(/root/reference/src/NNop.jl:27-30 `shared_memory` LRU cache +
ext/NNopCUDAExt.jl / ext/NNopAMDGPUExt.jl vendor queries): on TPU the only
device property the kernels need is the VMEM budget, and the "backend
dispatch" question collapses to "are we on real TPU hardware (compile via
Mosaic) or not (run Pallas in interpret mode)".
"""

from __future__ import annotations

import functools
import os

import jax

# Per-core VMEM budget in bytes used by block-size autotuning. v4/v5e cores
# expose ~16 MiB of VMEM to Mosaic kernels; we leave headroom for Mosaic's own
# double-buffering of pipelined operands (it allocates 2x each BlockSpec
# operand) by budgeting against this number directly in the selectors.
VMEM_BUDGET_BYTES = int(os.environ.get("NNOP_VMEM_BUDGET", 16 * 1024 * 1024))


@functools.cache
def backend_platform() -> str:
    return jax.devices()[0].platform


def on_tpu() -> bool:
    return backend_platform() == "tpu"


def interpret_default() -> bool:
    """Pallas kernels run in interpret mode off-TPU (tests on CPU).

    This closes the reference's no-CPU-testing gap (SURVEY.md §4): NNop.jl's
    kernels are all `cpu=false` and its suite errors without a GPU
    (/root/reference/test/runtests.jl:16). Pallas interpret mode gives us a
    CPU oracle path for free.
    """
    if os.environ.get("NNOP_FORCE_INTERPRET") == "1":
        return True
    if os.environ.get("NNOP_FORCE_COMPILE") == "1":
        return False
    return not on_tpu()


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def sublane_tile(dtype) -> int:
    """Minimum second-to-minor tile size for a dtype (lane dim is always 128)."""
    import jax.numpy as jnp

    itemsize = jnp.dtype(dtype).itemsize
    return max(8, 32 // max(1, itemsize))


def norm_impl() -> str:
    """'pallas' or 'xla' for the pointwise/reduction ops (norms, softmax,
    rope).

    Measured on v5e (NOTES.md "Small fused ops vs XLA on TPU"): XLA's
    fused formulations meet or beat the pallas kernels at EVERY
    benchmarked shape on this stack — the working sets are VMEM-resident
    at small shapes and the pallas HBM write path caps at ~half the duplex
    bandwidth at streaming shapes (scripts/dma_cap_probe.py) — so the
    library must never hand users the slower path (BASELINE.md: "fused >=
    naive"). Compiled-TPU defaults to 'xla'; interpret/test mode defaults
    to 'pallas' so the kernel suite stays exercised. Override with
    NNOP_NORM_IMPL=pallas|xla.
    """
    v = os.environ.get("NNOP_NORM_IMPL", "auto")
    if v in ("pallas", "xla"):
        return v
    return "xla" if (on_tpu() and not interpret_default()) else "pallas"
