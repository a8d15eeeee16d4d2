"""Repo-root pytest config: force an 8-device virtual CPU mesh.

Tests run Pallas kernels in interpret mode on CPU (fast iteration, no
Mosaic compiles) and sharding tests get 8 virtual devices. The axon
sitecustomize registers the TPU PJRT plugin at interpreter start, so we
must flip jax's platform back to cpu *before* any backend initialization.
Set NNOP_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os

if os.environ.get("NNOP_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        )
    import jax

    jax.config.update("jax_platforms", "cpu")
