"""Test config: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for exercising pjit/shard_map multi-chip code
paths without TPU hardware (SURVEY.md §4e).  The axon TPU plugin (if present)
force-selects itself via jax.config at interpreter startup, so we must
override through jax.config too — env vars alone are not enough.
"""

import os

if not os.environ.get("OG_TESTS_TPU"):  # OG_TESTS_TPU=1 runs on real hardware
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
