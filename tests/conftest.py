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
    # persistent compilation cache: CPU jit compiles dominate suite runtime
    # (full suite ~35 min cold); cached reruns cut most of it
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    # cache every compile, however small/fast (defaults skip sub-second ones)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
