"""Test config: run on CPU with 8 virtual devices so multi-chip sharding
logic (tile-parallel ADMM) is exercised without TPU hardware.

Note: the axon TPU plugin in this image overrides the JAX_PLATFORMS env
var, so the platform must be forced via jax.config before first backend
use."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compile cache: re-runs skip XLA compilation
jax.config.update("jax_compilation_cache_dir", "/tmp/scanerf_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
