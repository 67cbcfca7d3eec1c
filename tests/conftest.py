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
# OPT-IN persistent compile cache (SCANERF_COMPILE_CACHE=1): re-runs
# skip XLA compilation, BUT this jaxlib crashes (SIGSEGV in
# put_executable_and_time / SIGABRT in get_executable_and_time) when
# (de)serializing the large 2D-mesh shard_map executables of
# test_table_parallel / test_trainer_e2e (observed 3x, 2026-08-18), so
# the default — the path the driver's gate runs — stays cache-free.
#
# Related jaxlib fragility: a single long pytest process can SIGSEGV
# inside backend_compile_and_load after ~60-75 min of accumulated CPU
# compiles (whatever compiles late is the victim). The blessed gate is
# therefore process-isolated: ``python tests/run_suite.py`` runs the
# suite in subprocess batches; a plain ``pytest tests/`` still works
# but carries that risk on a full run.
if os.environ.get("SCANERF_COMPILE_CACHE"):
    jax.config.update("jax_compilation_cache_dir", "/tmp/scanerf_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def pytest_collection_modifyitems(config, items):
    """Run the big shard_map compile suites FIRST (see the SIGSEGV note
    above): the crash reproduces only when test_trainer_e2e's later
    compiles land after ~an hour of accumulated CPU compiles, and never
    in a fresh process — fronting them keeps the full-suite gate off
    the fragile path without hiding any test."""
    front = ("test_trainer_e2e", "test_table_parallel")

    def key(item):
        name = os.path.basename(str(item.fspath))
        for i, f in enumerate(front):
            if name.startswith(f):
                return (i, name)
        return (len(front), name)

    items.sort(key=key)
