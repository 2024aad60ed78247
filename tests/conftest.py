"""Test configuration: force a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU plugin and imports jax at
interpreter startup, so JAX_PLATFORMS env tweaks come too late; we override
through jax.config instead. Multi-chip sharding tests then run on fake CPU
devices (the facility the reference lacks — its GPU tests need real
hardware); real-TPU benchmarks live in bench.py, not the test suite.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the container has ONE CPU core, so the
# suite's wall time is dominated by compiles; cache keys hash the HLO +
# compile options, so code changes that alter a computation re-compile and
# anything untouched hits. First full run populates (~no overhead),
# repeat runs cut most of the compile time.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".pytest_cache", "jax_compilation_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) >= 8, "tests need 8 virtual CPU devices"
