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

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) >= 8, "tests need 8 virtual CPU devices"
