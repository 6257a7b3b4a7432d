"""Test env: run everything on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (the JAX-native answer to
multi-node simulation).

Note: the container's sitecustomize registers the axon TPU plugin and pins
the platform before conftest runs, so env vars alone don't work — the
platform must be reset through jax.config before first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: single-core CPU compiles dominate test time;
# cache across test processes.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
