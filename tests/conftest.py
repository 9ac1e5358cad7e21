"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (the standard JAX CPU-simulation trick).

This container's sitecustomize force-registers the 'axon' TPU platform regardless of
JAX_PLATFORMS in the environment, so we override via jax.config after import — this
must happen before any backend is initialized (i.e. before any jnp computation).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's cost is dominated by XLA compiles of the
# big model/pipeline graphs; caching them across runs cuts repeat suite time sharply.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
