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
# Cache even small compiles: the suite spends minutes re-compiling hundreds of
# sub-2s programs per run if only big ones persist (0.1s threshold measured the
# smoke tier 6:07 -> ~3 min on the second run).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Everything not marked slow is the smoke tier: `pytest -m smoke` (<3 min on
    CPU) for per-change runs, `pytest -m slow` (or no -m) for the full suite."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
