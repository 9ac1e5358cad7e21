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


# The slow tier does not fit one bounded invocation; it splits into three
# batches, each under ~10 min on this container's CPU (assigned here by module
# so the partition lives in one place). Whole-suite runbook (commands +
# expected timings): README "Running the tests".
_SLOW_MODELS = {
    # torch-mirror builds + model/trainer parity
    "test_bf16_inference", "test_maskrcnn", "test_vgg", "test_reference_crossval",
    "test_spectral_norm", "test_hourglass_trainer", "test_vunet_trainer",
    "test_inpaint_crossval", "test_train_cli", "test_warp_planes",
    "test_export", "test_vunet_fold",
}
_SLOW_PIPELINE = {
    # full scene-program compiles + sharding equivalence
    "test_pipeline", "test_frame_crossval", "test_sharded_inference",
    "test_parallel_training", "test_model_spec", "test_datagen", "test_aot",
}
_SLOW_SERVE = {
    # CLI/service end-to-end + streaming/tracking + train->export->serve chain
    "test_service_cli", "test_streaming", "test_tracking",
    "test_inpaint_detector", "test_train_export_chain",
}


def pytest_collection_modifyitems(config, items):
    """Everything not marked slow is the smoke tier: `pytest -m smoke` (<3 min on
    CPU) for per-change runs. Slow tests additionally get slow_models,
    slow_pipeline, or slow_serve so the heavy tier runs as bounded batches."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)
        else:
            mod = item.module.__name__.rsplit(".", 1)[-1]
            if mod in _SLOW_MODELS:
                item.add_marker(pytest.mark.slow_models)
            elif mod in _SLOW_PIPELINE:
                item.add_marker(pytest.mark.slow_pipeline)
            else:  # serve batch; new slow modules default here
                item.add_marker(pytest.mark.slow_serve)
