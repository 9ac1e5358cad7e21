"""On-REAL-TPU check tier: `python -m pytest tests_tpu/ -q`.

Unlike tests/ (which forces a virtual 8-device CPU mesh for portability and
speed), this directory runs on the session's default backend and SKIPS itself
entirely when that backend is not a TPU. It exists because several paths are
numerically or structurally TPU-specific and a CPU suite cannot catch their
regressions:

* Pallas kernels (ops/pallas_conv.py, ops/pallas_raster.py) run in interpret
  mode on CPU — only this tier executes the Mosaic-compiled kernels;
* f32 matmuls default to bf16 MXU passes on TPU, so the @full_precision guard
  around PnP/DLT is load-bearing only here (utils/precision.py);
* the int8 serving tier targets the MXU's double-rate s8 path.

Keep each test's jitted programs small: TPU compiles go through a remote
compile server (seconds each, cached in .jax_cache across runs).
"""
import os

import jax
import pytest

# Persistent compile cache (same store the bench and tests/ use).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


_HERE = os.path.abspath(os.path.dirname(__file__))


def pytest_collection_modifyitems(config, items):
    """Skip-mark ONLY items that live under tests_tpu/.

    pytest hands every conftest's hook the FULL session item list, so a
    root-level ``pytest -m smoke`` collecting both tests/ and tests_tpu/
    would otherwise skip the entire suite with exit code 0 (tests/conftest.py
    forces the CPU backend first, so the not-a-TPU branch always fires in a
    combined collection). Filter on item.path.
    """
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="tests_tpu/ needs a real TPU default backend")
    for item in items:
        if os.path.abspath(str(item.path)).startswith(_HERE + os.sep):
            item.add_marker(skip)
