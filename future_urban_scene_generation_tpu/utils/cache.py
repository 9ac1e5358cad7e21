"""Persistent XLA compilation cache, on by default for every CLI entry point.

The reference pays no compile cost (eager torch); here the whole scene program
is one XLA compile that can take 10-25 minutes through the remote TPU compiler.
The persistent cache makes every later process start near-instant for already
seen shapes, so serving restarts and operator CLI runs don't eat a cold compile
(docs/SERVING.md records per-bucket compile expectations).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

_DEFAULT_MIN_COMPILE_SECS = 0.5


def default_cache_dir() -> Path:
    """$FUSG_JAX_CACHE if set, else `.jax_cache` next to the package checkout
    (the same directory tests/conftest.py and bench.py use)."""
    env = os.environ.get("FUSG_JAX_CACHE")
    if env:
        return Path(env)
    pkg_root = Path(__file__).resolve().parents[2]
    return pkg_root / ".jax_cache"


def enable_persistent_cache(cache_dir=None,
                            min_compile_secs: float = _DEFAULT_MIN_COMPILE_SECS):
    """Point jax at a persistent compilation cache; returns the Path, or None
    when the directory can't be created (read-only installs) — in which case
    the process just compiles as before."""
    import jax

    path = Path(cache_dir) if cache_dir is not None else default_cache_dir()
    try:
        path.mkdir(parents=True, exist_ok=True)
    except OSError as exc:
        print(f"persistent compile cache disabled ({exc})", file=sys.stderr)
        return None
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
