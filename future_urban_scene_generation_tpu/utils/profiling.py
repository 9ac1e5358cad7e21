"""Observability: trace annotations + timing harness.

The reference's only instrumentation is a wall-clock print around the whole request
(trajectory_inference.py:46,457-459). Here: jax.profiler trace contexts per stage, a
block_until_ready timing harness, and a lightweight metrics log.
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(name: str):
    """Annotate a region for the jax profiler (shows up in TensorBoard/XProf)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a full device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 1, **kwargs) -> Dict[str, float]:
    """Median/mean wall time of a device function (blocks on outputs)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {
        "p50_ms": times[len(times) // 2] * 1e3,
        "mean_ms": sum(times) / len(times) * 1e3,
        "min_ms": times[0] * 1e3,
    }


class MetricsLogger:
    """Append-only JSONL metrics log (training loops, service requests)."""

    def __init__(self, path: Optional[str] = None):
        self.path = Path(path) if path else None
        self.history: List[Dict[str, Any]] = []

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.history.append(rec)
        if self.path:
            with self.path.open("a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec
