"""Full-precision guard for small-matrix numerical code.

On TPU, f32 matmuls default to bf16 MXU passes. That's the right trade for conv/matmul
FLOPs in the neural nets, but it destroys small ill-conditioned solves (homography DLT,
LM normal equations): measured on a v5e chip, the DLT's A^T A eigensolve under default
precision produced homographies with O(10) transfer error vs O(1e-3) at full precision.

Decorate any geometry solver whose matmuls are tiny (6x6, 9x9, 2n x 6) with
``@full_precision`` — the cost is nil, the accuracy is load-bearing.
"""
from __future__ import annotations

import functools

import jax


def full_precision(fn):
    """Run ``fn`` with HIGHEST matmul precision (full f32 on TPU)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
