"""Levenberg–Marquardt PnP ("CPC") as a single jitted lax.while_loop.

Re-designs the reference's solver (utils/cpc.py:47-135, utils/pnp_utils.py:8-130) for
TPU execution while reproducing its numerical policies exactly:

* the reference computes a (2n x 6) Jacobian with one torch.autograd.grad call per
  output scalar (~24 backward passes per LM iteration); here one `jax.jacfwd` of the
  projection residual produces the same Jacobian in a single forward-mode sweep;
* the Python LM loop with data-dependent `break`s becomes a `lax.while_loop` whose
  stopping criteria (gradient inf-norm, relative step size, iteration cap, J^T J
  collapse, singular solve) are evaluated as branchless predicates;
* the 4 canonical-rotation restarts (utils/pnp_utils.py:56-101) are vmapped — they run
  as one batched program instead of 4 sequential solves — and the whole solver vmaps
  again over vehicles.

Stopping policy (utils/pnp_utils.py:8-24): continue while
  ||J^T e||_inf >= 1e-8  AND  ||step|| >= 1e-8 * (||previous params|| + 1e-8)
  AND iteration <= 50, with the first iteration always taken.
Damping policy (utils/pnp_utils.py:27-40): Marquardt gain-ratio update
  rho = (F_prev - F_cur) / (0.5 * u . (lam * u - J^T e_cur));
  rho <= 0 -> lam *= factor, factor *= 2; else lam *= max(1/3, 1-(2 rho - 1)^3),
  factor = 2; lam initialized to 1e-8 * max diag(J^T J) on the first iteration.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.projection import project_normalized
from future_urban_scene_generation_tpu.utils.precision import full_precision
from future_urban_scene_generation_tpu.geometry.rotations import (
    matrix_to_rodrigues,
    rodrigues_to_matrix,
)

_EPS1 = 1e-8  # gradient inf-norm threshold
_EPS2 = 1e-8  # relative step threshold
_MAX_ITERS = 50  # reference stops when iteration > 50
_JTJ_COLLAPSE = 1e-7  # sum(J^T J) below this aborts (utils/cpc.py:103-104)

# Canonical restart rotations ~ 0/90/180/270 degrees of vehicle yaw
# (utils/pnp_utils.py:56,71,86,101) and the shared initial translation (0, 0, 10).
CANONICAL_RVECS = jnp.array(
    [
        [1.1509305, -1.1552572, 1.2745042],
        [-0.12036987, 2.4503145, -2.0552557],
        [1.2133899, 1.1018114, -1.120625],
        [1.6997603, 0.19744678, -0.05384163],
    ],
    dtype=jnp.float32,
)
CANONICAL_TVEC = jnp.array([0.0, 0.0, 10.0], dtype=jnp.float32)


class _LMState(NamedTuple):
    params: jnp.ndarray  # (6,) = rodrigues(3) + t(3)
    lam: jnp.ndarray  # () damping
    factor: jnp.ndarray  # () damping growth factor
    prev_err: jnp.ndarray  # (2n,) error at iteration k-1
    cur_err: jnp.ndarray  # (2n,) error at iteration k
    jac: jnp.ndarray  # (2n, 6) Jacobian at the last evaluated params
    updates: jnp.ndarray  # (6,) last applied step
    final_err: jnp.ndarray  # (2n,) most recent residual (for the returned MSE)
    it: jnp.ndarray  # () int32
    done: jnp.ndarray  # () bool — inner break (JtJ collapse / singular solve)
    has_prev: jnp.ndarray  # () bool — prev_err is valid
    has_cur: jnp.ndarray  # () bool — cur_err is valid


def _residual(params, points3d, points2d, focals, centers):
    pred = project_normalized(points3d, params[:3], params[3:], focals, centers)
    return (pred - points2d).reshape(-1)


def _cholesky_solve_6(a_mat: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve the SPD 6x6 system `a_mat @ x = b` by fully unrolled Cholesky.

    The LM normal matrix J^T J + lam*I is symmetric positive (semi-)definite, so
    Cholesky is the right factorization — and a fixed-size unrolled one is a pure
    elementwise/scalar op chain that XLA fuses into the surrounding LM iteration,
    unlike `jnp.linalg.solve`, whose LU lowering embeds row-pivoting while-loops
    inside the (already latency-bound) outer `lax.while_loop`. A non-SPD matrix
    yields sqrt-of-negative/div-by-zero NaNs, which the caller's finiteness gate
    maps to the reference's singular-solve break (utils/cpc.py:103-110).
    """
    n = 6
    # Column-by-column factorization; rows/cols are static Python ints so every
    # operation below is a scalar (or vmapped-batch) fused multiply-add.
    l_cols = [[None] * n for _ in range(n)]  # l_cols[i][j] = L[i, j], i >= j
    for j in range(n):
        s = a_mat[j, j]
        for k in range(j):
            s = s - l_cols[j][k] * l_cols[j][k]
        diag = jnp.sqrt(s)
        l_cols[j][j] = diag
        inv_diag = 1.0 / diag
        for i in range(j + 1, n):
            s = a_mat[i, j]
            for k in range(j):
                s = s - l_cols[i][k] * l_cols[j][k]
            l_cols[i][j] = s * inv_diag
    # Forward substitution L y = b.
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - l_cols[i][k] * y[k]
        y[i] = s / l_cols[i][i]
    # Back substitution L^T x = y.
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - l_cols[k][i] * x[k]
        x[i] = s / l_cols[i][i]
    return jnp.stack(x)


@full_precision
def lm_pnp_single(
    points3d: jnp.ndarray,
    points2d: jnp.ndarray,
    init_rvec: jnp.ndarray,
    init_tvec: jnp.ndarray,
    focals: jnp.ndarray,
    centers: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One LM solve from one initialization. Returns (rvec, tvec, mse)."""
    points3d = points3d.astype(jnp.float32)
    points2d = points2d.astype(jnp.float32)
    n2 = points2d.size

    res_fn = partial(
        _residual, points3d=points3d, points2d=points2d, focals=focals, centers=centers
    )
    jac_fn = jax.jacfwd(res_fn)

    def cond_fn(s: _LMState):
        # First iteration always runs (policy returns True while errors are None).
        first = jnp.logical_not(s.has_cur)
        g = s.jac.T @ s.cur_err
        stop_g = jnp.max(jnp.abs(g)) < _EPS1
        step_thresh = _EPS2 * (jnp.linalg.norm(s.params - s.updates) + _EPS2)
        stop_step = jnp.linalg.norm(s.updates) < step_thresh
        stop_iters = s.it > _MAX_ITERS
        keep = jnp.logical_not(stop_g | stop_step | stop_iters)
        return jnp.logical_not(s.done) & (first | keep)

    def body_fn(s: _LMState):
        err = res_fn(s.params)
        jac = jac_fn(s.params)
        jtj = jac.T @ jac

        collapse = jnp.sum(jtj) < _JTJ_COLLAPSE
        lam = jnp.where(s.it == 0, 1e-8 * jnp.max(jnp.diag(jtj)), s.lam)

        a_mat = jtj + lam * jnp.eye(6, dtype=jtj.dtype)
        upd = -_cholesky_solve_6(a_mat, jac.T @ err)
        solve_bad = jnp.logical_not(jnp.all(jnp.isfinite(upd)))

        broke = collapse | solve_bad
        step = jnp.logical_not(broke)

        new_params = jnp.where(step, s.params + upd, s.params)
        new_prev = jnp.where(step, s.cur_err, s.prev_err)
        new_cur = jnp.where(step, err, s.cur_err)
        new_has_prev = jnp.where(step, s.has_cur, s.has_prev)
        new_has_cur = s.has_cur | step
        new_it = s.it + jnp.where(step, 1, 0)

        # Damping update (only meaningful once prev_err is valid).
        f_prev = 0.5 * jnp.dot(new_prev, new_prev)
        f_cur = 0.5 * jnp.dot(new_cur, new_cur)
        denom = 0.5 * jnp.dot(upd, lam * upd - jac.T @ new_cur)
        gain = (f_prev - f_cur) / denom
        grow = gain <= 0.0
        lam_next = jnp.where(
            grow, lam * s.factor, lam * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * gain - 1.0) ** 3)
        )
        factor_next = jnp.where(grow, s.factor * 2.0, 2.0)
        apply_pol = step & new_has_prev
        lam = jnp.where(apply_pol, lam_next, lam)
        factor = jnp.where(apply_pol, factor_next, s.factor)

        return _LMState(
            params=new_params,
            lam=lam,
            factor=factor,
            prev_err=new_prev,
            cur_err=new_cur,
            jac=jac,
            updates=jnp.where(step, upd, s.updates),
            final_err=err,
            it=new_it,
            done=broke,
            has_prev=new_has_prev,
            has_cur=new_has_cur,
        )

    init = _LMState(
        params=jnp.concatenate([init_rvec, init_tvec]).astype(jnp.float32),
        lam=jnp.float32(0.0),
        factor=jnp.float32(2.0),
        prev_err=jnp.zeros(n2, jnp.float32),
        cur_err=jnp.zeros(n2, jnp.float32),
        jac=jnp.zeros((n2, 6), jnp.float32),
        updates=jnp.zeros(6, jnp.float32),
        final_err=jnp.zeros(n2, jnp.float32),
        it=jnp.int32(0),
        done=jnp.bool_(False),
        has_prev=jnp.bool_(False),
        has_cur=jnp.bool_(False),
    )
    out = jax.lax.while_loop(cond_fn, body_fn, init)
    mse = jnp.mean(out.final_err**2)
    return out.params[:3], out.params[3:], mse


@full_precision
def solve_pnp_4restarts(
    points3d: jnp.ndarray,
    points2d: jnp.ndarray,
    focals: jnp.ndarray,
    centers: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full CPC solve: 4 vmapped canonical restarts, best-error selection, z-sign fix.

    Mirrors utils/pnp_utils.py:43-130. Returns (mse, rvec (3,), tvec (3,)).
    """
    init_t = jnp.broadcast_to(CANONICAL_TVEC, (4, 3))
    rvecs, tvecs, errors = jax.vmap(
        lambda r0, t0: lm_pnp_single(points3d, points2d, r0, t0, focals, centers)
    )(CANONICAL_RVECS, init_t)

    best = jnp.argmin(errors)
    rvec = rvecs[best]
    tvec = tvecs[best]

    # Flip fix: a solution mirrored through the camera (negative z) is mapped back to
    # the physical one by negating the first two rotation rows and the translation.
    sign = jnp.where(tvec[2] >= 0.0, 1.0, -1.0)
    r_mat = rodrigues_to_matrix(rvec)
    r_mat = r_mat.at[0].multiply(sign).at[1].multiply(sign)
    rvec = matrix_to_rodrigues(r_mat)
    tvec = tvec * sign
    return errors[best], rvec, tvec
