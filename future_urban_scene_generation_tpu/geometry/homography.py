"""Homography estimation (normalized DLT) in jnp — replaces cv2.findHomography.

The plane-warping stage estimates one homography per texture plane from 4-6 keypoint
correspondences (warp_learn/planes_utils.py:71-72). The correspondences are projections
of (approximately) coplanar 3D points, so no RANSAC is needed — a least-squares DLT
with Hartley normalization matches cv2.findHomography(method=0) to high accuracy, and a
few Gauss-Newton refinement steps close the remaining gap on the overdetermined 6-point
planes (cv2 runs an LM polish after DLT).

The solve is a fixed-shape 9x9 symmetric eigenproblem — vmappable over the 5 planes x N
vehicles and TPU-friendly (no SVD of tall matrices).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.utils.precision import full_precision


def _normalize_points(pts):
    """Hartley normalization: translate centroid to origin, mean distance sqrt(2)."""
    centroid = jnp.mean(pts, axis=0)
    d = jnp.linalg.norm(pts - centroid, axis=1)
    mean_d = jnp.mean(d)
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    t_mat = jnp.array(
        [
            [s, 0.0, -s * centroid[0]],
            [0.0, s, -s * centroid[1]],
            [0.0, 0.0, 1.0],
        ],
        dtype=pts.dtype,
    )
    normed = (pts - centroid) * s
    return normed, t_mat


def _dlt(src_n, dst_n):
    """DLT system on normalized points: rows of A for each correspondence."""
    n = src_n.shape[0]
    x, y = src_n[:, 0], src_n[:, 1]
    u, v = dst_n[:, 0], dst_n[:, 1]
    zeros = jnp.zeros(n, src_n.dtype)
    ones = jnp.ones(n, src_n.dtype)
    row1 = jnp.stack([x, y, ones, zeros, zeros, zeros, -u * x, -u * y, -u], axis=1)
    row2 = jnp.stack([zeros, zeros, zeros, x, y, ones, -v * x, -v * y, -v], axis=1)
    a_mat = jnp.concatenate([row1, row2], axis=0)  # (2n, 9)
    # Null vector of A via smallest eigenvector of A^T A (9x9 symmetric).
    ata = a_mat.T @ a_mat
    eigvals, eigvecs = jnp.linalg.eigh(ata)
    h = eigvecs[:, 0]
    return h.reshape(3, 3), eigvals


def _gn_polish_normed(h, src_n, dst_n, iters: int = 2):
    """Analytic-Jacobian Gauss-Newton polish of the DLT null vector, in the
    Hartley-normalized frame.

    Why this exists: forming A^T A squares the DLT system's condition number,
    so in f32 the eigh null vector of a SLIVER polygon's system (front/back
    texture planes near edge-on) carries multi-pixel transfer error — measured
    7.3 px on a degenerate quad, and worse, the error is partitioning-dependent
    (XLA fuses the A/A^T A formation differently under SPMD batch sharding, so
    `synthesize_scene_sharded` warped those planes differently than the
    single-chip program). Two GN steps on the transfer residual converge to the
    4-point-interpolating homography regardless of those last-bit input
    differences: measured 7.3 px -> 0.015 px on the sliver and ~f32-floor
    (<2e-5 px) elsewhere, restoring sharded == unsharded to float noise.

    Unlike :func:`_sampson_refine` the Jacobian is closed-form (d pred / dh for
    pred = (h0.p, h1.p)/h2.p), so this adds no jacfwd subgraphs to the scene
    program — the compile-cost reason the warp path runs refine=False stands.
    Gauge: scaling h leaves pred invariant, so J h = 0 exactly and J^T r is
    orthogonal to h; adding tr * h h^T to the damped normal matrix fills that
    null direction at the dominant eigenvalue scale WITHOUT changing the
    solution, keeping the 9x9 solve well-conditioned in f32.
    """
    n = src_n.shape[0]
    p = jnp.concatenate([src_n, jnp.ones((n, 1), src_n.dtype)], axis=1)  # (n,3)
    zeros = jnp.zeros((n, 3), src_n.dtype)
    eye9 = jnp.eye(9, dtype=src_n.dtype)

    for _ in range(iters):
        h_m = h.reshape(3, 3)
        cp = p @ h_m[2]
        cp = jnp.where(jnp.abs(cp) < 1e-12, 1e-12, cp)
        pred_x = (p @ h_m[0]) / cp
        pred_y = (p @ h_m[1]) / cp
        r = jnp.concatenate([pred_x - dst_n[:, 0], pred_y - dst_n[:, 1]])
        p_cp = p / cp[:, None]
        j_x = jnp.concatenate([p_cp, zeros, -pred_x[:, None] * p_cp], axis=1)
        j_y = jnp.concatenate([zeros, p_cp, -pred_y[:, None] * p_cp], axis=1)
        j = jnp.concatenate([j_x, j_y], axis=0)  # (2n, 9)
        jtj = j.T @ j
        tr = jnp.trace(jtj)
        m = jtj + tr * jnp.outer(h, h) + (1e-7 * tr) * eye9
        delta = jnp.linalg.solve(m, -(j.T @ r))
        cand = h + delta
        cand = cand / jnp.maximum(jnp.linalg.norm(cand), 1e-12)
        h = jnp.where(jnp.all(jnp.isfinite(cand)), cand, h)
    return h


def _sampson_refine(h_mat, src, dst, iters: int = 10):
    """Gauss-Newton refinement of the transfer error (cv2's post-DLT LM polish)."""
    h0 = h_mat.reshape(9)

    def residual(hv):
        hm = hv.reshape(3, 3)
        ones = jnp.ones((src.shape[0], 1), src.dtype)
        src_h = jnp.concatenate([src, ones], axis=1)
        proj = src_h @ hm.T
        pred = proj[:, :2] / proj[:, 2:3]
        return (pred - dst).reshape(-1)

    jac_fn = jax.jacfwd(residual)

    def step(hv, _):
        r = residual(hv)
        j = jac_fn(hv)
        jtj = j.T @ j + 1e-9 * jnp.eye(9, dtype=hv.dtype)
        upd = -jnp.linalg.solve(jtj, j.T @ r)
        upd = jnp.where(jnp.all(jnp.isfinite(upd)), upd, jnp.zeros_like(upd))
        return hv + upd, None

    hv, _ = jax.lax.scan(step, h0, None, length=iters)
    return hv.reshape(3, 3)


@full_precision
def find_homography(
    src: jnp.ndarray, dst: jnp.ndarray, refine: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate H mapping src -> dst from (n, 2) correspondences, n >= 4.

    Returns (H (3,3) normalized so H[2,2] = 1, valid flag). ``valid`` is False for
    degenerate configurations (rank-deficient DLT system / vanishing H[2,2]) — the
    case where cv2.findHomography returns None and the reference skips the plane
    (warp_learn/planes_utils.py:74-79).
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    src_n, t_src = _normalize_points(src)
    dst_n, t_dst = _normalize_points(dst)
    h_n, eigvals = _dlt(src_n, dst_n)
    if not refine:
        # The cheap closed-form polish replaces the sampson pass on the
        # refine=False (plane-warp) path — see _gn_polish_normed for why the
        # bare f32 eigh null vector is not enough there.
        h_n = _gn_polish_normed(h_n.reshape(9), src_n, dst_n).reshape(3, 3)
    # Denormalize: H = T_dst^-1 H_n T_src
    h_mat = jnp.linalg.solve(t_dst, h_n @ t_src)

    if refine:
        h_mat = _sampson_refine(h_mat, src, dst)

    scale = h_mat[2, 2]
    # Degeneracy: the two smallest eigenvalues of A^T A comparable (no unique null
    # vector), or non-finite / vanishing scale.
    rank_ok = eigvals[1] > 1e-6 * jnp.maximum(eigvals[-1], 1e-12)
    finite = jnp.all(jnp.isfinite(h_mat)) & (jnp.abs(scale) > 1e-12)
    valid = rank_ok & finite
    h_out = jnp.where(valid, h_mat / jnp.where(jnp.abs(scale) > 1e-12, scale, 1.0), jnp.eye(3))
    return h_out, valid
