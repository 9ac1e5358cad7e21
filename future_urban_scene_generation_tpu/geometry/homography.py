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
