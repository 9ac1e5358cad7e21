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
        # m is SPD by construction (damping + gauge fill), so Cholesky: on TPU
        # the tiny-matrix LU's pivoting while_loop is pure latency.
        chol = jax.scipy.linalg.cho_factor(m)
        delta = jax.scipy.linalg.cho_solve(chol, -(j.T @ r))
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


def _unit_square_to_quad(q):
    """Closed-form projective map from the unit square's corners
    (0,0),(1,0),(1,1),(0,1) to quad corners ``q`` (4, 2) — the classic
    bilinear-to-projective construction: one 2x2 Cramer solve for the
    perspective terms (g, h), everything else affine."""
    s = q[0] - q[1] + q[2] - q[3]
    d1 = q[1] - q[2]
    d2 = q[3] - q[2]
    den = d1[0] * d2[1] - d1[1] * d2[0]
    den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
    g = (s[0] * d2[1] - s[1] * d2[0]) / den
    h = (d1[0] * s[1] - d1[1] * s[0]) / den
    a = q[1] - q[0] + g * q[1]
    b = q[3] - q[0] + h * q[3]
    one = jnp.ones((), q.dtype)
    return jnp.stack([
        jnp.stack([a[0], b[0], q[0, 0]]),
        jnp.stack([a[1], b[1], q[0, 1]]),
        jnp.stack([g, h, one]),
    ])


def _adj3(m):
    """Adjugate of a 3x3 (closed form): adj(M) = det(M) * M^-1 without the
    division, so composing with it keeps a homography's projective scale
    freedom instead of amplifying a near-zero determinant."""
    def cof(i0, i1, j0, j1):
        return m[i0, j0] * m[i1, j1] - m[i0, j1] * m[i1, j0]

    return jnp.stack([
        jnp.stack([cof(1, 2, 1, 2), -cof(0, 2, 1, 2), cof(0, 1, 1, 2)]),
        jnp.stack([-cof(1, 2, 0, 2), cof(0, 2, 0, 2), -cof(0, 1, 0, 2)]),
        jnp.stack([cof(1, 2, 0, 1), -cof(0, 2, 0, 1), cof(0, 1, 0, 1)]),
    ])


def _quad_nondegenerate(q, tol: float = 1e-4):
    """True iff every corner triangle of the (Hartley-normalized) quad has
    |cross| above ``tol`` — the rank condition of the 4-point DLT system
    (>= 3 collinear or coincident corners is exactly where cv2.findHomography
    returns None). Normalized quads have O(1) extent, so the threshold is
    scale-free; a 1-px-thick sliver on a 100-px plane measures ~0.05, two
    orders above it."""
    crosses = []
    for i in range(4):
        e1 = q[(i + 1) % 4] - q[i]
        e2 = q[(i + 2) % 4] - q[i]
        crosses.append(jnp.abs(e1[0] * e2[1] - e1[1] * e2[0]))
    return jnp.min(jnp.stack(crosses)) > tol


@full_precision
def find_homography_quad(
    src: jnp.ndarray, dst: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form exact-interpolation homography for EXACTLY 4 correspondences.

    H = S2Q(dst_n) @ adj(S2Q(src_n)) on Hartley-normalized points — two 2x2
    Cramer solves, one adjugate, two 3x3 matmuls. No eigensolve, no LU: on TPU
    those tiny-matrix decompositions are sequential while_loops (pure latency),
    and in f32 the DLT's A^T A squares the condition number, leaving the eigh
    null vector with multi-pixel transfer error on sliver quads (measured
    7.3 px on a 1-px-thick quad; this construction measures ~2e-5 px there —
    the f32 floor — and ~3e-5 px on generic quads).

    Used by the plane-warp path for its effectively-4-point planes
    (TEXTURE_PLANES rows 2-4 pad to 6 points by repeating the last corner,
    reference planes_utils.py:46-68 / warp_learn keypoint schema): least
    squares over duplicated rows has the same exact-fit solution, so this is
    numerically the reference's map, just solved stably. Returns (H with
    H[2,2]=1, valid); valid is False for (near-)degenerate quads — where
    cv2.findHomography returns None and the reference skips the plane.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    src_n, t_src = _normalize_points(src)
    dst_n, t_dst = _normalize_points(dst)
    h_n = _unit_square_to_quad(dst_n) @ _adj3(_unit_square_to_quad(src_n))
    # t_dst is a similarity [[s,0,-s*cx],[0,s,-s*cy],[0,0,1]]: closed-form inverse.
    s = t_dst[0, 0]
    inv_t_dst = jnp.stack([
        jnp.stack([1.0 / s, jnp.zeros((), s.dtype), -t_dst[0, 2] / s]),
        jnp.stack([jnp.zeros((), s.dtype), 1.0 / s, -t_dst[1, 2] / s]),
        jnp.stack([jnp.zeros((), s.dtype), jnp.zeros((), s.dtype),
                   jnp.ones((), s.dtype)]),
    ])
    h_mat = inv_t_dst @ (h_n @ t_src)

    scale = h_mat[2, 2]
    finite = jnp.all(jnp.isfinite(h_mat)) & (jnp.abs(scale) > 1e-12)
    valid = _quad_nondegenerate(src_n) & _quad_nondegenerate(dst_n) & finite
    h_out = jnp.where(
        valid, h_mat / jnp.where(jnp.abs(scale) > 1e-12, scale, 1.0), jnp.eye(3)
    )
    return h_out, valid


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
