"""Rotation math in jnp: axis rotations, Rodrigues axis-angle <-> matrix, extrinsics.

Replaces the reference's numpy/torch rotation helpers (utils/geometry.py:10-113,203-220)
and its cv2.Rodrigues calls with closed-form, differentiable jnp — `rodrigues_to_matrix`
is the function the PnP solver differentiates through with jax.jacfwd.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def x_rot(alpha, clockwise: bool = False):
    """Rotation about X (counter-clockwise unless `clockwise`), (3,3)."""
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    s = -s if clockwise else s
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, c, -s], -1),
            jnp.stack([zero, s, c], -1),
        ],
        -2,
    )


def y_rot(alpha, clockwise: bool = False):
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    s = -s if clockwise else s
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-s, zero, c], -1),
        ],
        -2,
    )


def z_rot(alpha, clockwise: bool = False):
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    s = -s if clockwise else s
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], -1),
            jnp.stack([s, c, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )


def rodrigues_to_matrix(rvec):
    """Axis-angle (3,) -> rotation matrix (3,3). Differentiable; safe at theta ~ 0.

    R = I cos(t) + (1 - cos(t)) u u^T + [u]_x sin(t), u = r / ||r||
    (same formula the reference builds in torch at utils/cpc.py:84-90).
    """
    theta = jnp.linalg.norm(rvec)
    safe_theta = jnp.maximum(theta, _EPS)
    u = rvec / safe_theta
    ux, uy, uz = u[0], u[1], u[2]
    zero = jnp.zeros_like(ux)
    cross = jnp.stack(
        [
            jnp.stack([zero, -uz, uy], -1),
            jnp.stack([uz, zero, -ux], -1),
            jnp.stack([-uy, ux, zero], -1),
        ],
        -2,
    )
    c, s = jnp.cos(theta), jnp.sin(theta)
    eye = jnp.eye(3, dtype=rvec.dtype)
    r_mat = eye * c + (1.0 - c) * jnp.outer(u, u) + cross * s
    # As theta -> 0 the formula degrades (u ill-defined); fall back to first order.
    first_order = eye + _skew(rvec)
    return jnp.where(theta < 1e-8, first_order, r_mat)


def _skew(v):
    zero = jnp.zeros_like(v[0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[2], v[1]], -1),
            jnp.stack([v[2], zero, -v[0]], -1),
            jnp.stack([-v[1], v[0], zero], -1),
        ],
        -2,
    )


def matrix_to_rodrigues(r_mat):
    """Rotation matrix (3,3) -> axis-angle (3,), matching cv2.Rodrigues conventions."""
    trace = jnp.clip((jnp.trace(r_mat) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(trace)
    # Generic case: axis from the skew-symmetric part.
    axis_unnorm = jnp.stack(
        [
            r_mat[2, 1] - r_mat[1, 2],
            r_mat[0, 2] - r_mat[2, 0],
            r_mat[1, 0] - r_mat[0, 1],
        ]
    )
    sin_theta = jnp.sin(theta)
    generic = axis_unnorm / jnp.maximum(2.0 * sin_theta, _EPS) * theta

    # theta ~ pi: axis from diagonal of (R + I) / 2 = u u^T.
    uu = jnp.maximum((jnp.diag(r_mat) + 1.0) * 0.5, 0.0)
    u_abs = jnp.sqrt(uu)
    # Fix signs using off-diagonal products; pick the largest component as reference.
    k = jnp.argmax(u_abs)
    signs_by_k = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.ones(()),
                    jnp.sign(r_mat[0, 1] + r_mat[1, 0]),
                    jnp.sign(r_mat[0, 2] + r_mat[2, 0]),
                ]
            ),
            jnp.stack(
                [
                    jnp.sign(r_mat[0, 1] + r_mat[1, 0]),
                    jnp.ones(()),
                    jnp.sign(r_mat[1, 2] + r_mat[2, 1]),
                ]
            ),
            jnp.stack(
                [
                    jnp.sign(r_mat[0, 2] + r_mat[2, 0]),
                    jnp.sign(r_mat[1, 2] + r_mat[2, 1]),
                    jnp.ones(()),
                ]
            ),
        ]
    )
    signs = signs_by_k[k]
    signs = jnp.where(signs == 0.0, 1.0, signs)
    near_pi = u_abs * signs * theta

    near_zero = jnp.abs(theta) < 1e-7
    is_near_pi = jnp.abs(theta - jnp.pi) < 1e-5
    return jnp.where(
        near_zero, jnp.zeros(3, r_mat.dtype), jnp.where(is_near_pi, near_pi, generic)
    )


def extrinsic_from_rodrigues(rvec, tvec):
    """Build a (4,4) camera extrinsic from Rodrigues r and translation t
    (reference: utils/geometry.py:203-220)."""
    rvec = rvec.reshape(3)
    tvec = tvec.reshape(3)
    r_mat = rodrigues_to_matrix(rvec)
    top = jnp.concatenate([r_mat, tvec[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def delta_t_vec(axis: str, t_value):
    """Translation vector along a named axis (utils/geometry.py:140-144)."""
    idx = {"x": 0, "y": 1, "z": 2}[axis]
    return jnp.zeros(3).at[idx].set(t_value)


def intrinsic_matrix(focal, cx, cy):
    """Square-pixel zero-skew K (utils/geometry.py:116-127)."""
    zero = jnp.zeros_like(jnp.asarray(focal, jnp.float32))
    one = jnp.ones_like(zero)
    f = jnp.asarray(focal, jnp.float32)
    return jnp.stack(
        [
            jnp.stack([f, zero, jnp.asarray(cx, jnp.float32)]),
            jnp.stack([zero, f, jnp.asarray(cy, jnp.float32)]),
            jnp.stack([zero, zero, one]),
        ]
    )


def rotmat_to_az_el_radius(camera_coords):
    """Camera position -> (azimuth deg, elevation deg, radius), wrapped to [0, 360)
    (utils/geometry.py:147-161)."""
    tx, ty, tz = camera_coords[0], camera_coords[1], camera_coords[2]
    azimuth = jnp.degrees(jnp.arctan2(tx, tz))
    proj = jnp.stack([tx, jnp.zeros_like(ty), tz])
    cam_n = camera_coords / jnp.linalg.norm(camera_coords)
    proj_n = proj / jnp.maximum(jnp.linalg.norm(proj), 1e-12)
    elevation = jnp.degrees(jnp.arccos(jnp.clip(jnp.dot(cam_n, proj_n), -1.0, 1.0)))
    azimuth = jnp.mod(azimuth, 360.0)
    elevation = jnp.mod(elevation, 360.0)
    return azimuth, elevation, jnp.linalg.norm(camera_coords)
