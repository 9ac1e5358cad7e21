"""Pinhole projection in jnp (replaces cv2.projectPoints and the reference's
numpy project_points at warp_learn/online_visibility.py:28-56)."""
from __future__ import annotations

import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.rotations import rodrigues_to_matrix
from future_urban_scene_generation_tpu.utils.precision import full_precision


@full_precision
def project_points_extrinsic(points_3d, intrinsic, extrinsic):
    """Project (N, 3) world points with K (3,3) and extrinsic (3,4) or (4,4) -> (N, 2)."""
    ext = extrinsic[:3, :]
    cam = points_3d @ ext[:, :3].T + ext[:, 3]
    proj = cam @ intrinsic.T
    return proj[..., :2] / proj[..., 2:3]


@full_precision
def project_points_rodrigues(points_3d, rvec, tvec, intrinsic):
    """cv2.projectPoints equivalent (zero distortion): (N, 3) -> (N, 2)."""
    r_mat = rodrigues_to_matrix(rvec.reshape(3))
    cam = points_3d @ r_mat.T + tvec.reshape(3)
    proj = cam @ intrinsic.T
    return proj[..., :2] / proj[..., 2:3]


@full_precision
def project_normalized(points_3d, rvec, tvec, focals, centers):
    """Projection parameterized by (fx, fy) and (cx, cy) — the PnP residual's form
    (reference: utils/cpc.py:92-94)."""
    r_mat = rodrigues_to_matrix(rvec)
    cam = points_3d @ r_mat.T + tvec
    return focals * cam[..., :2] / cam[..., 2:3] + centers
