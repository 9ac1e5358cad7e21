"""Future-pose rollout from a metric ground-plane trajectory.

Vectorizes the reference's per-step pose loop (trajectory_inference.py:255-298):
heading ``theta_start`` from the mean of the future deltas, per-step travelled
distance and relative heading, and the ±20° jitter clamp that zeroes the heading used
for the *translation* direction (the rotation applied to the mesh/keypoints always
uses the unclamped theta — trajectory_inference.py:291-298 vs :362-363).

All steps are computed at once as fixed-shape (T-1,) arrays; downstream stages vmap
over the step axis, so the rollout is embarrassingly parallel given the pose sequence.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.rotations import z_rot


class Rollout(NamedTuple):
    theta: jnp.ndarray  # (S,) heading change per future step (radians, unclamped)
    translation: jnp.ndarray  # (S, 3) ground-plane translation per step
    distance: jnp.ndarray  # (S,) travelled distance per step
    theta_start: jnp.ndarray  # () initial heading


def rollout_from_meters(meter_coords: jnp.ndarray) -> Rollout:
    """Compute per-step (theta, translation) from (T, 2) metric trajectory coords.

    Step s (s = 0..T-2) corresponds to the reference's n = s+1 loop index.
    """
    t = meter_coords.shape[0]
    start = meter_coords[0]
    deltas = meter_coords[1:] - start  # (T-1, 2)
    theta_start = jnp.arctan2(jnp.mean(deltas[:, 1]), jnp.mean(deltas[:, 0]))

    distance = jnp.linalg.norm(deltas, axis=1)  # (T-1,)
    theta = jnp.arctan2(deltas[:, 1], deltas[:, 0]) - theta_start  # (T-1,)

    # Jitter clamp: interior steps (1 < n < T-2 in reference indexing) compare the
    # incoming and outgoing segment headings; boundary steps test theta itself.
    seg = meter_coords[1:] - meter_coords[:-1]  # (T-1, 2) segment vectors
    seg_theta = jnp.degrees(jnp.arctan2(seg[:, 1], seg[:, 0]))  # heading of segment n
    # For step index s (n = s+1): cur = seg n, nxt = seg n+1.
    cur_theta = seg_theta  # (T-1,)
    nxt_theta = jnp.concatenate([seg_theta[1:], seg_theta[-1:]])  # padded; unused at boundary
    theta_diff = cur_theta - nxt_theta

    n_idx = jnp.arange(1, t)  # reference loop variable n
    interior = (n_idx > 1) & (n_idx < (t - 1) - 1)
    smooth_interior = (theta_diff > -20.0) & (theta_diff < 20.0)
    deg_theta = jnp.degrees(theta)
    smooth_boundary = (deg_theta > -20.0) & (deg_theta < 20.0)
    use_theta = jnp.where(interior, smooth_interior, smooth_boundary)
    theta_tr = jnp.where(use_theta, theta, 0.0)

    # delta_t along -y rotated by the (possibly clamped) heading:
    # tr = (0, -d, 0) @ z_rot(theta_tr)   (trajectory_inference.py:279,291-298)
    rots = z_rot(theta_tr)  # (T-1, 3, 3)
    delta_t = jnp.stack(
        [jnp.zeros_like(distance), -distance, jnp.zeros_like(distance)], axis=1
    )  # (T-1, 3)
    translation = jnp.einsum("si,sij->sj", delta_t, rots)
    return Rollout(
        theta=theta, translation=translation, distance=distance, theta_start=theta_start
    )


def transform_points(points: jnp.ndarray, theta: jnp.ndarray, translation: jnp.ndarray):
    """Apply the reference's per-step rigid motion: p @ z_rot(theta) + tr
    (trajectory_inference.py:362-363). Broadcasts over a leading step axis."""
    rot = z_rot(theta)
    return points @ rot + translation
