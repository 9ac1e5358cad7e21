"""Texture-plane extraction and source->destination homography warping.

Parity target: warp_learn/planes_utils.py:11-82.

* ``get_planes`` — per-plane polygon mask x frame: (5, H, W, 3) masked textures plus
  the (5, 6, 2) int-truncated plane keypoints (the reference converts to np.int32
  before fillPoly/findHomography, planes_utils.py:27).
* ``warp_unwarp_planes`` — per-plane homography src->dst (and back), with the
  left/right symmetry substitution when the destination side is invisible
  (planes_utils.py:46-68) and silent skipping of planes whose homography is
  degenerate (cv2 returns None there). The reference's sequential writes into
  planes_warped are reproduced with masked updates in static plane order.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.homography import find_homography
from future_urban_scene_generation_tpu.ops.polygon import fill_polygon
from future_urban_scene_generation_tpu.ops.warp import warp_perspective
from future_urban_scene_generation_tpu.render.visibility import (
    NUM_TEXTURE_PLANES,
    SYMMETRY_PAIR,
    TEXTURE_PLANES,
)


def get_planes(
    frame: jnp.ndarray, kpoints_2d_px: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked plane textures from a frame and pixel keypoints.

    Returns (planes (5, H, W, C), plane_kpoints (5, 6, 2) float of int-truncated pixel
    coords). Visibilities are computed separately (render/visibility.py) and carried
    alongside, as in get_vehicle_information (warp_learn/vehicle_utils.py:12-32).
    """
    h, w = frame.shape[0], frame.shape[1]
    kp_int = jnp.trunc(kpoints_2d_px).astype(jnp.float32)
    polys = kp_int[jnp.asarray(TEXTURE_PLANES)]  # (5, 6, 2)
    masks = jax.vmap(lambda p: fill_polygon(p, h, w))(polys)  # (5, h, w)
    planes = masks[..., None].astype(frame.dtype) * frame[None]
    return planes, polys


def warp_unwarp_planes(
    src_planes: jnp.ndarray,
    src_plane_kpoints: jnp.ndarray,
    dst_plane_kpoints: jnp.ndarray,
    src_visibilities: jnp.ndarray,
    dst_visibilities: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warp each visible source plane onto its destination-pose polygon.

    src_planes: (5, H, W, C); *_plane_kpoints: (5, 6, 2); *_visibilities: (5,) bool.
    Returns (planes_warped, planes_unwarped), both (5, H, W, C), zeros where skipped.
    """
    h, w = src_planes.shape[1], src_planes.shape[2]
    left, right = SYMMETRY_PAIR
    planes_warped = jnp.zeros_like(src_planes)
    planes_unwarped = jnp.zeros_like(src_planes)

    for i in range(NUM_TEXTURE_PLANES):
        in_symmetry = i in (left, right)
        other = right if i == left else left

        # Skip rules (planes_utils.py:50-62).
        skip = jnp.logical_not(src_visibilities[i])
        if not in_symmetry:
            skip = skip | jnp.logical_not(dst_visibilities[i])
        else:
            skip = skip | jnp.logical_not(dst_visibilities[left] | dst_visibilities[right])

        if in_symmetry:
            j = jnp.where(dst_visibilities[i], i, other)
        else:
            j = jnp.asarray(i)

        dst_kp = dst_plane_kpoints[j]
        h12, valid12 = find_homography(src_plane_kpoints[i], dst_kp)
        h21, valid21 = find_homography(dst_kp, src_plane_kpoints[i])
        ok = valid12 & valid21 & jnp.logical_not(skip)

        warped = warp_perspective(src_planes[i], h12, (h, w))
        unwarped = warp_perspective(warped, h21, (h, w))

        # planes_warped[j] = warped (sequential overwrite semantics preserved by
        # static loop order); planes_unwarped[i] = unwarped.
        onehot_j = jax.nn.one_hot(j, NUM_TEXTURE_PLANES, dtype=src_planes.dtype)
        write_j = (onehot_j * ok.astype(src_planes.dtype))[:, None, None, None]
        planes_warped = planes_warped * (1.0 - write_j) + warped[None] * write_j
        planes_unwarped = planes_unwarped.at[i].set(
            jnp.where(ok, unwarped, planes_unwarped[i])
        )

    return planes_warped, planes_unwarped
