"""Keypoint heatmap utilities (training-time counterparts of the decode path).

Parity targets: utils/keypoint_utils.py:45-63 (Gaussian target heatmaps used to train
the hourglass), :95-100 (blend grids), :103-127 (colormap visualization — host-side).
The inference-side argmax decode lives in models/hourglass.py (decode_heatmaps).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def kpoint_to_heatmap(kpoint: jnp.ndarray, shape, sigma: float) -> jnp.ndarray:
    """Unnormalized Gaussian heatmap for one [0,1]^2 keypoint; zeros when the
    keypoint is missing (any coord <= 0) — utils/keypoint_utils.py:45-56."""
    map_h, map_w = shape
    x = kpoint[0] * map_w
    y = kpoint[1] * map_h
    xs = jnp.arange(map_w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(map_h, dtype=jnp.float32)[:, None]
    d2 = (xs - x) ** 2 + (ys - y) ** 2
    heat = jnp.exp(-d2 / sigma**2)
    heat = heat / (jnp.max(heat) + jnp.finfo(jnp.float32).eps)
    valid = jnp.all(kpoint > 0)
    return jnp.where(valid, heat, jnp.zeros_like(heat))


def heatmaps_from_kpoints(kpoints: jnp.ndarray, shape, sigma: float) -> jnp.ndarray:
    """(K, 2) normalized keypoints -> (H, W, K) target heatmaps
    (utils/keypoint_utils.py:59-63)."""
    import jax

    maps = jax.vmap(lambda kp: kpoint_to_heatmap(kp, shape, sigma))(kpoints)
    return jnp.moveaxis(maps, 0, -1)


def random_blend_grid(true_blends, pred_blends):
    """Interleave true/pred visualization rows (utils/keypoint_utils.py:95-100)."""
    grid = []
    for t, p in zip(true_blends, pred_blends):
        grid.append(np.concatenate(t, axis=1))
        grid.append(np.concatenate(p, axis=1))
    return grid


def to_colormap(heatmaps: np.ndarray, cmap: str = "jet"):
    """Summed-channel colormap visualization (host-side; matplotlib optional) —
    utils/keypoint_utils.py:103-127. heatmaps: (B, H, W, K) -> list of (H, W, 3)."""
    from matplotlib import cm

    mapper = cm.ScalarMappable(cmap=cmap)
    summed = np.asarray(heatmaps).sum(-1)
    return [mapper.to_rgba(s)[..., :3].astype(np.float32) for s in summed]
