"""Polygon rasterization on a pixel grid as vectorized half-plane / crossing tests.

Replaces the reference's CPU ``cv2.fillPoly`` calls used for (a) texture-plane masking
(warp_learn/planes_utils.py:29) and (b) painter's-algorithm plane visibility
(warp_learn/online_visibility.py:84-102). Instead of scanline rasterization, each pixel
center evaluates an even-odd crossing test against all polygon edges — a pure
elementwise computation over an (H, W) grid that vmaps over planes and vehicles and
lives entirely on the VPU.

Polygons are passed as fixed-shape ``(K, 2)`` float arrays of (x, y) vertices; variable
vertex counts are handled by repeating the last vertex (zero-length edges contribute no
crossings), keeping every shape static under jit.
"""
from __future__ import annotations

import jax.numpy as jnp


def pad_polygon(vertices, k: int):
    """Pad an (n, 2) vertex array to (k, 2) by repeating the final vertex."""
    import numpy as np

    vertices = np.asarray(vertices, dtype=np.float32)
    n = vertices.shape[0]
    if n > k:
        raise ValueError(f"polygon has {n} vertices > max {k}")
    if n == k:
        return vertices
    pad = np.repeat(vertices[-1:], k - n, axis=0)
    return np.concatenate([vertices, pad], axis=0)


def fill_polygon(
    vertices: jnp.ndarray, h: int, w: int, include_boundary: bool = True
) -> jnp.ndarray:
    """Rasterize one polygon to an (h, w) bool mask.

    Interior via even-odd crossing counting at integer pixel coordinates, plus
    (optionally) boundary pixels within half a pixel of any edge — cv2.fillPoly draws
    the polygon outline with its line rasterizer, so boundary pixels are filled there
    and must be here too for mask parity.
    """
    k = vertices.shape[0]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]  # (h, 1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]  # (1, w)

    inside = jnp.zeros((h, w), dtype=bool)
    boundary = jnp.zeros((h, w), dtype=bool)
    for i in range(k):
        x1, y1 = vertices[i, 0], vertices[i, 1]
        x2, y2 = vertices[(i + 1) % k, 0], vertices[(i + 1) % k, 1]
        # Edge straddles the horizontal line through the pixel row.
        straddles = (y1 > ys) != (y2 > ys)  # (h, 1)
        # x coordinate where the edge crosses that row.
        denom = jnp.where(y2 == y1, 1.0, y2 - y1)
        x_cross = x1 + (ys - y1) * (x2 - x1) / denom  # (h, 1)
        inside = inside ^ (straddles & (xs < x_cross))

        if include_boundary:
            # Distance from pixel center to the edge segment.
            ex, ey = x2 - x1, y2 - y1
            len2 = jnp.maximum(ex * ex + ey * ey, 1e-12)
            t = jnp.clip(((xs - x1) * ex + (ys - y1) * ey) / len2, 0.0, 1.0)
            dx = xs - (x1 + t * ex)
            dy = ys - (y1 + t * ey)
            boundary = boundary | (dx * dx + dy * dy <= 0.25)
    return inside | boundary


def polygon_area_pixels(vertices: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Number of grid pixels covered by the polygon (reference's get_plane_area)."""
    return jnp.sum(fill_polygon(vertices, h, w))


def polygon_area_shoelace(vertices: jnp.ndarray) -> jnp.ndarray:
    """Exact (continuous) polygon area via the shoelace formula.

    Cheaper than pixel counting when only relative areas matter; padding by repeated
    vertices contributes zero.
    """
    x = vertices[..., 0]
    y = vertices[..., 1]
    x_next = jnp.roll(x, -1, axis=-1)
    y_next = jnp.roll(y, -1, axis=-1)
    return 0.5 * jnp.abs(jnp.sum(x * y_next - x_next * y, axis=-1))
