"""Pallas TPU kernel for z-buffer triangle rasterization.

The XLA-level rasterizer (render/rasterizer.py) materializes (chunk, H, W) edge
fields and argmins over them — ~10 ms per 256² render of a ~400-triangle mesh.
This kernel brings that to sub-millisecond by:

* precomputing, per triangle, the AFFINE screen planes of its barycentrics
  (w_k(x, y) = A x + B y + C — the edge functions divided by signed area), of its
  interpolated depth, and of its interpolated RGB (all vectorized XLA prep work);
* iterating triangles inside the kernel with a per-tile z-buffer carried in vector
  registers, so nothing of size (T, H, W) ever exists;
* skipping triangles whose screen bbox misses the current tile (lax.cond on scalars),
  which removes most of the per-tile work for meshes of small triangles.

Coverage and depth-test semantics match render/rasterizer.py exactly (first triangle
wins depth ties; behind-camera and degenerate triangles dropped), which the tests
assert pixel-for-pixel.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
TILE_H = 32
TILE_W = 128
# Coefficient layout per triangle (padded to 24 for lane alignment):
#  0: 8  w0/w1/w2 planes (A, B, C each) — coverage + barycentrics
#  9:11  z plane
# 12:20  r/g/b planes
# 21:23  unused
N_COEF = 24


def triangle_planes(verts_screen: jnp.ndarray, triangles: jnp.ndarray,
                    vert_colors: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized prep: per-triangle affine planes + screen bboxes.

    Returns (coefs (T, 24) f32, bboxes (T, 4) f32 as x0, x1, y0, y1). Invalid
    triangles (degenerate/behind camera) get empty bboxes so every tile skips them.
    """
    v0 = verts_screen[triangles[:, 0]]
    v1 = verts_screen[triangles[:, 1]]
    v2 = verts_screen[triangles[:, 2]]
    c0 = vert_colors[triangles[:, 0]]
    c1 = vert_colors[triangles[:, 1]]
    c2 = vert_colors[triangles[:, 2]]

    area = (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1]) - (v1[:, 1] - v0[:, 1]) * (
        v2[:, 0] - v0[:, 0]
    )
    front = (v0[:, 2] > 1e-6) & (v1[:, 2] > 1e-6) & (v2[:, 2] > 1e-6)
    valid = front & (jnp.abs(area) > 1e-12)
    inv_area = jnp.where(valid, 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area), 0.0)

    def edge_plane(a, b):
        # e(x, y) = (bx-ax)(y-ay) - (by-ay)(x-ax) = A x + B y + C
        A = -(b[:, 1] - a[:, 1])
        B = b[:, 0] - a[:, 0]
        C = (b[:, 1] - a[:, 1]) * a[:, 0] - (b[:, 0] - a[:, 0]) * a[:, 1]
        return A, B, C

    e12 = edge_plane(v1, v2)  # -> w0
    e20 = edge_plane(v2, v0)  # -> w1
    e01 = edge_plane(v0, v1)  # -> w2

    planes = []
    for (A, B, C) in (e12, e20, e01):
        planes += [A * inv_area, B * inv_area, C * inv_area]
    w0a, w0b, w0c, w1a, w1b, w1c, w2a, w2b, w2c = planes

    def interp_plane(q0, q1, q2):
        return (
            w0a * q0 + w1a * q1 + w2a * q2,
            w0b * q0 + w1b * q1 + w2b * q2,
            w0c * q0 + w1c * q1 + w2c * q2,
        )

    za, zb, zc = interp_plane(v0[:, 2], v1[:, 2], v2[:, 2])
    ra, rb, rc = interp_plane(c0[:, 0], c1[:, 0], c2[:, 0])
    ga, gb, gc = interp_plane(c0[:, 1], c1[:, 1], c2[:, 1])
    ba, bb, bc = interp_plane(c0[:, 2], c1[:, 2], c2[:, 2])

    # Invalid triangles: coverage plane constant -1 (never covered).
    neg1 = jnp.full_like(w0c, -1.0)
    zero = jnp.zeros_like(w0c)
    w0a = jnp.where(valid, w0a, zero)
    w0b = jnp.where(valid, w0b, zero)
    w0c = jnp.where(valid, w0c, neg1)

    coefs = jnp.stack(
        [w0a, w0b, w0c, w1a, w1b, w1c, w2a, w2b, w2c,
         za, zb, zc, ra, rb, rc, ga, gb, gc, ba, bb, bc,
         zero, zero, zero],
        axis=1,
    ).astype(jnp.float32)

    xs = jnp.stack([v0[:, 0], v1[:, 0], v2[:, 0]], 1)
    ys = jnp.stack([v0[:, 1], v1[:, 1], v2[:, 1]], 1)
    empty = jnp.where(valid, 0.0, -1.0)
    bboxes = jnp.stack(
        [
            jnp.min(xs, 1), jnp.max(xs, 1) + empty * _BIG,
            jnp.min(ys, 1), jnp.max(ys, 1) + empty * _BIG,
        ],
        axis=1,
    ).astype(jnp.float32)
    return coefs, bboxes


def _kernel(coefs_ref, bbox_ref, img_ref, z_ref, *, n_tris: int):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    y0 = (ti * TILE_H).astype(jnp.float32)
    x0 = (tj * TILE_W).astype(jnp.float32)
    ys = y0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    xs = x0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)

    def body(t, carry):
        zbuf, r, g, b = carry

        bx0 = bbox_ref[t, 0]
        bx1 = bbox_ref[t, 1]
        by0 = bbox_ref[t, 2]
        by1 = bbox_ref[t, 3]
        overlap = (
            (bx1 >= x0) & (bx0 <= x0 + (TILE_W - 1))
            & (by1 >= y0) & (by0 <= y0 + (TILE_H - 1))
        )

        def hit(carry):
            zbuf, r, g, b = carry
            w0 = coefs_ref[t, 0] * xs + coefs_ref[t, 1] * ys + coefs_ref[t, 2]
            w1 = coefs_ref[t, 3] * xs + coefs_ref[t, 4] * ys + coefs_ref[t, 5]
            w2 = coefs_ref[t, 6] * xs + coefs_ref[t, 7] * ys + coefs_ref[t, 8]
            covered = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
            z = coefs_ref[t, 9] * xs + coefs_ref[t, 10] * ys + coefs_ref[t, 11]
            closer = covered & (z < zbuf)
            zbuf = jnp.where(closer, z, zbuf)
            r = jnp.where(closer, coefs_ref[t, 12] * xs + coefs_ref[t, 13] * ys + coefs_ref[t, 14], r)
            g = jnp.where(closer, coefs_ref[t, 15] * xs + coefs_ref[t, 16] * ys + coefs_ref[t, 17], g)
            b = jnp.where(closer, coefs_ref[t, 18] * xs + coefs_ref[t, 19] * ys + coefs_ref[t, 20], b)
            return zbuf, r, g, b

        return jax.lax.cond(overlap, hit, lambda c: c, carry)

    init = (
        jnp.full((TILE_H, TILE_W), _BIG, jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
        jnp.zeros((TILE_H, TILE_W), jnp.float32),
    )
    zbuf, r, g, b = jax.lax.fori_loop(0, n_tris, body, init)
    img_ref[:, :, 0] = r
    img_ref[:, :, 1] = g
    img_ref[:, :, 2] = b
    z_ref[:, :] = zbuf


@partial(jax.jit, static_argnames=("out_hw", "interpret"))
def rasterize_pallas(
    verts_screen: jnp.ndarray,
    triangles: jnp.ndarray,
    vert_colors: jnp.ndarray,
    out_hw: Tuple[int, int],
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for render.rasterizer.rasterize (image, background_mask)."""
    h, w = out_hw
    if h % TILE_H or w % TILE_W:
        raise ValueError(f"output {out_hw} must tile by ({TILE_H}, {TILE_W})")
    coefs, bboxes = triangle_planes(verts_screen, triangles, vert_colors)
    n_tris = coefs.shape[0]

    img, zbuf = pl.pallas_call(
        partial(_kernel, n_tris=n_tris),
        grid=(h // TILE_H, w // TILE_W),
        in_specs=[
            pl.BlockSpec((n_tris, N_COEF), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tris, 4), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_H, TILE_W, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        interpret=interpret,
    )(coefs, bboxes)
    mask_bg = zbuf >= _BIG
    img = jnp.where(mask_bg[..., None], 0.0, img)
    return img, mask_bg
