"""Z-buffer triangle rasterizer producing normal-colored 2.5D sketches.

Replaces the reference's Open3D windowed-GL renderer (warp_learn/render_open3d.py:29-50):
vertex normals mapped to colors (n+1)/2, no lighting, black background, and the object
mask = pixels left black. Instead of a full-frame GL pass per vehicle per step, this
renders with a crop-window camera at sketch resolution (the reference immediately
crops its full-frame render anyway, trajectory_inference.py:205-220) and is jit/vmap
friendly: fixed shapes, chunked edge-function coverage with a z-buffer merge.

Algorithm: project vertices through K [R|t]; scan over triangle chunks; per chunk,
evaluate the three edge functions of each triangle at every pixel center, interpolate
depth and color with screen-space barycentrics, keep the per-pixel nearest triangle;
merge chunks through a running (z, color) buffer. Complexity O(T * H * W / chunk)
VPU work — a Pallas tile-binned variant can slot in behind the same signature.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

_BIG = 1e30


class Camera(NamedTuple):
    """Pinhole camera for rasterization: full-frame K plus an optional crop window
    mapping frame pixels onto the output canvas."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @staticmethod
    def from_intrinsic(k_mat):
        return Camera(k_mat[0, 0], k_mat[1, 1], k_mat[0, 2], k_mat[1, 2])

    def crop(self, x0, y0, scale):
        """Camera for a crop window: frame pixel p maps to (p - origin) * scale."""
        return Camera(
            self.fx * scale, self.fy * scale, (self.cx - x0) * scale, (self.cy - y0) * scale
        )


def project_vertices(vertices, extrinsic, camera: Camera):
    """World -> screen: returns (V, 3) of (x_px, y_px, z_cam)."""
    ext = extrinsic[:3, :]
    cam = vertices @ ext[:, :3].T + ext[:, 3]
    z = cam[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = camera.fx * cam[:, 0] / safe_z + camera.cx
    y = camera.fy * cam[:, 1] / safe_z + camera.cy
    return jnp.stack([x, y, z], axis=1)


def rasterize(
    verts_screen: jnp.ndarray,
    triangles: jnp.ndarray,
    vert_colors: jnp.ndarray,
    out_hw: Tuple[int, int],
    chunk: int = 128,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize (T, 3) triangles over (V, 3) screen vertices with per-vertex colors.

    Returns (image (H, W, 3), mask (H, W) bool) where mask is True on background —
    matching the reference's `object_mask = all(pixel == 0)` convention
    (render_open3d.py:48). Triangles with any vertex behind the camera are dropped
    (no near-plane clipping; vehicle meshes sit well in front of the camera).
    """
    return rasterize_corners(
        jnp.stack([
            verts_screen[triangles[:, 0]].T,
            verts_screen[triangles[:, 1]].T,
            verts_screen[triangles[:, 2]].T,
        ]),
        jnp.stack([
            vert_colors[triangles[:, 0]].T,
            vert_colors[triangles[:, 1]].T,
            vert_colors[triangles[:, 2]].T,
        ]),
        out_hw,
        chunk,
    )


def rasterize_corners(
    screen_xyz: jnp.ndarray,
    color_rgb: jnp.ndarray,
    out_hw: Tuple[int, int],
    chunk: int = 128,
    cull=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize corner-expanded triangles: LANE-MAJOR (3 corners, 3 comps, T)
    screen positions (x_px, y_px, z_cam) and colors (r, g, b).

    Gather-free core of :func:`rasterize` — the serving path pre-expands each
    CAD's (static) triangle indices at CadBank build, which removes the
    per-render corner gathers (~1.2 ms for a 2k-triangle mesh on TPU).
    ``cull``: drop back-facing (screen area >= 0) triangles — sound only for
    outward-oriented closed meshes (utils.mesh.orient_for_backface_cull);
    applied identically to the Pallas kernel so both paths stay pixel-matched.
    """
    h, w = out_hw
    t_total = screen_xyz.shape[-1]
    pad = (-t_total) % chunk
    valid_pad = jnp.arange(t_total + pad) < t_total

    def chunked(a):  # (3, 3, T) -> (n_chunks, C, 3, 3) corner-minor per chunk
        a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))
        return a.reshape(3, 3, -1, chunk).transpose(2, 3, 0, 1)  # (n, C, 3c, 3)

    corner_chunks = chunked(screen_xyz)
    color_chunks = chunked(color_rgb)

    xs = jnp.arange(w, dtype=jnp.float32)[None, :]  # pixel centers at integer coords
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    valid_chunks = valid_pad.reshape(-1, chunk)

    def chunk_body(carry, inp):
        zbuf, img = carry
        vc, cc, tri_valid = inp
        v0, v1, v2 = vc[:, 0], vc[:, 1], vc[:, 2]  # (C, 3)
        c0, c1, c2 = cc[:, 0], cc[:, 1], cc[:, 2]

        front = (v0[:, 2] > 1e-6) & (v1[:, 2] > 1e-6) & (v2[:, 2] > 1e-6) & tri_valid

        # Edge functions at all pixels: e(p) = (bx-ax)(py-ay) - (by-ay)(px-ax)
        def edge(a, b):
            return (b[:, 0, None, None] - a[:, 0, None, None]) * (
                ys[None] - a[:, 1, None, None]
            ) - (b[:, 1, None, None] - a[:, 1, None, None]) * (xs[None] - a[:, 0, None, None])

        e01 = edge(v0, v1)  # (C, H, W)
        e12 = edge(v1, v2)
        e20 = edge(v2, v0)
        area = (
            (v1[:, 0] - v0[:, 0]) * (v2[:, 1] - v0[:, 1])
            - (v1[:, 1] - v0[:, 1]) * (v2[:, 0] - v0[:, 0])
        )[:, None, None]
        # Coverage for either winding; degenerate (zero-area) triangles excluded.
        pos = (e01 >= 0) & (e12 >= 0) & (e20 >= 0)
        neg = (e01 <= 0) & (e12 <= 0) & (e20 <= 0)
        covered = jnp.where(area[:, :, :] > 0, pos, neg) & (jnp.abs(area) > 1e-12)
        covered = covered & front[:, None, None]
        if not (isinstance(cull, bool) and cull is False):
            covered = covered & (jnp.logical_not(cull) | (area < 0.0))

        safe_area = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        w0 = e12 / safe_area  # barycentric of v0
        w1 = e20 / safe_area
        w2 = e01 / safe_area
        z = w0 * v0[:, 2, None, None] + w1 * v1[:, 2, None, None] + w2 * v2[:, 2, None, None]
        z = jnp.where(covered, z, _BIG)

        best = jnp.argmin(z, axis=0)  # (H, W)
        best_z = jnp.min(z, axis=0)

        bw0 = jnp.take_along_axis(w0, best[None], axis=0)[0]
        bw1 = jnp.take_along_axis(w1, best[None], axis=0)[0]
        bw2 = jnp.take_along_axis(w2, best[None], axis=0)[0]
        color = (
            bw0[..., None] * c0[best]
            + bw1[..., None] * c1[best]
            + bw2[..., None] * c2[best]
        )

        closer = best_z < zbuf
        zbuf = jnp.where(closer, best_z, zbuf)
        img = jnp.where(closer[..., None], color, img)
        return (zbuf, img), None

    zbuf0 = jnp.full((h, w), _BIG, jnp.float32)
    img0 = jnp.zeros((h, w, 3), jnp.float32)
    (zbuf, img), _ = jax.lax.scan(
        chunk_body, (zbuf0, img0), (corner_chunks, color_chunks, valid_chunks)
    )
    mask_bg = zbuf >= _BIG
    img = jnp.where(mask_bg[..., None], 0.0, img)
    return img, mask_bg


def rasterize_auto(
    verts_screen: jnp.ndarray,
    triangles: jnp.ndarray,
    vert_colors: jnp.ndarray,
    out_hw: Tuple[int, int],
    chunk: int = 128,
    allow_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backend-dispatching rasterizer: the Pallas tile kernel on TPU
    (pixel-identical, ~20x faster), the chunked XLA path elsewhere.
    ``allow_pallas=False`` forces the XLA path — used when the enclosing
    computation is mesh-sharded (pallas_call has no SPMD sharding rule)."""
    from future_urban_scene_generation_tpu.ops import pallas_raster

    h, w = out_hw
    on_tpu = jax.default_backend() not in ("cpu",)
    tiles_ok = h % pallas_raster.TILE_H == 0 and w % pallas_raster.TILE_W == 0
    size_ok = triangles.shape[0] <= pallas_raster.MAX_PALLAS_TRIS
    if allow_pallas and on_tpu and tiles_ok and size_ok:
        return pallas_raster.rasterize_pallas(verts_screen, triangles, vert_colors, out_hw)
    return rasterize(verts_screen, triangles, vert_colors, out_hw, chunk)


def rasterize_auto_corners(
    screen_xyz: jnp.ndarray,
    color_rgb: jnp.ndarray,
    out_hw: Tuple[int, int],
    chunk: int = 128,
    allow_pallas: bool = True,
    cull=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Corner-expanded twin of :func:`rasterize_auto` (lane-major (3, 3, T))."""
    from future_urban_scene_generation_tpu.ops import pallas_raster

    h, w = out_hw
    on_tpu = jax.default_backend() not in ("cpu",)
    tiles_ok = h % pallas_raster.TILE_H == 0 and w % pallas_raster.TILE_W == 0
    size_ok = screen_xyz.shape[-1] <= pallas_raster.MAX_PALLAS_TRIS
    if allow_pallas and on_tpu and tiles_ok and size_ok:
        return pallas_raster.rasterize_pallas_corners(
            screen_xyz, color_rgb, out_hw, cull=cull
        )
    return rasterize_corners(screen_xyz, color_rgb, out_hw, chunk, cull=cull)


def project_corners(corners_xyz: jnp.ndarray, extrinsic: jnp.ndarray, camera: Camera):
    """Lane-major corner projection: (3 corners, 3 xyz, T) world -> (3, 3, T)
    screen (x_px, y_px, z_cam).

    Component-explicit FMAs over full-lane (T,) vectors — NOT a matmul: the
    TPU's default f32 matmul runs bf16 MXU passes (coverage signs are
    precision-critical), and lane-major elementwise math avoids the
    narrow-trailing-dim relayouts that made the (T, 3) formulation slow.
    """
    ext = extrinsic[:3, :]
    x, y, z = corners_xyz[:, 0], corners_xyz[:, 1], corners_xyz[:, 2]  # (3, T)
    cx_ = ext[0, 0] * x + ext[0, 1] * y + ext[0, 2] * z + ext[0, 3]
    cy_ = ext[1, 0] * x + ext[1, 1] * y + ext[1, 2] * z + ext[1, 3]
    cz_ = ext[2, 0] * x + ext[2, 1] * y + ext[2, 2] * z + ext[2, 3]
    safe_z = jnp.where(jnp.abs(cz_) < 1e-9, 1e-9, cz_)
    sx = camera.fx * cx_ / safe_z + camera.cx
    sy = camera.fy * cy_ / safe_z + camera.cy
    return jnp.stack([sx, sy, cz_], axis=1)


def render_normal_sketch_corners(
    corners_xyz: jnp.ndarray,
    corner_normals_xyz: jnp.ndarray,
    extrinsic: jnp.ndarray,
    camera: Camera,
    out_hw: Tuple[int, int],
    chunk: int = 128,
    allow_pallas: bool = True,
    cull=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free normal-sketch render from corner-expanded geometry.

    corners_xyz / corner_normals_xyz: lane-major (3 corners, 3 xyz, T) world
    positions and (unnormalized-to-color) vertex normals. Same semantics as
    :func:`render_normal_sketch` (render_open3d.py:37-48) for meshes where the
    expansion came from the same triangle list. ``cull``: backface-cull flag
    (see rasterize_corners) — set from CadBank.cullable on the serving path.
    """
    colors = (corner_normals_xyz + 1.0) / 2.0
    screen = project_corners(corners_xyz, extrinsic, camera)
    img, bg = rasterize_auto_corners(
        screen, colors, out_hw, chunk, allow_pallas, cull=cull
    )
    return jnp.clip(img, 0.0, 1.0), bg


def render_normal_sketch(
    vertices: jnp.ndarray,
    triangles: jnp.ndarray,
    vertex_normals: jnp.ndarray,
    extrinsic: jnp.ndarray,
    camera: Camera,
    out_hw: Tuple[int, int],
    chunk: int = 128,
    allow_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full normal-sketch render: colors = (n + 1) / 2 (render_open3d.py:37-38).

    Returns (sketch (H, W, 3) float in [0, 1], background_mask (H, W) bool).
    """
    colors = (vertex_normals + 1.0) / 2.0
    verts_screen = project_vertices(vertices, extrinsic, camera)
    img, bg = rasterize_auto(verts_screen, triangles, colors, out_hw, chunk, allow_pallas)
    # Barycentric interpolation can overshoot by float eps; the reference's uint8
    # conversion clips implicitly (render_open3d.py:47).
    return jnp.clip(img, 0.0, 1.0), bg
