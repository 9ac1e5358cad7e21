"""Pallas TPU kernel for z-buffer triangle rasterization.

The XLA-level rasterizer (render/rasterizer.py) materializes (chunk, H, W) edge
fields and argmins over them — ~10 ms per 256² render of a ~400-triangle mesh.
This kernel replaces it on the serving path (the reference renders with a
windowed Open3D GL pass per vehicle per step, warp_learn/render_open3d.py:29-50)
and is built to survive real CAD mesh density:

* prep (vectorized XLA) computes, per triangle, the AFFINE screen planes of its
  barycentrics (w_k(x, y) = A x + B y + C — edge functions divided by signed
  area), of its interpolated depth and RGB. Everything stays full-lane
  (triangle axis on lanes): 21 plane coefficients + 4 group-bbox values stack
  into a (32, T) matrix and ONE 2-D transpose yields the kernel's (T, 32)
  table — row = triangle, col = coefficient. The previous group-major pack
  ((n_groups, 7, 8, 3) transposes/pads/concats with 3- and 8-wide trailing
  dims) was the hidden cost of the whole rasterizer: ~1.2 ms of lane-starved
  relayouts per render, dwarfing the actual kernel;
* the kernel evaluates a whole 8-triangle group as two VPU FMAs per plane
  (w = A·xs + B·ys + C over the (8, TILE_PIX) pixel field), reading each
  coefficient as an (8, 1) sublane column straight from the (T, 32) table —
  no per-triangle scalar loads or branches, which measured at ~130 ns (skip)
  / ~430 ns (hit) per triangle per tile in the scalar-loop design;
* depth/color merging is branch-free in a STACKED register carry: sublane k
  holds a partial z/r/g/b buffer over triangles with index ≡ k (mod 8), so a
  group merge is 5 elementwise ops with no cross-sublane reduction; the 8
  partials resolve to one buffer once per tile, in XLA, after the kernel;
* the grid is tiles-only: the whole (T_pad, 32) plane table is VMEM-resident
  (128 B/triangle — ~3 MB even at 23k triangles, DMA'd once via a constant
  index map) and each tile's carries live in registers through an internal
  group loop. An earlier revision streamed 128-triangle chunks on a third
  grid axis with VMEM-scratch carries; its ~3 µs/step pipeline machinery over
  256 steps dwarfed the actual hit work. (The revision before THAT kept a
  lane-padded group-major table resident, which blew the 16 MB scoped-VMEM
  limit at ~6k triangles — the current table is 16x smaller per triangle.)
  Meshes beyond ~100k triangles should take the XLA fallback;
* tile/group culling is TWO-PASS BINNED: an XLA prepass intersects every
  group's screen bbox with every tile and scatter-compacts, per tile, the
  list of overlapping group bases (`bin_groups_for_tiles`); the kernel then
  runs a dynamic-trip-count loop over EXACTLY that list — no per-group
  branch machinery at all. The previous single-pass design culled with
  in-kernel scalar bbox conds (128-triangle chunk cond + per-group cond
  inside hit chunks); measured on the headline CAD (1,944 tris, 256² crop)
  it evaluated ~1.6k scalar conds per render to find ~360 true group-hits
  at ~1.04 µs of VPU work each — the conds were ~60% of kernel time
  (987 µs/render measured vs 4.27 ms with culling neutered = all 4,096
  group-tile pairs hit). Probed dead ends, for the record: (a) per-tile
  MORTON RANGES (loop min..max overlapping group index, keeping the cheap
  per-group cond) — Morton order is not screen-contiguous, ranges averaged
  2,166 iterations vs 358 true hits, worse than the conds; (b) splitting
  each tile into 4 row-strips of (8, 1024) with a per-strip y-overlap cond
  measured SLOWER (kernel 22.5 -> 23.7 ms): a Morton group of ~10 px
  triangles spans 2-4 of the 8-row strips, so the strip conds matched the
  saved VPU evaluations. The per-hit math runs at VPU issue rate; the
  residual inefficiency is the 128-lane field width vs ~40 px triangle
  spans, which only finer tiles (more overlap duplication) could address.

Semantics match render/rasterizer.py: behind-camera and degenerate triangles
dropped, strictly-closer depth test. Depth TIES between distinct coincident
triangles resolve by averaging instead of first-in-buffer-order (ties at shared
mesh edges interpolate the same vertex colors either way, so images agree to
float eps; the tests budget a small fraction of differing pixels).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30
# (16, 128) tiles: with binning exact per tile (no per-group conds), smaller
# tiles trade more bin-list iterations for less wasted lane work per hit —
# a ~33 px group bbox covers ~40% of a 16-row tile's pixel field vs ~25% of a
# 32-row one. Measured on the headline scene: render 9.6 -> 7.9 ms device.
TILE_H = 16
TILE_W = 128
_TILE_PIX = TILE_H * TILE_W
GROUP = 8  # triangles per vectorized evaluation (one sublane each)
GROUPS_PER_CHUNK = 16
CHUNK = GROUP * GROUPS_PER_CHUNK  # 128 triangles per streamed block
# Table columns: 7 planes (w0, w1, w2, z, r, g, b) × (A, B, C) at col p*3+k,
# then the GROUP screen bbox (x0, x1, y0, y1 — replicated across the group's 8
# triangle rows so the kernel reads it at the group's first row), padded to 32
# lanes.
_N_PLANES = 7
_BBOX_COL = _N_PLANES * 3  # 21
TABLE_COLS = 32
# The whole (T_pad, 32) f32 table lives in VMEM (128 B/triangle) alongside the
# per-tile carries/outputs; past this bound rasterize_auto* take the chunked
# XLA path instead of risking the 16 MB scoped-VMEM limit (80k tris ~ 10 MB).
MAX_PALLAS_TRIS = 80_000


def triangle_planes(
    verts_screen: jnp.ndarray, triangles: jnp.ndarray, vert_colors: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indexed-mesh prep: gather triangle corners, then triangle_planes_corners.

    NOTE the gathers here cost ~1.2 ms for a 2k-triangle mesh on TPU (row
    gathers are per-index latency bound) — the serving path avoids them
    entirely by pre-expanding each CAD into per-corner arrays at CadBank build
    (triangle indices are static per mesh) and calling the _corners entry
    points below.
    """
    v0 = verts_screen[triangles[:, 0]]
    v1 = verts_screen[triangles[:, 1]]
    v2 = verts_screen[triangles[:, 2]]
    c0 = vert_colors[triangles[:, 0]]
    c1 = vert_colors[triangles[:, 1]]
    c2 = vert_colors[triangles[:, 2]]
    screen = jnp.stack([v0.T, v1.T, v2.T])  # (3 corners, 3 comps, T)
    colors = jnp.stack([c0.T, c1.T, c2.T])
    return triangle_planes_corners(screen, colors)


def triangle_planes_corners(
    screen_xyz: jnp.ndarray, color_rgb: jnp.ndarray, cull=False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vectorized prep: per-triangle plane table + per-chunk screen bboxes.

    Takes LANE-MAJOR corner-expanded arrays: screen_xyz (3 corners, 3 comps
    (x_px, y_px, z_cam), T) and color_rgb (3 corners, 3 comps (r, g, b), T) —
    every value this function touches is a full-lane (T,) vector, so the whole
    prep is a single fused elementwise pass (no gathers, no narrow-trailing-dim
    relayouts). Returns (table (n_tris_pad, TABLE_COLS) f32, chunk_bbox
    (n_chunks, 4) f32). Triangles pad up to a CHUNK multiple; invalid
    triangles (degenerate / behind camera / padding) get a constant −1
    coverage plane (never covered) and empty bboxes, so group/chunk culls skip
    them.

    ``cull`` (bool scalar, traced OK): drop back-facing triangles — screen
    area >= 0 under the outward orientation utils.mesh.orient_for_backface_cull
    establishes (front faces project with NEGATIVE area in y-down pixel
    coords). Exact for closed meshes (the nearest hit along any ray is always
    front-facing) and worth ~2x in the kernel: culled triangles get empty
    bboxes, so Morton-coherent groups/chunks of them skip wholesale.
    """
    (v0x, v0y, v0z), (v1x, v1y, v1z), (v2x, v2y, v2z) = screen_xyz
    c0, c1, c2 = color_rgb  # each (3 rgb, T)

    area = (v1x - v0x) * (v2y - v0y) - (v1y - v0y) * (v2x - v0x)
    front = (v0z > 1e-6) & (v1z > 1e-6) & (v2z > 1e-6)
    valid = front & (jnp.abs(area) > 1e-12)
    if not (isinstance(cull, bool) and cull is False):
        valid = valid & (jnp.logical_not(cull) | (area < 0.0))
    inv_area = jnp.where(valid, 1.0 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area), 0.0)

    def edge_plane(ax, ay, bx, by):
        # e(x, y) = (bx-ax)(y-ay) - (by-ay)(x-ax) = A x + B y + C
        A = -(by - ay)
        B = bx - ax
        C = (by - ay) * ax - (bx - ax) * ay
        return A, B, C

    e12 = edge_plane(v1x, v1y, v2x, v2y)  # -> w0
    e20 = edge_plane(v2x, v2y, v0x, v0y)  # -> w1
    e01 = edge_plane(v0x, v0y, v1x, v1y)  # -> w2

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

    za, zb, zc = interp_plane(v0z, v1z, v2z)
    ra, rb, rc = interp_plane(c0[0], c1[0], c2[0])
    ga, gb, gc = interp_plane(c0[1], c1[1], c2[1])
    ba, bb, bc = interp_plane(c0[2], c1[2], c2[2])

    # Invalid triangles: coverage plane constant −1 (never covered).
    neg1 = jnp.full_like(w0c, -1.0)
    zero = jnp.zeros_like(w0c)
    w0a = jnp.where(valid, w0a, zero)
    w0b = jnp.where(valid, w0b, zero)
    w0c = jnp.where(valid, w0c, neg1)

    bx0 = jnp.where(valid, jnp.minimum(jnp.minimum(v0x, v1x), v2x), _BIG)
    bx1 = jnp.where(valid, jnp.maximum(jnp.maximum(v0x, v1x), v2x), -_BIG)
    by0 = jnp.where(valid, jnp.minimum(jnp.minimum(v0y, v1y), v2y), _BIG)
    by1 = jnp.where(valid, jnp.maximum(jnp.maximum(v0y, v1y), v2y), -_BIG)

    # Build the table with the triangle axis on LANES throughout — each row is a
    # full-lane (T,) vector — and transpose ONCE at the end. The previous
    # group-major pack (transposes/pads/concats over 3- and 8-wide trailing
    # dims) measured ~1.2 ms of relayouts per render, ~25x the kernel itself.
    t_total = w0c.shape[0]
    pad = (-t_total) % CHUNK
    t_pad = t_total + pad
    n_groups = t_pad // GROUP

    def padv(x, fill=0.0):
        return jnp.pad(x.astype(jnp.float32), (0, pad), constant_values=fill)

    rows = [
        padv(w0a), padv(w0b), padv(w0c, -1.0),
        padv(w1a), padv(w1b), padv(w1c),
        padv(w2a), padv(w2b), padv(w2c),
        padv(za), padv(zb), padv(zc),
        padv(ra), padv(rb), padv(rc),
        padv(ga), padv(gb), padv(gc),
        padv(ba), padv(bb), padv(bc),
    ]

    # Group bbox (min/max over each 8-triangle group), replicated back to the
    # group's triangle rows so the kernel reads it at the group's first row.
    bounds = [padv(bx0, _BIG), padv(bx1, -_BIG), padv(by0, _BIG), padv(by1, -_BIG)]
    group_vals = []
    for i, bv in enumerate(bounds):
        g = bv.reshape(n_groups, GROUP)
        g = g.min(1) if i in (0, 2) else g.max(1)
        group_vals.append(g)
        rows.append(jnp.repeat(g, GROUP))
    rows += [jnp.zeros((t_pad,), jnp.float32)] * (TABLE_COLS - len(rows))

    table = jnp.stack(rows, axis=0).T  # (32, t_pad) -> (t_pad, 32)

    gx0, gx1, gy0, gy1 = group_vals
    cb = lambda g, red: red(g.reshape(-1, GROUPS_PER_CHUNK), 1)  # noqa: E731
    chunk_bbox = jnp.stack(
        [cb(gx0, jnp.min), cb(gx1, jnp.max), cb(gy0, jnp.min), cb(gy1, jnp.max)],
        axis=1,
    )
    return table, chunk_bbox


def bin_groups_for_tiles(
    table: jnp.ndarray, n_i: int, n_j: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA prepass: per-tile compacted lists of overlapping group bases.

    Intersects every 8-triangle group's screen bbox (replicated in the table's
    bbox columns; read at each group's first row) with the static tile grid and
    scatter-compacts the matching group BASES (row index of the group's first
    triangle) to the front of each tile's row. Returns (bins (n_tiles,
    n_groups) int32, counts (n_tiles,) int32); entries past counts[t] are
    zero-filled and never read by the kernel. Cost at headline density
    (16 tiles x 256 groups) is a 4k-element cumsum+scatter per render —
    ~2% of the kernel time it saves.
    """
    gb = table[::GROUP, _BBOX_COL:_BBOX_COL + 4]  # (n_groups, 4) x0 x1 y0 y1
    n_groups = gb.shape[0]
    n_tiles = n_i * n_j
    t = jnp.arange(n_tiles, dtype=jnp.int32)
    x0 = ((t % n_j) * TILE_W).astype(jnp.float32)[:, None]
    y0 = ((t // n_j) * TILE_H).astype(jnp.float32)[:, None]
    ov = (
        (gb[None, :, 1] >= x0) & (gb[None, :, 0] <= x0 + (TILE_W - 1))
        & (gb[None, :, 3] >= y0) & (gb[None, :, 2] <= y0 + (TILE_H - 1))
    )  # (n_tiles, n_groups)
    counts = ov.sum(axis=1).astype(jnp.int32)
    pos = jnp.cumsum(ov.astype(jnp.int32), axis=1) - 1
    pos = jnp.where(ov, pos, n_groups)  # out of range -> dropped by the scatter
    bases = jnp.broadcast_to(
        jnp.arange(n_groups, dtype=jnp.int32)[None, :] * GROUP, ov.shape
    )
    tidx = jnp.broadcast_to(t[:, None], ov.shape)
    bins = (
        jnp.zeros((n_tiles, n_groups), jnp.int32)
        .at[tidx, pos].set(bases, mode="drop")
    )
    # Column-vector layout for the kernel: Mosaic only allows DYNAMIC scalar
    # reads on the sublane dimension (a dynamic LANE index must be statically
    # a multiple of 128), so the (n_tiles, n_groups) table flattens to
    # (n_tiles * n_groups, 1) and the kernel indexes rows.
    # counts as an (n_tiles, 1) column: 1-D SMEM blocks trip the last-two-dims
    # block rule once vmap prepends a batch dimension.
    return bins.reshape(n_tiles * n_groups, 1), counts[:, None]


def _kernel(
    n_j, n_groups, counts_ref, bins_ref, coefs_ref, zs_ref, rs_ref, gs_ref, bs_ref
):
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    tlin = ti * n_j + tj
    y0 = (ti * TILE_H).astype(jnp.float32)
    x0 = (tj * TILE_W).astype(jnp.float32)

    # Pixel coordinate fields: flattened tile pixels on lanes (pixel
    # p = local_y * TILE_W + local_x), identical on every sublane.
    p = jax.lax.broadcasted_iota(jnp.int32, (GROUP, _TILE_PIX), 1)
    xs = x0 + (p % TILE_W).astype(jnp.float32)
    ys = y0 + (p // TILE_W).astype(jnp.float32)

    def group_body(k, carry):
        zbuf, r, gc_, b = carry
        base = bins_ref[tlin * n_groups + k, 0]

        # Affine plane evaluation on the VPU: w(x, y) = A x + B y + C as two
        # FMAs over the (GROUP, TILE_PIX) pixel field, with the per-triangle
        # A/B/C columns broadcast along lanes. This replaced two
        # (rows, 8) @ (8, TILE_PIX) MXU matmuls — a contraction depth of 8
        # wastes the systolic array, and the coverage rows needed a 6-pass
        # HIGHEST matmul for exact edge signs; the VPU does native-f32 FMAs,
        # so this is both faster and MORE exact.
        def plane(p):
            rows = pl.ds(base, GROUP)
            av = coefs_ref[rows, 3 * p + 0][:, None]  # (GROUP, 1)
            bv = coefs_ref[rows, 3 * p + 1][:, None]
            cv = coefs_ref[rows, 3 * p + 2][:, None]
            return av * xs + bv * ys + cv

        w0 = plane(0)
        w1 = plane(1)
        w2 = plane(2)
        zv = plane(3)
        col = (plane(4), plane(5), plane(6))
        covered = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        zc = jnp.where(covered, zv, _BIG)
        closer = zc < zbuf
        zbuf = jnp.where(closer, zc, zbuf)
        r = jnp.where(closer, col[0], r)
        gc_ = jnp.where(closer, col[1], gc_)
        b = jnp.where(closer, col[2], b)
        return zbuf, r, gc_, b

    init = (
        jnp.full((GROUP, _TILE_PIX), _BIG, jnp.float32),
        jnp.zeros((GROUP, _TILE_PIX), jnp.float32),
        jnp.zeros((GROUP, _TILE_PIX), jnp.float32),
        jnp.zeros((GROUP, _TILE_PIX), jnp.float32),
    )
    zbuf, r, gc_, b = jax.lax.fori_loop(
        0, counts_ref[tlin, 0], group_body, init
    )
    zs_ref[:, :] = zbuf
    rs_ref[:, :] = r
    gs_ref[:, :] = gc_
    bs_ref[:, :] = b


@partial(jax.jit, static_argnames=("out_hw", "interpret"))
def rasterize_pallas(
    verts_screen: jnp.ndarray,
    triangles: jnp.ndarray,
    vert_colors: jnp.ndarray,
    out_hw: Tuple[int, int],
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for render.rasterizer.rasterize (image, background_mask)."""
    v0 = verts_screen[triangles[:, 0]]
    v1 = verts_screen[triangles[:, 1]]
    v2 = verts_screen[triangles[:, 2]]
    c0 = vert_colors[triangles[:, 0]]
    c1 = vert_colors[triangles[:, 1]]
    c2 = vert_colors[triangles[:, 2]]
    return rasterize_pallas_corners(
        jnp.stack([v0.T, v1.T, v2.T]), jnp.stack([c0.T, c1.T, c2.T]),
        out_hw, interpret,
    )


@partial(jax.jit, static_argnames=("out_hw", "interpret"))
def rasterize_pallas_corners(
    screen_xyz: jnp.ndarray,
    color_rgb: jnp.ndarray,
    out_hw: Tuple[int, int],
    interpret: bool = False,
    cull=False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free rasterization from corner-expanded triangles.

    screen_xyz / color_rgb: LANE-MAJOR (3 corners, 3 comps, T) — per-corner
    screen position (x_px, y_px, z_cam) and RGB color (see
    triangle_planes_corners). ``cull``: backface-cull flag (bool scalar,
    traced OK) — sound only for outward-oriented closed meshes
    (utils.mesh.orient_for_backface_cull).
    """
    h, w = out_hw
    if h % TILE_H or w % TILE_W:
        raise ValueError(f"output {out_hw} must tile by ({TILE_H}, {TILE_W})")
    coefs, _ = triangle_planes_corners(screen_xyz, color_rgb, cull)
    n_i, n_j = h // TILE_H, w // TILE_W
    n_tiles = n_i * n_j
    bins, counts = bin_groups_for_tiles(coefs, n_i, n_j)
    n_groups = bins.shape[0] // n_tiles

    stacked_spec = pl.BlockSpec(
        (GROUP, _TILE_PIX),
        lambda i, j, nj=n_j: (0, i * nj + j),
        memory_space=pltpu.VMEM,
    )
    stacked_shape = jax.ShapeDtypeStruct((GROUP, n_tiles * _TILE_PIX), jnp.float32)
    zs, rs, gs, bs = pl.pallas_call(
        partial(_kernel, n_j, n_groups),
        grid=(n_i, n_j),
        in_specs=[
            # Per-tile group counts as unblocked SMEM scalars ((n_tiles, 1)
            # int32): each tile's dynamic loop bound. Blocked SMEM specs hit
            # the (8, 128) divisibility rule, so pass the whole array.
            pl.BlockSpec(
                (n_tiles, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM
            ),
            # Whole bin table VMEM-resident as an (n_tiles * n_groups, 1)
            # int32 column (64 B/group per tile at headline density): the
            # kernel reads one scalar base per loop iteration at a dynamic
            # SUBLANE index (dynamic lane indices are illegal in Mosaic).
            pl.BlockSpec(
                (n_tiles * n_groups, 1), lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Whole (T_pad, 32) plane table VMEM-resident: 128 B/triangle, so
            # even a 23k-triangle CAD is ~3 MB — DMA'd ONCE (constant index
            # map) and reused by every tile step. The earlier chunk-streaming
            # grid axis (tiles × chunks steps with scratch carries) paid ~3 µs
            # of pipeline machinery per step — 256 steps dwarfed the actual
            # hit work. Meshes beyond ~100k triangles should take the XLA
            # path (rasterize_auto_corners dispatches).
            pl.BlockSpec(
                (coefs.shape[0], TABLE_COLS),
                lambda i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(stacked_spec,) * 4,
        out_shape=(stacked_shape,) * 4,
        interpret=interpret,
    )(counts, bins, coefs)

    # XLA resolution of the 8 sublane-partial buffers (cheap, fuses):
    # min-depth winner; exact ties average (identical colors at shared edges).
    def untile(a):  # (8, n_tiles*PIX) -> (8, H, W)
        return (
            a.reshape(GROUP, n_i, n_j, TILE_H, TILE_W)
            .transpose(0, 1, 3, 2, 4)
            .reshape(GROUP, h, w)
        )

    zs, rs, gs, bs = untile(zs), untile(rs), untile(gs), untile(bs)
    zmin = jnp.min(zs, axis=0)
    win = (zs == zmin[None]).astype(jnp.float32)
    wsum = jnp.sum(win, axis=0)
    img = jnp.stack(
        [
            jnp.sum(rs * win, axis=0) / wsum,
            jnp.sum(gs * win, axis=0) / wsum,
            jnp.sum(bs * win, axis=0) / wsum,
        ],
        axis=-1,
    )
    mask_bg = zmin >= _BIG
    img = jnp.where(mask_bg[..., None], 0.0, img)
    return img, mask_bg
