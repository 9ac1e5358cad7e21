"""Perspective (homography) inverse-warp resampling — replaces cv2.warpPerspective.

cv2.warpPerspective(src, H, dsize) computes, for each destination pixel (x, y), the
source location H^-1 (x, y, 1) and bilinearly samples with constant (zero) border.
Here the same map runs as a gather-based bilinear sample over an (H, W) grid, batched
over planes/vehicles with vmap. A Pallas tiled variant can slot in behind the same
signature for the hot path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample(img, xs, ys):
    """Sample (H, W, C) image at float coords with zero padding outside."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        vals = img[yi_c, xi_c]
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    return top * (1.0 - fy) + bot * fy


def pack_bilinear_table(img: jnp.ndarray) -> jnp.ndarray:
    """Precompute the 4-tap neighborhood table for single-gather bilinear sampling.

    TPU gathers cost per INDEX, not per element (measured 4x: 369 ms -> 93 ms for
    120 x 256^2 samples), so packing the 2x2 neighborhood into channels turns the
    4 gathers of bilinear interpolation into one. The image is zero-padded by one
    pixel first so out-of-range taps reproduce `_bilinear_sample`'s zero border.

    Returns (H+1, W+1, 4C): channel groups [v00 | v01 | v10 | v11] where vrc is the
    neighbor at (y+r, x+c) of padded coordinate (y, x).
    """
    padded = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    return jnp.concatenate(
        [padded[:-1, :-1], padded[:-1, 1:], padded[1:, :-1], padded[1:, 1:]], axis=-1
    )


def bilinear_sample_packed(
    packed: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray
) -> jnp.ndarray:
    """Sample a pack_bilinear_table output at float coords (original-image frame)."""
    hp, wp = packed.shape[0], packed.shape[1]  # H+1, W+1
    c = packed.shape[-1] // 4
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]
    # Shift into padded coords; fully-outside indices clip to the zero border.
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, wp - 1)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, hp - 1)
    inb = (xs > -1.0) & (xs < wp - 1.0) & (ys > -1.0) & (ys < hp - 1.0)
    v = packed[yi, xi]
    v00, v01, v10, v11 = (v[..., i * c:(i + 1) * c] for i in range(4))
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy
    return jnp.where(inb[..., None], out, 0.0)


def warp_bilinear_matmul(
    img: jnp.ndarray,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    dtype=None,
    chunk: int = 8192,
) -> jnp.ndarray:
    """Bilinear sampling as dense MXU contractions — no gathers at all.

    TPU gathers cost one cycle per INDEX (pack_bilinear_table already amortizes the
    4 taps into 1 gather); this path removes the gather entirely by writing the
    interpolation as two contractions with hat-function weight matrices built from
    iota:  out[p, c] = sum_y wy[p, y] * sum_x wx[p, x] * img[y, x, c], where
    wx[p, x] = max(0, 1 - |xs[p] - x|).  The inner contraction is a
    (chunk x W) @ (W x H*C) matmul — exactly what the MXU is for.

    Numerics: identical to :func:`_bilinear_sample` (zero outside the support —
    the hat weights vanish beyond the border, reproducing the zero-padding taps,
    including the partial-weight ring at distance < 1 outside). ``dtype=bfloat16``
    runs the big matmul at full MXU rate with f32 accumulation; the ~4e-3 weight
    quantization is the same order as the reference's own uint8 LAB rounding.

    When to use: only when the source table is SMALL (the contraction does
    O(W) work per output pixel vs the gather's O(1)). Measured on v5e for the
    pipeline's 513^2 table x 24 x 256^2 warps: gather 21 ms, this path 26 ms at
    ~50% MXU utilization — the packed-table gather stays the production path
    (pipeline/stages.py); this op exists for small-table workloads and as the
    measured record of the alternative.

    img: (H, W, C); xs/ys: any shape of float coords. Returns xs.shape + (C,).
    """
    h, w, c = img.shape
    shape = xs.shape
    xs_f = xs.reshape(-1)
    ys_f = ys.reshape(-1)
    p_total = xs_f.shape[0]
    pad = (-p_total) % chunk
    xs_f = jnp.pad(xs_f, (0, pad))
    ys_f = jnp.pad(ys_f, (0, pad))
    gx = jnp.arange(w, dtype=xs_f.dtype)
    gy = jnp.arange(h, dtype=ys_f.dtype)
    img_flat = img.transpose(1, 0, 2).reshape(w, h * c)  # (x, y*c)
    if dtype is not None:
        img_flat = img_flat.astype(dtype)

    def one_chunk(coords):
        cx, cy = coords
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(cx[:, None] - gx))  # (p, W)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(cy[:, None] - gy))  # (p, H)
        if dtype is not None:
            wx = wx.astype(dtype)
            wy = wy.astype(dtype)
        tmp = jax.lax.dot(
            wx, img_flat, preferred_element_type=jnp.float32
        )  # (p, y*c)
        tmp = tmp.reshape(-1, h, c)
        if dtype is not None:
            tmp = tmp.astype(dtype)
        out = jnp.einsum(
            "py,pyc->pc", wy, tmp, preferred_element_type=jnp.float32
        )
        return out

    n_chunks = xs_f.shape[0] // chunk
    if n_chunks == 1:
        out = one_chunk((xs_f, ys_f))
    else:
        out = jax.lax.map(
            one_chunk,
            (xs_f.reshape(n_chunks, chunk), ys_f.reshape(n_chunks, chunk)),
        ).reshape(-1, c)
    return out[:p_total].reshape(*shape, c)


def warp_perspective(
    img: jnp.ndarray, h_mat: jnp.ndarray, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """cv2.warpPerspective equivalent: maps src through H onto an (out_h, out_w) canvas.

    ``h_mat`` maps src -> dst (like cv2); sampling inverts it per destination pixel.
    """
    out_h, out_w = out_hw
    h_inv = jnp.linalg.inv(h_mat)
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    ones = jnp.ones((out_h, out_w), jnp.float32)
    xs_b = jnp.broadcast_to(xs, (out_h, out_w))
    ys_b = jnp.broadcast_to(ys, (out_h, out_w))
    denom = h_inv[2, 0] * xs_b + h_inv[2, 1] * ys_b + h_inv[2, 2] * ones
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    src_x = (h_inv[0, 0] * xs_b + h_inv[0, 1] * ys_b + h_inv[0, 2]) / denom
    src_y = (h_inv[1, 0] * xs_b + h_inv[1, 1] * ys_b + h_inv[1, 2]) / denom
    return _bilinear_sample(img, src_x, src_y)


def warp_affine_resample(
    img: jnp.ndarray,
    src_center: jnp.ndarray,
    src_side: jnp.ndarray,
    out_size: int,
) -> jnp.ndarray:
    """Resample a square window (center, side) of ``img`` directly to out_size².

    Fuses the reference's square_crop_from_bbox + cv2.resize(256²) pair
    (utils/crop_utils.py:4-52 + trajectory_inference.py:60) into a single fixed-shape
    gather — the key trick that makes per-vehicle crops jittable with static shapes.
    Areas outside the image are zero (the reference zero-pads).

    Sampling uses cv2.resize's half-pixel convention applied to the window:
    src = window_min + (dst + 0.5) * side / out - 0.5.
    """
    x_min = src_center[0] - src_side / 2.0
    y_min = src_center[1] - src_side / 2.0
    scale = src_side / out_size
    coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    # Clamp to the window interior: cv2.resize on a crop replicates the crop's edge
    # rows/cols, so samples never blend with image content outside the window.
    coords = jnp.clip(coords, 0.0, src_side - 1.0)
    xs = x_min + coords[None, :]
    ys = y_min + coords[:, None]
    xs = jnp.broadcast_to(xs, (out_size, out_size))
    ys = jnp.broadcast_to(ys, (out_size, out_size))
    return _bilinear_sample(img, xs, ys)
