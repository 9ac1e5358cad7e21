"""Canny edge detection in jnp, following scikit-image's algorithm.

The EdgeConnect input builder runs skimage.feature.canny with sigma=config.SIGMA
(default 2) restricted to an image mask (utils/inpaint_utils.py:51,
edgeconnect/config.py:48). The skimage pipeline, reproduced here with static shapes:

1. Gaussian smoothing (sigma, truncate=4.0 -> radius = round(4 * sigma)), with
   mask-normalized smoothing (the masked region contributes zero weight and the
   result is renormalized by the smoothed mask), and the mask eroded so gradients
   never straddle the mask boundary;
2. Sobel gradients (smoothed image);
3. non-maximum suppression with bilinear interpolation of gradient magnitude along
   the gradient direction;
4. double-threshold hysteresis: strong edges seed a flood fill through weak edges —
   realized as a fixed-point loop of dilate-and-mask (lax.while_loop).

Defaults match skimage: low_threshold=0.1, high_threshold=0.2 on float images.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _conv_sep(img: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable 2D convolution of an (H, W) image with edge-replicate padding
    ('nearest' mode, skimage's default for gaussian)."""
    r = len(k1d) // 2
    k = jnp.asarray(k1d)
    x = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (r, r)), mode="edge")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


def _sobel(img: jnp.ndarray):
    """Sobel gradients with skimage's kernel and reflect padding."""
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 4.0
    ky = kx.T
    p = jnp.pad(img, 1, mode="reflect")
    win = jnp.stack(
        [p[dy: dy + img.shape[0], dx: dx + img.shape[1]] for dy in range(3) for dx in range(3)],
        axis=-1,
    )
    gx = jnp.einsum("hwk,k->hw", win, kx.reshape(-1)[::-1])
    gy = jnp.einsum("hwk,k->hw", win, ky.reshape(-1)[::-1])
    return gx, gy


def _nms(mag, gx, gy):
    """Bilinear-interpolated non-maximum suppression (skimage-style)."""
    h, w = mag.shape
    eps = 1e-12
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)

    p = jnp.pad(mag, 1)

    def shift(dy, dx):
        return p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]

    # Interpolate along gradient direction in the proper octant.
    sx = jnp.sign(gx).astype(jnp.int32)
    sy = jnp.sign(gy).astype(jnp.int32)
    # Use |gy| >= |gx| split; weights from ratio.
    steep = ay > ax
    wgt = jnp.where(steep, ax / jnp.maximum(ay, eps), ay / jnp.maximum(ax, eps))

    # Neighbors for the two interpolation taps in +grad and -grad directions.
    # For non-steep (|gx|>=|gy|): taps at (0, sx) and (sy, sx); steep: (sy, 0), (sy, sx).
    def gather(off_y, off_x):
        ys = jnp.clip(jnp.arange(h)[:, None] + off_y + 1, 0, h + 1)
        xs = jnp.clip(jnp.arange(w)[None, :] + off_x + 1, 0, w + 1)
        return p[ys, xs]

    n1a = gather(jnp.where(steep, sy, 0), jnp.where(steep, 0, sx))
    n1b = gather(sy, sx)
    plus = n1a * (1 - wgt) + n1b * wgt
    n2a = gather(jnp.where(steep, -sy, 0), jnp.where(steep, 0, -sx))
    n2b = gather(-sy, -sx)
    minus = n2a * (1 - wgt) + n2b * wgt

    keep = (mag >= plus) & (mag >= minus)
    return jnp.where(keep, mag, 0.0)


def _hysteresis(weak: jnp.ndarray, strong: jnp.ndarray, max_iters: int = 256):
    """Flood strong edges through 8-connected weak pixels to a fixed point."""

    def grow(m):
        p = jnp.pad(m, 1)
        h, w = m.shape
        out = m
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                out = out | p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
        return out & weak

    def cond(state):
        m, prev, it = state
        return (it < max_iters) & jnp.any(m != prev)

    def body(state):
        m, _, it = state
        return grow(m), m, it + 1

    init = (strong & weak, jnp.zeros_like(strong), jnp.int32(0))
    final, _, _ = jax.lax.while_loop(cond, body, init)
    return final


@partial(jax.jit, static_argnames=("sigma",))
def canny(
    image: jnp.ndarray,
    sigma: float = 2.0,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Canny edges of an (H, W) float image in [0, 1]. Returns (H, W) bool.

    ``mask`` restricts detection (True = consider), as skimage's canny(mask=...):
    the mask is eroded by the smoothing radius so spurious boundary edges vanish.
    """
    k1d = gaussian_kernel_1d(sigma)
    if mask is None:
        mask_f = jnp.ones_like(image)
        eroded = jnp.ones(image.shape, bool)
    else:
        mask_f = mask.astype(image.dtype)
        from future_urban_scene_generation_tpu.ops.morphology import dilate

        se = np.ones((3, 3), bool)
        eroded = mask
        # skimage erodes the mask by the smoothing radius; iterate a 3x3 erosion
        # radius times (equivalent footprint).
        radius = int(4 * sigma + 0.5)
        for _ in range(radius):
            eroded = jnp.logical_not(dilate(jnp.logical_not(eroded), se))

    smoothed = _conv_sep(image * mask_f, k1d)
    norm = _conv_sep(mask_f, k1d)
    smoothed = jnp.where(norm > 1e-8, smoothed / jnp.maximum(norm, 1e-8), 0.0)

    gx, gy = _sobel(smoothed)
    mag = jnp.hypot(gx, gy)
    mag = jnp.where(eroded, mag, 0.0)

    local_max = _nms(mag, gx, gy)
    weak = local_max > low_threshold
    strong = local_max > high_threshold
    return _hysteresis(weak, strong)
