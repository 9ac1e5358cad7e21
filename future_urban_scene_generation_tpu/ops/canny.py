"""Canny edge detection in jnp, following scikit-image's algorithm exactly.

The EdgeConnect input builder runs skimage.feature.canny with sigma=config.SIGMA
(default 2) restricted to an image mask (utils/inpaint_utils.py:51,
edgeconnect/config.py:48). The skimage pipeline, reproduced here with static
shapes (cross-checked against an independent scipy.ndimage transcription in
tests/canny_oracle.py):

1. Gaussian smoothing (sigma, truncate=4.0 -> radius = int(4 * sigma + 0.5)),
   zero-padded ('constant' mode, skimage's default) with bleed-over
   normalization: the image is smoothed masked-to-zero and divided by the
   smoothed mask, so masked/out-of-frame pixels contribute no intensity;
2. UNNORMALIZED Sobel gradients of the smoothed image (scipy.ndimage.sobel's
   [-1, 0, 1] x [1, 2, 1] kernels, 'reflect' = edge-duplicating padding) —
   skimage thresholds the magnitude of these raw kernels, so a normalized
   Sobel would silently rescale low/high_threshold by 4x;
3. the detection mask: with no mask, everything but the 1-pixel image border;
   with a mask, ONE 8-connected binary erosion (border counts as False), and
   always restricted to magnitude > 0. NMS neighbor lookups still read the
   full magnitude field — only the candidate set is masked;
4. non-maximum suppression with bilinear interpolation of gradient magnitude
   along the gradient direction (keep when both interpolants are <= center);
5. double-threshold hysteresis: strong (>= high) edges flood through weak
   (>= low) 8-connected pixels — a fixed-point dilate-and-mask lax.while_loop
   (equivalent to skimage's connected-component labeling).

Defaults match skimage for float images: low_threshold=0.1, high_threshold=0.2.
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


def _conv_sep_zero(img: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable 2D convolution of an (H, W) image with zero padding
    ('constant' mode — skimage.feature.canny's default for the smoother)."""
    r = len(k1d) // 2
    k = jnp.asarray(k1d)
    x = jnp.pad(img, ((r, r), (0, 0)))
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(x)
    x = jnp.pad(x, ((0, 0), (r, r)))
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


def _sobel_unnormalized(img: jnp.ndarray):
    """scipy.ndimage.sobel gradients: [-1, 0, 1] derivative x [1, 2, 1] smooth,
    no /4 normalization, 'reflect' (edge-duplicating) padding.

    Returns (gi, gj): derivative along axis 0 (rows) and axis 1 (columns).
    """
    h, w = img.shape
    p = jnp.pad(img, 1, mode="symmetric")  # jnp 'symmetric' == scipy 'reflect'

    def sh(dy, dx):
        return p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]

    smooth_j = sh(0, -1) + 2.0 * sh(0, 0) + sh(0, 1)  # [1,2,1] along columns
    smooth_i = sh(-1, 0) + 2.0 * sh(0, 0) + sh(1, 0)  # [1,2,1] along rows
    # Derivatives re-read the padded field to keep the separable order exact.
    ps_j = jnp.pad(smooth_j, ((1, 1), (0, 0)), mode="symmetric")
    gi = ps_j[2:, :] - ps_j[:-2, :]
    ps_i = jnp.pad(smooth_i, ((0, 0), (1, 1)), mode="symmetric")
    gj = ps_i[:, 2:] - ps_i[:, :-2]
    return gi, gj


def _local_maxima(mag, gi, gj, cand):
    """skimage's octant-wise NMS, vectorized: bilinear-interpolate the FULL
    magnitude field one unit-chebyshev step along +/- gradient; a candidate
    survives when both interpolants are <= its own magnitude."""
    h, w = mag.shape
    eps = 1e-20
    ai = jnp.abs(gi)
    aj = jnp.abs(gj)

    p = jnp.pad(mag, 1)

    def gather(off_i, off_j):
        ys = jnp.clip(jnp.arange(h)[:, None] + off_i + 1, 0, h + 1)
        xs = jnp.clip(jnp.arange(w)[None, :] + off_j + 1, 0, w + 1)
        return p[ys, xs]

    si = jnp.sign(gi).astype(jnp.int32)
    sj = jnp.sign(gj).astype(jnp.int32)
    # i-dominant (0-45 / 135-180 octants) when |gi| >= |gj| (skimage's >=).
    i_dom = ai >= aj
    wgt = jnp.where(i_dom, aj / jnp.maximum(ai, eps), ai / jnp.maximum(aj, eps))

    axis_p = gather(jnp.where(i_dom, si, 0), jnp.where(i_dom, 0, sj))
    diag_p = gather(si, sj)
    plus = axis_p * (1 - wgt) + diag_p * wgt
    axis_m = gather(jnp.where(i_dom, -si, 0), jnp.where(i_dom, 0, -sj))
    diag_m = gather(-si, -sj)
    minus = axis_m * (1 - wgt) + diag_m * wgt

    return cand & (plus <= mag) & (minus <= mag)


def _erode8(mask: jnp.ndarray) -> jnp.ndarray:
    """One 8-connected binary erosion with the outside counted as False
    (scipy binary_erosion(mask, 3x3 ones, border_value=0))."""
    h, w = mask.shape
    p = jnp.pad(mask, 1, constant_values=False)
    out = mask
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = out & p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]
    return out


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

    ``mask`` restricts detection (True = consider), as skimage's canny(mask=...).
    """
    k1d = gaussian_kernel_1d(sigma)
    if mask is None:
        mask_f = jnp.ones_like(image)
        masked_image = image
        eroded = jnp.ones(image.shape, bool)
        eroded = eroded.at[0, :].set(False).at[-1, :].set(False)
        eroded = eroded.at[:, 0].set(False).at[:, -1].set(False)
    else:
        mask = mask.astype(bool)
        mask_f = mask.astype(image.dtype)
        masked_image = jnp.where(mask, image, 0.0)
        eroded = _erode8(mask)

    bleed_over = _conv_sep_zero(mask_f, k1d) + jnp.finfo(jnp.float32).eps
    smoothed = _conv_sep_zero(masked_image, k1d) / bleed_over

    gi, gj = _sobel_unnormalized(smoothed)
    mag = jnp.hypot(gi, gj)

    cand = eroded & (mag > 0.0)
    maxima = _local_maxima(mag, gi, gj, cand)
    weak = maxima & (mag >= low_threshold)
    strong = weak & (mag >= high_threshold)
    return _hysteresis(weak, strong)
