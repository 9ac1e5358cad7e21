"""Image resampling with the exact index conventions the reference relies on.

Two conventions are load-bearing for output parity:

* ``resize_bilinear`` — OpenCV ``cv2.resize`` INTER_LINEAR: half-pixel centers,
  ``src = (dst + 0.5) * in/out - 0.5`` with edge clamping. Used everywhere the
  reference calls cv2.resize (crops to 256², stitch-back, plane crops, ...).
* ``resize_nearest`` — ``torch.nn.functional.interpolate`` default (nearest):
  ``src = floor(dst * in/out)``. Used where the reference upsamples heatmaps and
  VUNet inputs via F.interpolate (trajectory_inference.py:77,224-225).

Both are separable gather+lerp, fuse well under XLA, and are shape-polymorphic over
leading batch dims with channels-last layout ``(..., H, W, C)``.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _linear_coords(out_size: int, in_size: int):
    scale = in_size / out_size
    x = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    x0 = jnp.floor(x)
    frac = x - x0
    i0 = jnp.clip(x0.astype(jnp.int32), 0, in_size - 1)
    i1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, in_size - 1)
    return i0, i1, frac


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.resize(..., interpolation=INTER_LINEAR) equivalent on (..., H, W, C)."""
    out_h, out_w = out_hw
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (out_h, out_w):
        return img
    iy0, iy1, fy = _linear_coords(out_h, h)
    ix0, ix1, fx = _linear_coords(out_w, w)

    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    img = img.astype(dtype)
    fy = fy.astype(dtype).reshape((out_h, 1, 1))
    fx = fx.astype(dtype).reshape((out_w, 1))

    top = jnp.take(img, iy0, axis=-3)
    bot = jnp.take(img, iy1, axis=-3)
    rows = top * (1.0 - fy) + bot * fy
    left = jnp.take(rows, ix0, axis=-2)
    right = jnp.take(rows, ix1, axis=-2)
    return left * (1.0 - fx) + right * fx


def resize_nearest(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') equivalent on (..., H, W, C)."""
    out_h, out_w = out_hw
    h, w = img.shape[-3], img.shape[-2]
    if (h, w) == (out_h, out_w):
        return img
    iy = jnp.clip((jnp.arange(out_h) * h) // out_h, 0, h - 1).astype(jnp.int32)
    ix = jnp.clip((jnp.arange(out_w) * w) // out_w, 0, w - 1).astype(jnp.int32)
    return jnp.take(jnp.take(img, iy, axis=-3), ix, axis=-2)


def upsample2x_nearest(img: jnp.ndarray) -> jnp.ndarray:
    """Integer 2x nearest upsampling (torch nn.Upsample(scale_factor=2)) on (..., H, W, C)."""
    img = jnp.repeat(img, 2, axis=-3)
    return jnp.repeat(img, 2, axis=-2)
