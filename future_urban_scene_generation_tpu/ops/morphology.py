"""Binary morphology via windowed reductions (replaces cv2.dilate/erode).

The inpainting input builder dilates the segmentation mask with an 8x8 elliptical
structuring element (utils/inpaint_utils.py:42-43). ``lax.reduce_window`` max over the
structuring-element footprint is the TPU-native equivalent; the elliptical SE is the
exact boolean footprint cv2.getStructuringElement(MORPH_ELLIPSE, ...) produces.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def elliptical_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k)) footprint, matching the
    OpenCV source: r = c = k // 2, dy = i - r (asymmetric for even k),
    dx = cvRound(c * sqrt((r^2 - dy^2) / r^2)), columns [c - dx, c + dx]."""
    r = c = ksize // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    k = np.zeros((ksize, ksize), bool)
    for i in range(ksize):
        dy = i - r
        if abs(dy) > r:
            continue
        dx = int(np.rint(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
        k[i, max(c - dx, 0): min(c + dx + 1, ksize)] = True
    return k


def dilate(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Binary dilation of an (..., H, W) mask by a boolean footprint.

    cv2 anchors the kernel at (k//2, k//2): output pixel p is set if any input pixel q
    with (p - q + anchor) inside the footprint is set — i.e. a max over the REFLECTED
    footprint centered at p. For the symmetric elliptical SE the reflection is itself.
    """
    kh, kw = kernel.shape
    flipped = kernel[::-1, ::-1]
    m = mask.astype(jnp.float32)
    # Footprint max = max over shifted copies where the footprint is set.
    out = jnp.zeros_like(m)
    ah, aw = (kh - 1) - kh // 2, (kw - 1) - kw // 2  # reflected anchor
    padded = jnp.pad(
        m,
        [(0, 0)] * (m.ndim - 2) + [(kh - 1, kh - 1), (kw - 1, kw - 1)],
    )
    h, w = mask.shape[-2], mask.shape[-1]
    for dy in range(kh):
        for dx in range(kw):
            if not flipped[dy, dx]:
                continue
            ys = kh - 1 + (ah - dy)
            xs = kw - 1 + (aw - dx)
            out = jnp.maximum(
                out,
                jax.lax.dynamic_slice_in_dim(
                    jax.lax.dynamic_slice_in_dim(padded, ys, h, axis=-2), xs, w, axis=-1
                ),
            )
    return out > 0.5


def erode(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    return jnp.logical_not(dilate(jnp.logical_not(mask), kernel[::-1, ::-1]))
