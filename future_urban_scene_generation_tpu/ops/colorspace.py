"""Color-space conversions as pure jnp math (VPU-friendly, fuses into surrounding ops).

The synthesis generators are trained in LAB space (reference: warp_learn/models.py:353-360,
warp_learn/planes_utils.py:85-93), so RGB↔LAB must match OpenCV's uint8 conventions to
reproduce the reference outputs. OpenCV's 8-bit path applies the sRGB gamma expansion,
the D65-normalized XYZ matrix, the CIE f(t) with the 0.008856 threshold, then scales
L to [0,255] and offsets a/b by +128 (verified empirically against cv2.cvtColor; cv2's
LUT implementation differs by at most ±2/255).

All functions operate channels-last on float arrays in [0, 1] (the natural device
layout) and are shape-polymorphic over leading batch dims.
"""
from __future__ import annotations

import jax.numpy as jnp

import numpy as _np

# sRGB (linear) -> XYZ, D65 (OpenCV constants). Kept as plain Python floats and applied
# with explicit per-channel FMAs: a 3x3 matmul would be routed to the MXU where f32
# defaults to bf16 passes on TPU — these mixes are elementwise VPU work and must stay
# full precision (the inverse matrix has strong cancellation near the gamut boundary).
_RGB2XYZ = _np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=_np.float64,
)
_XYZ2RGB = _np.linalg.inv(_RGB2XYZ)


def _mix3(m, c0, c1, c2):
    """Apply a host-constant 3x3 matrix to three channel planes elementwise."""
    return (
        m[0][0] * c0 + m[0][1] * c1 + m[0][2] * c2,
        m[1][0] * c0 + m[1][1] * c1 + m[1][2] * c2,
        m[2][0] * c0 + m[2][1] * c1 + m[2][2] * c2,
    )

_XN = 0.950456  # D65 white point X
_ZN = 1.088754  # D65 white point Z
_LAB_T0 = 0.008856  # CIE threshold (6/29)^3
_LAB_K = 903.3  # CIE kappa (29/3)^3


def srgb_gamma_expand(x):
    """sRGB electro-optical transfer: gamma-encoded [0,1] -> linear [0,1]."""
    return jnp.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)


def srgb_gamma_compress(x):
    """Linear [0,1] -> gamma-encoded [0,1]."""
    x = jnp.maximum(x, 0.0)
    return jnp.where(x > 0.0031308, 1.055 * x ** (1.0 / 2.4) - 0.055, 12.92 * x)


def rgb_to_lab(rgb):
    """RGB float [0,1] (channels-last) -> LAB scaled to the uint8 convention / 255.

    Output channels are (L*255/100, a+128, b+128) / 255 so that a round trip through
    uint8 images is the identity up to quantization. This is exactly what the reference
    feeds the ICN after `cvtColor(..., COLOR_*2LAB)` + ToTensor (warp_learn/models.py:355).
    """
    lin = srgb_gamma_expand(rgb)
    x, y, z = _mix3(_RGB2XYZ, lin[..., 0], lin[..., 1], lin[..., 2])
    x = x / _XN
    z = z / _ZN

    def f(t):
        return jnp.where(t > _LAB_T0, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fy = f(y)
    l_val = jnp.where(y > _LAB_T0, 116.0 * jnp.cbrt(y) - 16.0, _LAB_K * y)
    a_val = 500.0 * (f(x) - fy) + 128.0
    b_val = 200.0 * (fy - f(z)) + 128.0
    lab = jnp.stack([l_val * (255.0 / 100.0), a_val, b_val], axis=-1)
    return lab / 255.0


def lab_to_rgb(lab):
    """Inverse of :func:`rgb_to_lab` (input in the same /255-scaled uint8 convention)."""
    lab = lab * 255.0
    l_val = lab[..., 0] * (100.0 / 255.0)
    a_val = lab[..., 1] - 128.0
    b_val = lab[..., 2] - 128.0

    fy = (l_val + 16.0) / 116.0
    fx = fy + a_val / 500.0
    fz = fy - b_val / 200.0

    def finv(ft):
        return jnp.where(ft ** 3 > _LAB_T0, ft ** 3, (ft - 16.0 / 116.0) / 7.787)

    y = jnp.where(l_val > _LAB_K * _LAB_T0, fy ** 3, l_val / _LAB_K)
    x = finv(fx) * _XN
    z = finv(fz) * _ZN

    r, g, b = _mix3(_XYZ2RGB, x, y, z)
    lin = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(srgb_gamma_compress(lin), 0.0, 1.0)


def bgr_to_lab(bgr):
    return rgb_to_lab(bgr[..., ::-1])


def lab_to_bgr(lab):
    return lab_to_rgb(lab)[..., ::-1]


def rgb_to_gray(rgb):
    """Luma per OpenCV COLOR_RGB2GRAY: 0.299 R + 0.587 G + 0.114 B. Keeps last dim of 1."""
    w = jnp.array([0.299, 0.587, 0.114], dtype=rgb.dtype)
    return jnp.sum(rgb * w, axis=-1, keepdims=True)


def bgr_to_gray(bgr):
    return rgb_to_gray(bgr[..., ::-1])


def rgb_to_ycbcr(rgb):
    """BT.601 YCbCr in the [16..235]/[16..240] range convention used by the reference's
    RGB2YCbCr layer (vunet/layers.py:224-243; input there is BGR in [-1,1])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 16.0 + 65.481 * r + 128.553 * g + 24.966 * b
    cb = 128.0 - 37.797 * r - 74.203 * g + 112.0 * b
    cr = 128.0 + 112.0 * r - 93.786 * g - 18.214 * b
    return jnp.stack([y, cb, cr], axis=-1)
