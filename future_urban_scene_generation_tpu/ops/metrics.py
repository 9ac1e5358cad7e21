"""Quality metrics: PSNR, edge precision/recall (reference parity) and SSIM.

PSNR and EdgeAccuracy mirror edgeconnect/metrics.py:5-46; SSIM (the BASELINE.md
fidelity metric) follows Wang et al. with the standard 11x11 Gaussian window
(sigma 1.5), matching skimage's structural_similarity(gaussian_weights=True,
use_sample_covariance=False) on float images.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """edgeconnect/metrics.py:30-46 (returns 0 for identical images, as the
    reference does)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    val = 20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
    return jnp.where(mse == 0, 0.0, val)


def edge_accuracy(inputs: jnp.ndarray, outputs: jnp.ndarray, threshold: float = 0.5):
    """Precision/recall of a predicted edge map (edgeconnect/metrics.py:5-27)."""
    labels = inputs > threshold
    preds = outputs > threshold
    relevant = jnp.sum(labels.astype(jnp.float32))
    selected = jnp.sum(preds.astype(jnp.float32))
    tp = jnp.sum(((preds == labels) & labels).astype(jnp.float32))
    recall = tp / (relevant + 1e-8)
    precision = tp / (selected + 1e-8)
    both_empty = (relevant == 0) & (selected == 0)
    return jnp.where(both_empty, 1.0, precision), jnp.where(both_empty, 1.0, recall)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d_valid(img: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable valid-mode filtering of (..., H, W)."""
    k = jnp.asarray(k1d)
    img = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=-1, out_axes=-1)(
        img
    )
    img = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"), in_axes=-2, out_axes=-2)(
        img
    )
    return img


def ssim_map(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Per-pixel SSIM map over the VALID window region ((H-10, W-10) for the
    11-tap Gaussian); channels averaged. mean(ssim_map) == ssim. Used by
    tools/fidelity_attribution.py to localize crossval deficits by region."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim == 3:
        return jnp.mean(
            jnp.stack(
                [ssim_map(a[..., c], b[..., c], max_val) for c in range(a.shape[-1])]
            ),
            axis=0,
        )
    k1d = _gaussian_window()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2d_valid(a, k1d)
    mu_b = _filter2d_valid(b, k1d)
    var_a = _filter2d_valid(a * a, k1d) - mu_a**2
    var_b = _filter2d_valid(b * b, k1d) - mu_b**2
    cov = _filter2d_valid(a * b, k1d) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return num / den


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean SSIM over an (H, W) or (H, W, C) image pair (channels averaged)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    if a.ndim == 3:
        return jnp.mean(
            jnp.stack([ssim(a[..., c], b[..., c], max_val) for c in range(a.shape[-1])])
        )
    k1d = _gaussian_window()
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a = _filter2d_valid(a, k1d)
    mu_b = _filter2d_valid(b, k1d)
    var_a = _filter2d_valid(a * a, k1d) - mu_a**2
    var_b = _filter2d_valid(b * b, k1d) - mu_b**2
    cov = _filter2d_valid(a * b, k1d) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)
