"""Independent numpy/scipy transcription of skimage.feature.canny — test oracle.

skimage is not installable in this environment, so ops/canny.py cannot be
golden-tested against it directly (utils/inpaint_utils.py:51 is the reference
call site). This module re-expresses skimage's published Canny algorithm on
top of scipy.ndimage primitives (gaussian_filter, sobel, binary_erosion,
label) with none of ops/canny.py's machinery — the same oracle pattern
torch_refs.py uses for the model architectures. Differences from the real
skimage would have to survive two independent transcriptions to go unnoticed.

Algorithm (skimage.feature.canny, float input, mode='constant', cval=0):
  smoothing with bleed-over renormalization; unnormalized ndi.sobel gradients;
  candidate mask = eroded detection mask & magnitude > 0; octant-wise
  bilinear-interpolated non-maximum suppression; double-threshold hysteresis
  via connected-component labeling.
"""
import numpy as np
from scipy import ndimage as ndi


def canny_oracle(image, sigma=2.0, low_threshold=0.1, high_threshold=0.2, mask=None):
    image = np.asarray(image, np.float32)

    # --- smoothing with bleed-over normalization (skimage _preprocess) ---
    if mask is None:
        mask_b = np.ones(image.shape, bool)
        masked = image
        eroded = np.ones(image.shape, bool)
        eroded[0, :] = eroded[-1, :] = False
        eroded[:, 0] = eroded[:, -1] = False
    else:
        mask_b = np.asarray(mask, bool)
        masked = np.where(mask_b, image, 0.0).astype(np.float32)
        eroded = ndi.binary_erosion(
            mask_b, ndi.generate_binary_structure(2, 2), border_value=0
        )
    bleed = ndi.gaussian_filter(
        mask_b.astype(np.float32), sigma, mode="constant", truncate=4.0
    ) + np.finfo(np.float32).eps
    smoothed = (
        ndi.gaussian_filter(masked, sigma, mode="constant", truncate=4.0) / bleed
    )

    # --- unnormalized sobel gradients ---
    gi = ndi.sobel(smoothed, axis=0)
    gj = ndi.sobel(smoothed, axis=1)
    mag = np.hypot(gi, gj)

    cand = eroded & (mag > 0)
    ai, aj = np.abs(gi), np.abs(gj)

    # --- octant NMS via fancy indexing (skimage _get_local_maxima style) ---
    maxima = np.zeros(image.shape, bool)
    padded = np.pad(mag, 1)

    def at(off_i, off_j, idx):
        ii, jj = idx
        return padded[ii + 1 + off_i, jj + 1 + off_j]

    idx = np.nonzero(cand)
    m = mag[idx]
    gi_c, gj_c = gi[idx], gj[idx]
    ai_c, aj_c = ai[idx], aj[idx]
    si = np.sign(gi_c).astype(int)
    sj = np.sign(gj_c).astype(int)
    i_dom = ai_c >= aj_c
    with np.errstate(divide="ignore", invalid="ignore"):
        w = np.where(i_dom, aj_c / np.where(ai_c == 0, 1, ai_c),
                     ai_c / np.where(aj_c == 0, 1, aj_c))
    axis_p = at(np.where(i_dom, si, 0), np.where(i_dom, 0, sj), idx)
    diag_p = at(si, sj, idx)
    axis_m = at(np.where(i_dom, -si, 0), np.where(i_dom, 0, -sj), idx)
    diag_m = at(-si, -sj, idx)
    plus = axis_p * (1 - w) + diag_p * w
    minus = axis_m * (1 - w) + diag_m * w
    maxima[idx] = (plus <= m) & (minus <= m)

    # --- hysteresis via labeling ---
    low_mask = maxima & (mag >= low_threshold)
    high_mask = low_mask & (mag >= high_threshold)
    labels, count = ndi.label(low_mask, np.ones((3, 3), bool))
    if count == 0:
        return high_mask
    sums = ndi.sum(high_mask, labels, np.arange(1, count + 1))
    good = np.zeros(count + 1, bool)
    good[1:] = np.asarray(sums) > 0
    return good[labels]
