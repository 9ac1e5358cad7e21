"""XLA-friendly detection primitives: ROIAlign and static-shape NMS.

The reference's only detector is torchvision Mask R-CNN, whose CUDA ops
(ROIAlign, NMS) have data-dependent shapes — the classic TPU detection obstacle
(SURVEY §7 hard part #1). These are the fixed-shape equivalents every XLA detection
model builds on:

* ``roi_align`` — torchvision-semantics ROIAlign (half-pixel alignment,
  ``sampling_ratio`` grid samples per bin, average pooling), vectorized as bilinear
  gathers over a fixed (N_roi, out, out, sampling^2) sample grid;
* ``nms_static`` — top-K greedy non-maximum suppression with a fixed box count and a
  keep mask instead of a variable-length index list: a `lax.scan` over the
  score-sorted boxes suppressing by IoU, exactly reproducing greedy NMS order;
* ``batched_iou`` — pairwise IoU.

The full native Mask R-CNN (models/maskrcnn.py: ResNet50-FPN, RPN, box/mask heads,
torchvision converter) builds on these ops; the pipeline exposes it via
models/detector.MaskRCNNSegmenter and pipeline/tracking.MaskRCNNDetector alongside
the lighter-weight segmenters that don't need a detector at all.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def batched_iou(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of (N, 4) x (M, 4) xyxy boxes -> (N, M)."""
    ax0, ay0, ax1, ay1 = (boxes_a[:, i, None] for i in range(4))
    bx0, by0, bx1, by1 = (boxes_b[None, :, i] for i in range(4))
    ix0 = jnp.maximum(ax0, bx0)
    iy0 = jnp.maximum(ay0, by0)
    ix1 = jnp.minimum(ax1, bx1)
    iy1 = jnp.minimum(ay1, by1)
    inter = jnp.clip(ix1 - ix0, 0) * jnp.clip(iy1 - iy0, 0)
    area_a = jnp.clip(ax1 - ax0, 0) * jnp.clip(ay1 - ay0, 0)
    area_b = jnp.clip(bx1 - bx0, 0) * jnp.clip(by1 - by0, 0)
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=("max_outputs",))
def nms_static(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.0,
    max_outputs: int = 100,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static shapes.

    boxes (N, 4) xyxy, scores (N,). Returns (indices (max_outputs,) int32 padded with
    -1, valid (max_outputs,) bool). Selection order and suppression match the
    classic greedy algorithm (and torchvision.ops.nms) exactly.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes_s = boxes[order]
    scores_s = scores[order]
    iou = batched_iou(boxes_s, boxes_s)

    def body(carry, i):
        suppressed = carry
        is_valid = jnp.logical_not(suppressed[i]) & (scores_s[i] > score_threshold)
        # Suppress all later boxes overlapping this one (only if this box is kept).
        later = jnp.arange(n) > i
        suppress_now = later & (iou[i] > iou_threshold) & is_valid
        return suppressed | suppress_now, is_valid

    suppressed0 = jnp.zeros(n, bool)
    _, kept = jax.lax.scan(body, suppressed0, jnp.arange(n))

    # Gather the first max_outputs kept boxes (original indices), -1 padded.
    kept_rank = jnp.cumsum(kept.astype(jnp.int32)) - 1  # rank among kept
    slot = jnp.where(kept, kept_rank, max_outputs)
    out_idx = jnp.full(max_outputs + 1, -1, jnp.int32)
    out_idx = out_idx.at[jnp.clip(slot, 0, max_outputs)].set(
        order.astype(jnp.int32), mode="drop"
    )
    # The scatter above writes in ascending scan order; clip-dropped writes land in
    # the sentinel slot. Recompute valid flags from the content.
    indices = out_idx[:max_outputs]
    valid = indices >= 0
    return indices, valid


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """torchvision ROIAlign (aligned=True semantics) on (H, W, C) features.

    rois: (N, 4) xyxy in input-image coordinates. Returns (N, out, out, C).
    Each output bin averages ``sampling_ratio^2`` bilinear samples at the standard
    half-offset grid positions.
    """
    h, w, _ = features.shape
    s = sampling_ratio

    def one(roi):
        x0, y0, x1, y1 = roi * spatial_scale
        # aligned=True: offset by -0.5 (continuous coordinates).
        x0 = x0 - 0.5
        y0 = y0 - 0.5
        x1 = x1 - 0.5
        y1 = y1 - 0.5
        bin_w = (x1 - x0) / output_size
        bin_h = (y1 - y0) / output_size
        # Sample positions: for bin i, samples at x0 + (i + (j+0.5)/s) * bin.
        grid = (jnp.arange(output_size)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
        xs = x0 + grid.reshape(-1) * bin_w  # (out*s,)
        ys = y0 + grid.reshape(-1) * bin_h

        x0i = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
        y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        fx = jnp.clip(xs - jnp.floor(xs), 0.0, 1.0)
        fy = jnp.clip(ys - jnp.floor(ys), 0.0, 1.0)

        # (out*s, out*s, C) bilinear samples via separable taps.
        def gather(yi, xi):
            return features[yi[:, None], xi[None, :]]  # (oy, ox, C)

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x1i)
        v10 = gather(y1i, x0i)
        v11 = gather(y1i, x1i)
        fx_b = fx[None, :, None]
        fy_b = fy[:, None, None]
        vals = (
            v00 * (1 - fx_b) * (1 - fy_b)
            + v01 * fx_b * (1 - fy_b)
            + v10 * (1 - fx_b) * fy_b
            + v11 * fx_b * fy_b
        )
        # Average the s x s samples inside each bin.
        vals = vals.reshape(output_size, s, output_size, s, -1)
        return jnp.mean(vals, axis=(1, 3))

    return jax.vmap(one)(rois)
