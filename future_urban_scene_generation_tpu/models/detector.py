"""Pluggable vehicle-segmentation interface for the inpainting branch.

The reference runs torchvision Mask R-CNN per vehicle crop and keeps the top-scoring
car/truck mask (run_test.py:41-43, trajectory_inference.py:115-119). Detection is the
one reference model with data-dependent shapes, so the framework makes it a pluggable
stage (SURVEY §7 hard part #1) with three implementations:

* ``MeshSilhouetteSegmenter`` — the framework-native default: the pipeline already
  knows the vehicle's posed CAD mesh, so the rasterized silhouette (dilated for
  slack) is a better-grounded mask than a detector's, with zero extra models;
* ``BackgroundDiffSegmenter`` — |frame - background| thresholding for static-camera
  scenes (CityFlow cameras are static);
* ``HostDetectorSegmenter`` — adapter for any host callback (e.g. a torch Mask R-CNN
  on CPU) returning a binary mask;
* ``MaskRCNNSegmenter`` — strict reference parity: the TPU-native Mask R-CNN
  (models/maskrcnn.py, static shapes end-to-end) run on the frame, keeping the
  best-scoring vehicle-class detection that overlaps the query bbox.

All produce fixed-shape (H, W) bool masks; device implementations are jittable.
"""
from __future__ import annotations

from typing import Callable, Protocol

import jax.numpy as jnp
import numpy as np

from future_urban_scene_generation_tpu.ops.morphology import dilate, elliptical_kernel


class Segmenter(Protocol):
    def __call__(self, frame: jnp.ndarray, bbox_xyxy: jnp.ndarray, **context) -> jnp.ndarray:
        """Return an (H, W) bool vehicle mask for the given frame/bbox."""
        ...


class MeshSilhouetteSegmenter:
    """Mask = the posed mesh silhouette rendered at frame scale, optionally dilated."""

    def __init__(self, dilate_ksize: int = 8):
        self.kernel = elliptical_kernel(dilate_ksize) if dilate_ksize else None

    def __call__(self, frame, bbox_xyxy, *, silhouette_frame=None, **_):
        if silhouette_frame is None:
            raise ValueError("MeshSilhouetteSegmenter needs silhouette_frame context")
        mask = silhouette_frame
        if self.kernel is not None:
            mask = dilate(mask, self.kernel)
        return mask


class BackgroundDiffSegmenter:
    """Threshold |frame - background| within the bbox; static-camera scenes only."""

    def __init__(self, background: jnp.ndarray, threshold: float = 0.12,
                 dilate_ksize: int = 8):
        self.background = background
        self.threshold = threshold
        self.kernel = elliptical_kernel(dilate_ksize) if dilate_ksize else None

    def __call__(self, frame, bbox_xyxy, **_):
        h, w = frame.shape[0], frame.shape[1]
        diff = jnp.sum(jnp.abs(frame - self.background), axis=-1) > self.threshold
        xs = jnp.arange(w)[None, :]
        ys = jnp.arange(h)[:, None]
        inside = (
            (xs >= bbox_xyxy[0]) & (xs <= bbox_xyxy[2])
            & (ys >= bbox_xyxy[1]) & (ys <= bbox_xyxy[3])
        )
        mask = diff & inside
        if self.kernel is not None:
            mask = dilate(mask, self.kernel)
        return mask


class HostDetectorSegmenter:
    """Adapter for a host-side detector callback (numpy in, numpy out)."""

    def __init__(self, detect_fn: Callable[[np.ndarray, np.ndarray], np.ndarray]):
        self.detect_fn = detect_fn

    def __call__(self, frame, bbox_xyxy, **_):
        mask = self.detect_fn(np.asarray(frame), np.asarray(bbox_xyxy))
        return jnp.asarray(mask.astype(bool))


class MaskRCNNSegmenter:
    """The reference's detector, TPU-native (models/maskrcnn.py).

    Runs jitted single-image Mask R-CNN, picks the highest-scoring detection of an
    allowed class (COCO: 3=car, 6=bus, 8=truck — run_test.py keeps car/truck) whose
    box IoU with the query bbox exceeds ``min_iou``, and pastes its 28x28 mask into
    frame coordinates. Returns an all-false mask when nothing qualifies.

    The frame is resized to a fixed ``input_hw`` (multiples of 64) before the
    network — the static-shape analogue of GeneralizedRCNNTransform's min/max-size
    resize; boxes/masks map back through the inverse scale.
    """

    def __init__(self, params, model=None, classes=(3, 6, 8), min_iou: float = 0.3,
                 input_hw=(512, 1024), mask_threshold: float = 0.5):
        from future_urban_scene_generation_tpu.models.maskrcnn import MaskRCNN

        self.params = params
        self.model = model or MaskRCNN()
        self.classes = tuple(classes)
        self.min_iou = min_iou
        self.input_hw = tuple(input_hw)
        self.mask_threshold = mask_threshold

    def __call__(self, frame, bbox_xyxy, **_):
        return self.masks_for_bboxes(frame, bbox_xyxy[None])[0]

    def masks_for_bboxes(self, frame, bboxes_xyxy):
        """All vehicle masks of one frame in a single detector pass.

        (H, W, 3), (V, 4) -> (V, H, W) bool. The reference re-runs the full
        detector per vehicle on a 1.3x context crop (trajectory_inference.py:
        115-119, 319-324); detecting once per frame and selecting per bbox
        yields the same per-vehicle masks at 1/V the detector cost (documented
        delta: full-frame input instead of the per-vehicle crop).
        """
        import jax

        from future_urban_scene_generation_tpu.models.maskrcnn import (
            maskrcnn_infer, paste_mask,
        )
        from future_urban_scene_generation_tpu.ops.detection import batched_iou
        from future_urban_scene_generation_tpu.ops.resize import resize_bilinear

        h, w = frame.shape[0], frame.shape[1]
        ih, iw = self.input_hw
        net_in = resize_bilinear(frame, (ih, iw))
        det = maskrcnn_infer(self.params, net_in, model=self.model)

        scale = jnp.asarray([w / iw, h / ih, w / iw, h / ih], jnp.float32)
        boxes = det.boxes * scale
        cls_ok = jnp.zeros_like(det.valid)
        for c in self.classes:
            cls_ok = cls_ok | (det.labels == c)

        def select(bbox_xyxy):
            iou = batched_iou(boxes, bbox_xyxy[None])[:, 0]
            score = jnp.where(
                det.valid & cls_ok & (iou >= self.min_iou), det.scores, -1.0
            )
            best = jnp.argmax(score)
            mask = paste_mask(det.masks[best], boxes[best], h, w)
            hit = score[best] > 0
            return (mask >= self.mask_threshold) & hit

        return jax.vmap(select)(bboxes_xyxy)
