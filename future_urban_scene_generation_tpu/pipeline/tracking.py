"""Streaming detect -> track front-end.

The reference never detects or tracks: it consumes PRECOMPUTED multi-target
tracking files (utils/video_info_utils.py:7-21 — CSV of frame, id, x, y, w, h per
row) and a GUI click to select vehicles. For interactive streaming (BASELINE.md
config 5: detect -> track -> keypoint -> NVS -> composite) the framework provides
the missing front-end:

* frame-level detectors (`BackgroundDiffDetector` on-device for static cameras,
  `MaskRCNNDetector` wrapping the native Mask R-CNN) producing (boxes, scores);
* `IouTracker` — greedy IoU association with constant-velocity box prediction,
  the standard SORT-style baseline (tracking is O(tracks x detections) control
  logic over <=16 boxes — host numpy by design, the device does the pixel work);
* `predict_future_meters` — ground-plane constant-velocity rollout replacing the
  reference's precomputed future rows (GUI/app_interface.py:225-234): track
  history -> pixel->GPS->meters (geometry/gps.py) -> linear extrapolation.

`TrackingStreamRunner` (pipeline/streaming.py) composes these with the scene
runner into the full streaming loop with no caller-supplied boxes.
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Detectors: frame -> (boxes (N, 4) xyxy, scores (N,))
# ---------------------------------------------------------------------------


class BackgroundDiffDetector:
    """Static-camera vehicle detector: device-side |frame - background| mask,
    host-side connected components on a downsampled grid.

    The pixel work (channel-sum abs diff, threshold, box-blur denoise, 1/scale
    downsample) is one small jit; only the (H/s, W/s) bool grid crosses to host,
    where a linear-time two-pass union-find labels components and emits boxes.
    """

    def __init__(self, background, threshold: float = 0.10, scale: int = 8,
                 min_area_px: float = 24 * 24, max_boxes: int = 16):
        import jax
        import jax.numpy as jnp

        self.scale = int(scale)
        self.min_cells = max(1, int(min_area_px / (scale * scale)))
        self.max_boxes = int(max_boxes)

        bg = jnp.asarray(background)

        @jax.jit
        def _mask(frame):
            diff = jnp.sum(jnp.abs(frame - bg), axis=-1)
            # 3x3 box blur knocks out single-pixel noise before thresholding.
            k = jnp.ones((3, 3), jnp.float32) / 9.0
            diff = jax.scipy.signal.convolve2d(diff, k, mode="same")
            hit = (diff > threshold).astype(jnp.float32)
            h, w = hit.shape
            s = self.scale
            grid = hit[: h - h % s, : w - w % s].reshape(h // s, s, w // s, s)
            # A cell counts when >=25% of its pixels moved.
            return grid.mean(axis=(1, 3)) >= 0.25

        self._mask = _mask

    def dispatch(self, frame):
        """Enqueue the device mask pass (async); returns a handle for finalize.

        Splitting dispatch from the host readback lets the streaming runner
        enqueue frame t's detection, then read frame t-1's (already complete)
        — reading right after dispatching would block behind everything ahead
        of it on the FIFO device queue (the previous scene program)."""
        return self._mask(frame)

    def finalize(self, grid_dev) -> Tuple[np.ndarray, np.ndarray]:
        """Block on a dispatch() handle and extract boxes (host union-find)."""
        grid = np.asarray(grid_dev)
        boxes = _connected_component_boxes(grid, self.min_cells)
        s = float(self.scale)
        out = np.asarray(
            [[x0 * s, y0 * s, (x1 + 1) * s, (y1 + 1) * s] for x0, y0, x1, y1, _ in boxes],
            np.float32,
        ).reshape(-1, 4)
        scores = np.asarray([a for *_, a in boxes], np.float32)
        order = np.argsort(-scores)[: self.max_boxes]
        return out[order], scores[order]

    def __call__(self, frame) -> Tuple[np.ndarray, np.ndarray]:
        return self.finalize(self.dispatch(frame))


def _connected_component_boxes(grid: np.ndarray, min_cells: int):
    """8-connected components of a small bool grid -> [(x0, y0, x1, y1, area)].

    Two-pass row-run union-find: O(cells). The grid is ~(H/8, W/8) so this is
    microseconds of host work per frame.
    """
    h, w = grid.shape
    parent: list = []

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    labels = np.full((h, w), -1, np.int32)
    prev_runs: List[Tuple[int, int, int]] = []  # (x_start, x_end_excl, label)
    for y in range(h):
        runs = []
        x = 0
        row = grid[y]
        while x < w:
            if not row[x]:
                x += 1
                continue
            x0 = x
            while x < w and row[x]:
                x += 1
            lab = len(parent)
            parent.append(lab)
            # 8-connectivity: overlap with previous row's runs extended by 1.
            for px0, px1, plab in prev_runs:
                if px0 - 1 < x and x0 < px1 + 1:
                    union(plab, lab)
            labels[y, x0:x] = lab
            runs.append((x0, x, lab))
        prev_runs = runs

    boxes = {}
    ys, xs = np.nonzero(labels >= 0)
    for y, x in zip(ys, xs):
        r = find(labels[y, x])
        if r in boxes:
            b = boxes[r]
            boxes[r] = (min(b[0], x), min(b[1], y), max(b[2], x), max(b[3], y), b[4] + 1)
        else:
            boxes[r] = (x, y, x, y, 1)
    return [
        (x0, y0, x1, y1, a) for (x0, y0, x1, y1, a) in boxes.values() if a >= min_cells
    ]


class MaskRCNNDetector:
    """Frame-level vehicle detection with the native Mask R-CNN
    (models/maskrcnn.py): fixed-size resize, jitted forward, vehicle-class filter
    (COCO 3=car, 6=bus, 8=truck as run_test.py:41-43 keeps car/truck)."""

    def __init__(self, params, model=None, classes=(3, 6, 8),
                 score_threshold: float = 0.5, input_hw=(512, 1024)):
        import jax

        from future_urban_scene_generation_tpu.models.maskrcnn import (
            MaskRCNN, maskrcnn_infer,
        )
        from future_urban_scene_generation_tpu.ops.resize import resize_bilinear

        self.params = params
        self.model = model or MaskRCNN()
        self.classes = tuple(classes)
        self.score_threshold = float(score_threshold)
        self.input_hw = tuple(input_hw)
        ih, iw = self.input_hw
        # One compiled program for the whole resize+detect pass — eager
        # maskrcnn_infer would dispatch thousands of ops per frame.
        self._infer = jax.jit(
            lambda p, f: maskrcnn_infer(p, resize_bilinear(f, (ih, iw)),
                                        model=self.model)
        )

    def dispatch(self, frame):
        """Enqueue the resize+detect program (async); handle for finalize —
        same FIFO-queue rationale as BackgroundDiffDetector.dispatch."""
        return self._infer(self.params, frame), (frame.shape[0], frame.shape[1])

    def finalize(self, handle) -> Tuple[np.ndarray, np.ndarray]:
        det, (h, w) = handle
        ih, iw = self.input_hw
        boxes = np.array(det.boxes, np.float32)  # copy: device views are read-only
        boxes *= np.asarray([w / iw, h / ih, w / iw, h / ih], np.float32)
        labels = np.asarray(det.labels)
        scores = np.asarray(det.scores, np.float32)
        valid = np.asarray(det.valid)
        keep = valid & (scores >= self.score_threshold) & np.isin(labels, self.classes)
        return boxes[keep], scores[keep]

    def __call__(self, frame) -> Tuple[np.ndarray, np.ndarray]:
        return self.finalize(self.dispatch(frame))


# ---------------------------------------------------------------------------
# Tracker
# ---------------------------------------------------------------------------


def iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    a = a[:, None]
    b = b[None, :]
    ix0 = np.maximum(a[..., 0], b[..., 0])
    iy0 = np.maximum(a[..., 1], b[..., 1])
    ix1 = np.minimum(a[..., 2], b[..., 2])
    iy1 = np.minimum(a[..., 3], b[..., 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / np.maximum(area_a + area_b - inter, 1e-9)


@dataclass
class Track:
    track_id: int
    bbox: np.ndarray  # (4,) xyxy, current (smoothed)
    velocity: np.ndarray = field(default_factory=lambda: np.zeros(2, np.float32))
    hits: int = 1
    misses: int = 0
    history: List[np.ndarray] = field(default_factory=list)  # mid-bottom px per frame

    @property
    def mid_bottom(self) -> np.ndarray:
        """Ground-contact point (BoundingBox.mid_bottom, utils/bounding_box.py:101-106)."""
        return np.asarray(
            [(self.bbox[0] + self.bbox[2]) / 2.0, self.bbox[3]], np.float32
        )

    def predicted_bbox(self) -> np.ndarray:
        shift = np.concatenate([self.velocity, self.velocity])
        return self.bbox + shift


class IouTracker:
    """Greedy IoU association with constant-velocity prediction (SORT-minus-Kalman).

    update(boxes) matches detections to velocity-predicted track boxes greedily by
    descending IoU above ``min_iou``; matched tracks EMA-smooth their box and
    velocity, unmatched detections open tentative tracks, unmatched tracks coast on
    their velocity for ``max_misses`` frames before deletion. A track is 'confirmed'
    after ``min_hits`` consecutive hits.
    """

    def __init__(self, min_iou: float = 0.2, max_misses: int = 5, min_hits: int = 3,
                 ema: float = 0.7):
        self.min_iou = float(min_iou)
        self.max_misses = int(max_misses)
        self.min_hits = int(min_hits)
        self.ema = float(ema)
        self.tracks: List[Track] = []
        self._ids = itertools.count()

    def update(self, boxes: np.ndarray) -> List[Track]:
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        matched_t, matched_d = set(), set()
        if self.tracks and len(boxes):
            pred = np.stack([t.predicted_bbox() for t in self.tracks])
            iou = iou_xyxy(pred, boxes)
            pairs = sorted(
                ((iou[i, j], i, j) for i in range(iou.shape[0])
                 for j in range(iou.shape[1])),
                reverse=True,
            )
            for v, i, j in pairs:
                if v < self.min_iou or i in matched_t or j in matched_d:
                    continue
                matched_t.add(i)
                matched_d.add(j)
                t = self.tracks[i]
                new_center = (boxes[j, :2] + boxes[j, 2:]) / 2.0
                old_center = (t.bbox[:2] + t.bbox[2:]) / 2.0
                t.velocity = (
                    self.ema * (new_center - old_center) + (1 - self.ema) * t.velocity
                )
                t.bbox = self.ema * boxes[j] + (1 - self.ema) * t.bbox
                t.hits += 1
                t.misses = 0
                t.history.append(t.mid_bottom)

        for i, t in enumerate(self.tracks):
            if i not in matched_t:
                t.misses += 1
                t.bbox = t.predicted_bbox()  # coast
                t.history.append(t.mid_bottom)

        for j in range(len(boxes)):
            if j not in matched_d:
                t = Track(next(self._ids), boxes[j].copy())
                t.history.append(t.mid_bottom)
                self.tracks.append(t)

        self.tracks = [t for t in self.tracks if t.misses <= self.max_misses]
        return self.confirmed()

    def confirmed(self) -> List[Track]:
        return [t for t in self.tracks if t.hits >= self.min_hits]


# ---------------------------------------------------------------------------
# Future trajectory prediction (replaces the precomputed future tracking rows)
# ---------------------------------------------------------------------------


def predict_future_meters(
    history_px: Sequence[np.ndarray],
    inv_homography: Optional[np.ndarray],
    n_points: int,
    stride: int = 2,
    history_window: int = 19,
) -> Optional[np.ndarray]:
    """Constant-velocity ground-plane rollout from a track's pixel history.

    history_px: the track's mid-bottom points, one per PROCESSED frame (oldest
    first). The points are mapped to metric ground coordinates (pixel -> GPS ->
    meters, geometry/gps.py — host f64 like the reference), the mean velocity over
    the last ``history_window`` deltas is taken (the reference derives its heading
    from the mean of the first 19 deltas, trajectory_inference.py:259-262), and
    ``n_points`` positions are emitted at ``stride``-frame spacing starting at the
    current position — the same (t, t+2, ..., t+2(n-1)) cadence as the GUI's
    ``range(0, 11, 2)`` subsample (GUI/app_interface.py:230-233).

    Returns (n_points, 2) float32 meters, or None with <2 history points.
    With inv_homography=None the pixel plane is treated as the ground plane
    (synthetic tests / unknown calibration).
    """
    if len(history_px) < 2:
        return None
    pts = np.asarray(history_px, np.float64)
    if inv_homography is not None:
        from future_urban_scene_generation_tpu.geometry.gps import trajectory_to_meters

        meters = trajectory_to_meters(pts, np.asarray(inv_homography, np.float64))
    else:
        meters = pts
    deltas = np.diff(meters[-(history_window + 1):], axis=0)
    vel = deltas.mean(axis=0)  # meters per processed frame
    start = meters[-1]
    steps = np.arange(n_points, dtype=np.float64)[:, None] * float(stride)
    out = start[None, :] + steps * vel[None, :]
    return np.asarray(out, np.float32)
