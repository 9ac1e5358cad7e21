"""Detection primitives: static NMS vs greedy reference, ROIAlign properties."""
import numpy as np
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops import detection as det

rng = np.random.RandomState(60)


def _greedy_nms_ref(boxes, scores, iou_thr, score_thr):
    order = np.argsort(-scores)
    kept = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i] or scores[i] <= score_thr:
            continue
        kept.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            iou = _iou(boxes[i], boxes[j])
            if iou > iou_thr and scores[j] <= scores[i]:
                # only suppress lower-ranked boxes
                if np.where(order == j)[0][0] > np.where(order == i)[0][0]:
                    suppressed[j] = True
    return kept


def _iou(a, b):
    ix0, iy0 = max(a[0], b[0]), max(a[1], b[1])
    ix1, iy1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def test_nms_matches_greedy_reference():
    for trial in range(5):
        n = 40
        centers = rng.rand(n, 2) * 100
        sizes = rng.rand(n, 2) * 30 + 5
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], 1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        idx, valid = det.nms_static(jnp.asarray(boxes), jnp.asarray(scores),
                                    iou_threshold=0.4, max_outputs=n)
        ours = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
        ref = _greedy_nms_ref(boxes, scores, 0.4, 0.0)
        assert ours == ref, (trial, ours, ref)


def test_nms_score_threshold_and_padding():
    boxes = np.float32([[0, 0, 10, 10], [100, 100, 110, 110], [1, 1, 11, 11]])
    scores = np.float32([0.9, 0.05, 0.8])
    idx, valid = det.nms_static(jnp.asarray(boxes), jnp.asarray(scores),
                                iou_threshold=0.5, score_threshold=0.1, max_outputs=5)
    kept = [int(i) for i, v in zip(np.asarray(idx), np.asarray(valid)) if v]
    assert kept == [0]  # box2 below score thr, box3 suppressed by IoU
    assert np.asarray(idx)[len(kept):].tolist() == [-1] * (5 - len(kept))


def test_roi_align_constant_region():
    feat = np.zeros((32, 32, 3), np.float32)
    feat[8:24, 8:24] = 2.5
    out = det.roi_align(jnp.asarray(feat), jnp.asarray([[9.0, 9.0, 23.0, 23.0]]),
                        output_size=7)
    assert out.shape == (1, 7, 7, 3)
    assert np.allclose(np.asarray(out), 2.5, atol=1e-5)


def test_roi_align_gradient_region():
    # Linear ramp: ROIAlign of a linear function reproduces it exactly (bilinear).
    xx = np.arange(64, dtype=np.float32)
    feat = np.broadcast_to(xx[None, :, None], (64, 64, 1)).copy()
    roi = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])
    out = np.asarray(det.roi_align(jnp.asarray(feat), roi, output_size=4))[0, :, :, 0]
    # Each row identical; columns increase linearly with bin centers.
    assert np.allclose(out, out[0:1, :], atol=1e-4)
    diffs = np.diff(out[0])
    assert np.allclose(diffs, diffs[0], atol=1e-4)


def test_batched_iou():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[5.0, 0, 15, 10], [20.0, 20, 30, 30]])
    iou = np.asarray(det.batched_iou(a, b))
    assert abs(iou[0, 0] - 50.0 / 150.0) < 1e-6
    assert iou[0, 1] == 0.0
