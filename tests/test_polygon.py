"""Polygon rasterization vs cv2.fillPoly (area-level parity is what visibility needs)."""
import cv2
import numpy as np

from future_urban_scene_generation_tpu.ops import polygon as pg

rng = np.random.RandomState(2)


def _cv2_mask(verts, h, w):
    m = np.zeros((h, w, 3), dtype=np.uint8)
    cv2.fillPoly(m, [np.int32(verts)], color=(1, 1, 1))
    return m[..., 0] > 0


def test_quad_iou_vs_cv2():
    for _ in range(10):
        # Random convex-ish quad inside a 128x128 grid.
        cx, cy = rng.uniform(30, 90, 2)
        angles = np.sort(rng.uniform(0, 2 * np.pi, 4))
        r = rng.uniform(10, 28, 4)
        verts = np.stack([cx + r * np.cos(angles), cy + r * np.sin(angles)], -1)
        # cv2.fillPoly truncates vertices to int32 (the reference feeds it np.int32
        # keypoints, warp_learn/planes_utils.py:27); match that convention here.
        ours = np.asarray(pg.fill_polygon(np.int32(verts).astype(np.float32), 128, 128))
        ref = _cv2_mask(verts, 128, 128)
        inter = np.sum(ours & ref)
        union = np.sum(ours | ref)
        assert union > 0 and inter / union > 0.93, inter / union


def test_area_ratio_stable():
    # The 0.9-area visibility rule must be stable under our rasterizer: a plane fully
    # repainted by a closer plane has occluded/absolute area ratio 0.
    verts = np.float32([[10, 10], [60, 10], [60, 60], [10, 60]])
    area = float(pg.polygon_area_pixels(verts, 128, 128))
    assert abs(area - 50 * 50) / (50 * 50) < 0.05


def test_padded_polygon_equivalent():
    verts = np.float32([[10, 10], [60, 12], [55, 66], [12, 60]])
    padded = pg.pad_polygon(verts, 7)
    a = np.asarray(pg.fill_polygon(verts, 96, 96))
    b = np.asarray(pg.fill_polygon(padded, 96, 96))
    assert np.array_equal(a, b)


def test_nonconvex_polygon():
    # Concave "L" — even-odd fill must leave the notch empty.
    verts = np.float32([[10, 10], [70, 10], [70, 40], [40, 40], [40, 70], [10, 70]])
    ours = np.asarray(pg.fill_polygon(verts, 96, 96))
    ref = _cv2_mask(verts, 96, 96)
    inter = np.sum(ours & ref)
    union = np.sum(ours | ref)
    assert inter / union > 0.95
    assert not ours[60, 60]  # inside the notch


def test_shoelace():
    verts = np.float32([[0, 0], [4, 0], [4, 3], [0, 3]])
    assert float(pg.polygon_area_shoelace(verts)) == 12.0
    padded = pg.pad_polygon(verts, 6)
    assert float(pg.polygon_area_shoelace(padded)) == 12.0
