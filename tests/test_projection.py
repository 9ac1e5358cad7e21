"""Projection vs cv2.projectPoints (zero distortion)."""
import cv2
import numpy as np

from future_urban_scene_generation_tpu.geometry import projection as proj
from future_urban_scene_generation_tpu.geometry import rotations as rot

rng = np.random.RandomState(4)

K = np.array([[1000.0, 0, 640], [0, 1000.0, 360], [0, 0, 1]], dtype=np.float32)


def test_project_points_rodrigues_matches_cv2():
    pts = rng.randn(12, 3).astype(np.float32)
    rvec = rng.randn(3).astype(np.float32) * 0.5
    tvec = np.array([0.3, -0.2, 10.0], dtype=np.float32)
    ours = np.asarray(proj.project_points_rodrigues(pts, rvec, tvec, K))
    ref, _ = cv2.projectPoints(
        pts.astype(np.float64), rvec.astype(np.float64), tvec.astype(np.float64),
        K.astype(np.float64), np.zeros(5),
    )
    assert np.max(np.abs(ours - ref.squeeze(1))) < 1e-2


def test_project_extrinsic_consistent():
    pts = rng.randn(12, 3).astype(np.float32)
    rvec = rng.randn(3).astype(np.float32) * 0.5
    tvec = np.array([0.3, -0.2, 10.0], dtype=np.float32)
    ext = np.asarray(rot.extrinsic_from_rodrigues(rvec, tvec))
    a = np.asarray(proj.project_points_extrinsic(pts, K, ext))
    b = np.asarray(proj.project_points_rodrigues(pts, rvec, tvec, K))
    assert np.max(np.abs(a - b)) < 1e-3


def test_project_normalized_consistent():
    pts = rng.randn(12, 3).astype(np.float32)
    rvec = rng.randn(3).astype(np.float32) * 0.5
    tvec = np.array([0.3, -0.2, 10.0], dtype=np.float32)
    focals = np.array([K[0, 0], K[1, 1]], dtype=np.float32)
    centers = np.array([K[0, 2], K[1, 2]], dtype=np.float32)
    a = np.asarray(proj.project_normalized(pts, rvec, tvec, focals, centers))
    b = np.asarray(proj.project_points_rodrigues(pts, rvec, tvec, K))
    assert np.max(np.abs(a - b)) < 1e-3
