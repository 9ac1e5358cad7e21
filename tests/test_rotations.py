"""Rotation math vs cv2.Rodrigues and the reference's axis-rotation conventions."""
import cv2
import numpy as np

from future_urban_scene_generation_tpu.geometry import rotations as rot

rng = np.random.RandomState(3)


def test_rodrigues_to_matrix_matches_cv2():
    for _ in range(20):
        rvec = rng.randn(3).astype(np.float32) * 2.0
        ours = np.asarray(rot.rodrigues_to_matrix(rvec))
        ref, _ = cv2.Rodrigues(rvec.astype(np.float64))
        assert np.max(np.abs(ours - ref)) < 1e-5


def test_rodrigues_zero():
    ours = np.asarray(rot.rodrigues_to_matrix(np.zeros(3, np.float32)))
    assert np.allclose(ours, np.eye(3), atol=1e-7)


def test_matrix_to_rodrigues_round_trip():
    for _ in range(20):
        rvec = rng.randn(3).astype(np.float64)
        r_mat, _ = cv2.Rodrigues(rvec)
        ours = np.asarray(rot.matrix_to_rodrigues(r_mat.astype(np.float32)))
        ref, _ = cv2.Rodrigues(r_mat)
        assert np.max(np.abs(ours - ref.ravel())) < 1e-4


def test_matrix_to_rodrigues_near_pi():
    axis = np.array([1.0, 0.3, -0.5])
    axis /= np.linalg.norm(axis)
    rvec = axis * (np.pi - 1e-7)
    r_mat, _ = cv2.Rodrigues(rvec)
    ours = np.asarray(rot.matrix_to_rodrigues(r_mat.astype(np.float32)))
    back = np.asarray(rot.rodrigues_to_matrix(ours))
    assert np.max(np.abs(back - r_mat)) < 1e-3


def test_axis_rotations_match_reference_convention():
    # Reference convention (utils/geometry.py:80-113): z_rot(a) = [[c,-s,0],[s,c,0],[0,0,1]]
    a = 0.7
    z = np.asarray(rot.z_rot(np.float32(a)))
    c, s = np.cos(a), np.sin(a)
    assert np.allclose(z, [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-6)
    zc = np.asarray(rot.z_rot(np.float32(a), clockwise=True))
    assert np.allclose(zc, [[c, s, 0], [-s, c, 0], [0, 0, 1]], atol=1e-6)
    x = np.asarray(rot.x_rot(np.float32(a)))
    assert np.allclose(x, [[1, 0, 0], [0, c, -s], [0, s, c]], atol=1e-6)
    y = np.asarray(rot.y_rot(np.float32(a)))
    assert np.allclose(y, [[c, 0, s], [0, 1, 0], [-s, 0, c]], atol=1e-6)


def test_extrinsic_from_rodrigues_matches_cv2():
    rvec = rng.randn(3).astype(np.float32)
    tvec = rng.randn(3).astype(np.float32)
    ours = np.asarray(rot.extrinsic_from_rodrigues(rvec, tvec))
    ref = np.eye(4)
    ref[:3, :3], _ = cv2.Rodrigues(rvec.astype(np.float64))
    ref[:3, 3] = tvec
    assert np.max(np.abs(ours - ref)) < 1e-5


def test_delta_t_vec():
    assert np.allclose(np.asarray(rot.delta_t_vec("y", -3.0)), [0, -3, 0])
