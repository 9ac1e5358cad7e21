"""Homography DLT vs cv2.findHomography, and the perspective warp vs cv2."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry import homography as hg
from future_urban_scene_generation_tpu.ops import warp as wp

rng = np.random.RandomState(6)


def _apply_h(h_mat, pts):
    ones = np.ones((pts.shape[0], 1))
    p = np.concatenate([pts, ones], 1) @ h_mat.T
    return p[:, :2] / p[:, 2:3]


def test_exact_4point():
    h_true = np.array([[1.1, 0.05, 10], [-0.03, 0.95, -5], [1e-4, -2e-4, 1.0]])
    src = rng.uniform(20, 230, (4, 2))
    dst = _apply_h(h_true, src)
    h_est, valid = hg.find_homography(jnp.asarray(src), jnp.asarray(dst))
    assert bool(valid)
    # Transfer error on held-out points.
    test_pts = rng.uniform(20, 230, (20, 2))
    err = np.abs(_apply_h(np.asarray(h_est), test_pts) - _apply_h(h_true, test_pts))
    assert err.max() < 0.5


def test_overdetermined_6point_matches_cv2():
    # Nearly-coplanar 6-point correspondences like the car side planes.
    h_true = np.array([[0.9, 0.1, 30], [0.05, 1.05, -12], [2e-4, 1e-4, 1.0]])
    src = rng.uniform(10, 240, (6, 2))
    dst = _apply_h(h_true, src) + rng.randn(6, 2) * 0.8  # noise -> least squares
    h_cv, _ = cv2.findHomography(src, dst)
    h_est, valid = hg.find_homography(jnp.asarray(src), jnp.asarray(dst))
    assert bool(valid)
    err_ours = np.mean((_apply_h(np.asarray(h_est), src) - dst) ** 2)
    err_cv = np.mean((_apply_h(h_cv, src) - dst) ** 2)
    assert err_ours < err_cv * 1.5 + 1e-3, (err_ours, err_cv)


def test_degenerate_collinear():
    src = np.stack([np.linspace(0, 100, 4), np.linspace(0, 50, 4)], 1)  # collinear
    dst = src * 1.5
    _, valid = hg.find_homography(jnp.asarray(src), jnp.asarray(dst))
    assert not bool(valid)


def test_degenerate_repeated_points():
    src = np.float32([[10, 10], [10, 10], [10, 10], [10, 10]])
    dst = src.copy()
    _, valid = hg.find_homography(jnp.asarray(src), jnp.asarray(dst))
    assert not bool(valid)


def test_warp_perspective_matches_cv2():
    img = rng.rand(120, 160, 3).astype(np.float32)
    h_mat = np.array([[1.05, 0.08, 5.0], [-0.04, 0.97, 3.0], [1e-4, -5e-5, 1.0]], np.float32)
    ours = np.asarray(wp.warp_perspective(jnp.asarray(img), jnp.asarray(h_mat), (120, 160)))
    ref = cv2.warpPerspective(img, h_mat, (160, 120))
    # Interior agreement (borders may differ by the sampling of partially-out pixels).
    d = np.abs(ours - ref)
    assert np.percentile(d, 99.5) < 1e-3, np.percentile(d, 99.5)
    assert d.mean() < 1e-4


def test_warp_round_trip():
    img = np.zeros((100, 100, 3), np.float32)
    img[30:70, 30:70] = 1.0
    h_mat = np.array([[1.2, 0.1, -8.0], [0.05, 1.1, 4.0], [2e-4, 1e-4, 1.0]], np.float32)
    fwd = wp.warp_perspective(jnp.asarray(img), jnp.asarray(h_mat), (100, 100))
    back = np.asarray(
        wp.warp_perspective(fwd, jnp.asarray(np.linalg.inv(h_mat)), (100, 100))
    )
    inner = np.s_[35:65, 35:65]
    assert np.abs(back[inner] - img[inner]).mean() < 0.05


def test_warp_affine_resample_matches_crop_resize():
    img = rng.rand(90, 130, 3).astype(np.float32)
    # A fully-interior square window: behaves exactly like crop + cv2.resize.
    x0, y0, side = 20, 10, 64
    ours = np.asarray(
        wp.warp_affine_resample(
            jnp.asarray(img),
            jnp.asarray([x0 + side / 2.0, y0 + side / 2.0], jnp.float32),
            jnp.float32(side),
            256,
        )
    )
    ref = cv2.resize(img[y0 : y0 + side, x0 : x0 + side], (256, 256), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 1e-4


def test_quad_closed_form_matches_dlt():
    """find_homography_quad equals the 4-point DLT solution on generic quads
    (both interpolate the same 4 correspondences exactly)."""
    h_true = np.array([[1.2, 0.1, 15], [-0.05, 0.9, 8], [2e-4, -1e-4, 1.0]])
    src = rng.uniform(20, 230, (4, 2)).astype(np.float32)
    dst = _apply_h(h_true, src).astype(np.float32)
    h_q, valid = hg.find_homography_quad(jnp.asarray(src), jnp.asarray(dst))
    assert bool(valid)
    test_pts = rng.uniform(20, 230, (20, 2))
    err = np.abs(_apply_h(np.asarray(h_q), test_pts) - _apply_h(h_true, test_pts))
    assert err.max() < 0.5


def test_quad_closed_form_sliver_accuracy():
    """The closed form stays at the f32 floor on sliver quads where the f32
    DLT eigensolve carries multi-pixel transfer error (the plane-warp
    front/back planes near edge-on — the motivating case)."""
    src = np.trunc(
        np.array([[50, 50], [150, 52], [150, 53], [50, 51]], np.float32)
    )
    dst = np.trunc(
        np.array([[60, 80], [160, 83], [160, 84.2], [60, 81.2]], np.float32)
    )
    h_q, valid = hg.find_homography_quad(jnp.asarray(src), jnp.asarray(dst))
    assert bool(valid)
    p = np.concatenate([src, np.ones((4, 1))], 1) @ np.asarray(h_q, np.float64).T
    pred = p[:, :2] / p[:, 2:3]
    assert np.abs(pred - dst).max() < 1e-2  # 1-px-thick quad, f32-floor transfer


def test_quad_closed_form_degenerate():
    """Degenerate quads (collinear, 3-collinear, repeated corner) flag invalid —
    the configurations where cv2.findHomography returns None and the reference
    skips the plane."""
    good = np.array([[10, 10], [90, 15], [95, 85], [12, 80]], np.float32)
    for bad in (
        np.array([[0, 0], [50, 50], [100, 100], [150, 150]], np.float32),
        np.array([[0, 0], [50, 50], [100, 100], [10, 90]], np.float32),
        np.array([[10, 10], [90, 15], [90, 15], [12, 80]], np.float32),
    ):
        _, v1 = hg.find_homography_quad(jnp.asarray(bad), jnp.asarray(good))
        _, v2 = hg.find_homography_quad(jnp.asarray(good), jnp.asarray(bad))
        assert not bool(v1) and not bool(v2)
    _, v = hg.find_homography_quad(jnp.asarray(good), jnp.asarray(good) * 1.5)
    assert bool(v)
