"""PnP solver: exact-data recovery, cv2.solvePnP cross-check, vmap over vehicles."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry import pnp
from future_urban_scene_generation_tpu.geometry import projection as proj
from future_urban_scene_generation_tpu.geometry import rotations as rot

rng = np.random.RandomState(5)

K = np.array([[1200.0, 0, 640], [0, 1200.0, 360], [0, 0, 1]], dtype=np.float32)
FOCALS = np.array([1200.0, 1200.0], dtype=np.float32)
CENTERS = np.array([640.0, 360.0], dtype=np.float32)


def _car_like_points():
    # 12 points roughly shaped like a car keypoint cloud (meters, vehicle frame).
    pts = np.array(
        [
            [-2.2, -0.8, 0.3], [-1.8, -0.8, -0.3], [2.0, -0.8, 0.4], [1.6, -0.8, -0.3],
            [-2.2, 0.8, 0.3], [-1.8, 0.8, -0.3], [2.0, 0.8, 0.4], [1.6, 0.8, -0.3],
            [-1.0, -0.7, 0.9], [0.7, -0.7, 0.9], [-1.0, 0.7, 0.9], [0.7, 0.7, 0.9],
        ],
        dtype=np.float32,
    )
    return pts


def _random_pose():
    # A plausible camera-facing vehicle pose: moderate rotation, z ~ 8-25 m.
    rvec = pnp.CANONICAL_RVECS[0] + rng.randn(3).astype(np.float32) * 0.15
    tvec = np.array([rng.uniform(-2, 2), rng.uniform(-1, 1), rng.uniform(8, 25)], np.float32)
    return np.asarray(rvec), tvec


def test_recovers_exact_pose():
    pts3d = _car_like_points()
    for _ in range(3):
        rvec, tvec = _random_pose()
        kp2d = np.asarray(proj.project_points_rodrigues(pts3d, rvec, tvec, K))
        err, r_est, t_est = jax.jit(pnp.solve_pnp_4restarts)(
            jnp.asarray(pts3d), jnp.asarray(kp2d), jnp.asarray(FOCALS), jnp.asarray(CENTERS)
        )
        # Pose-level agreement: reprojection of the estimate matches observations.
        reproj = np.asarray(proj.project_points_rodrigues(pts3d, np.asarray(r_est), np.asarray(t_est), K))
        assert float(err) < 1.0, float(err)
        assert np.max(np.abs(reproj - kp2d)) < 1.5


def test_matches_cv2_solvepnp_quality():
    pts3d = _car_like_points()
    rvec, tvec = _random_pose()
    kp2d = np.asarray(proj.project_points_rodrigues(pts3d, rvec, tvec, K))
    kp2d_noisy = kp2d + rng.randn(*kp2d.shape).astype(np.float32) * 1.0

    err, r_est, t_est = pnp.solve_pnp_4restarts(
        jnp.asarray(pts3d), jnp.asarray(kp2d_noisy), jnp.asarray(FOCALS), jnp.asarray(CENTERS)
    )
    ok, r_cv, t_cv = cv2.solvePnP(
        pts3d.astype(np.float64), kp2d_noisy.astype(np.float64), K.astype(np.float64),
        np.zeros(5), flags=cv2.SOLVEPNP_ITERATIVE,
    )
    assert ok
    reproj_ours = np.asarray(
        proj.project_points_rodrigues(pts3d, np.asarray(r_est), np.asarray(t_est), K)
    )
    reproj_cv, _ = cv2.projectPoints(pts3d.astype(np.float64), r_cv, t_cv, K.astype(np.float64), np.zeros(5))
    mse_ours = np.mean((reproj_ours - kp2d_noisy) ** 2)
    mse_cv = np.mean((reproj_cv.squeeze(1) - kp2d_noisy) ** 2)
    # Our solver should be competitive with cv2's iterative PnP on noisy data.
    assert mse_ours < mse_cv * 2.0 + 1.0, (mse_ours, mse_cv)


def test_z_sign_fix():
    # The solver must always return a pose with positive z (vehicle in front of camera).
    pts3d = _car_like_points()
    rvec, tvec = _random_pose()
    kp2d = np.asarray(proj.project_points_rodrigues(pts3d, rvec, tvec, K))
    _, _, t_est = pnp.solve_pnp_4restarts(
        jnp.asarray(pts3d), jnp.asarray(kp2d), jnp.asarray(FOCALS), jnp.asarray(CENTERS)
    )
    assert float(t_est[2]) > 0.0


def test_vmap_over_vehicles():
    pts3d = _car_like_points()
    kp2ds = []
    for _ in range(3):
        rvec, tvec = _random_pose()
        kp2ds.append(np.asarray(proj.project_points_rodrigues(pts3d, rvec, tvec, K)))
    kp2ds = np.stack(kp2ds)
    batched = jax.vmap(
        lambda kp: pnp.solve_pnp_4restarts(
            jnp.asarray(pts3d), kp, jnp.asarray(FOCALS), jnp.asarray(CENTERS)
        )
    )
    errs, rvecs, tvecs = batched(jnp.asarray(kp2ds))
    assert errs.shape == (3,) and rvecs.shape == (3, 3) and tvecs.shape == (3, 3)
    assert np.all(np.asarray(errs) < 1.0)
