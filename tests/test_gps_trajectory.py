"""GPS conversion and future-pose rollout behavior."""
import numpy as np
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry import gps
from future_urban_scene_generation_tpu.geometry import trajectory as traj
from future_urban_scene_generation_tpu.geometry.rotations import z_rot


def test_geodesic_known_distance():
    # 1 degree of latitude ~ 111.19 km with R = 6371 km.
    d = float(gps.geodesic_distance(np.array([45.0, 11.0]), np.array([46.0, 11.0])))
    assert abs(d - 111194.9) < 50.0


def test_pixels_to_gps_identity_homography():
    pts = np.random.RandomState(0).rand(5, 2) * 100
    out = gps.pixels_to_gps(pts, np.eye(3))
    assert np.allclose(out, pts, atol=1e-9)


def test_gps_to_meters_scaling():
    # Straight-line GPS track -> straight metric track with haversine-consistent length.
    lat0, lon0 = 45.0, 11.0
    t = np.linspace(0, 1, 6)
    gps_track = np.stack([lat0 + t * 1e-4, lon0 + t * 2e-4], 1)
    m = gps.gps_to_meters(gps_track)  # host float64 path
    assert np.allclose(m[0], [0, 0], atol=1e-6)
    seg = np.diff(m, axis=0)
    lens = np.linalg.norm(seg, axis=1)
    assert np.allclose(lens, lens[0], rtol=1e-3)  # uniform speed preserved
    total = float(gps.geodesic_distance(gps_track[0], gps_track[-1]))
    assert abs(np.sum(lens) - total) / total < 0.02


def test_rollout_straight_line():
    # Vehicle moving straight: theta ~ 0, translation = (0, -d, 0) per step.
    coords = np.stack([np.linspace(0, 10, 6), np.zeros(6)], 1)
    r = traj.rollout_from_meters(jnp.asarray(coords))
    assert np.allclose(np.asarray(r.theta), 0.0, atol=1e-6)
    d = np.asarray(r.distance)
    assert np.allclose(d, np.linspace(2, 10, 5), atol=1e-5)
    tr = np.asarray(r.translation)
    assert np.allclose(tr[:, 0], 0.0, atol=1e-5)
    assert np.allclose(tr[:, 1], -d, atol=1e-5)


def test_rollout_jitter_clamp():
    # A sharp-zigzag track triggers the ±20° clamp: translation falls back to the
    # unrotated -y direction while theta itself stays unclamped.
    coords = np.float32(
        [[0, 0], [2, 1.5], [4, -1.5], [6, 1.5], [8, -1.5], [10, 1.5]]
    )
    r = traj.rollout_from_meters(jnp.asarray(coords))
    tr = np.asarray(r.translation)
    d = np.asarray(r.distance)
    # Interior steps (n = 2, 3 in reference indexing) with >20° neighbor-heading
    # jumps use z_rot(0); n = 4 is a boundary step that tests theta itself instead
    # (trajectory_inference.py:281-298).
    for s in (1, 2):  # n = 2, 3
        expected = np.asarray(jnp.asarray([0.0, -d[s], 0.0]) @ z_rot(jnp.float32(0.0)))
        assert np.allclose(tr[s], expected, atol=1e-5), (s, tr[s], expected)


def test_rollout_curved_smooth():
    # Gentle arc: headings within 20°, translations follow the rotated direction.
    angles = np.linspace(0, np.pi / 12, 6)
    coords = np.stack([np.sin(angles) * 30, (1 - np.cos(angles)) * 30], 1)
    r = traj.rollout_from_meters(jnp.asarray(coords))
    tr = np.asarray(r.translation)
    theta = np.asarray(r.theta)
    d = np.asarray(r.distance)
    for s in range(5):
        expected = np.asarray(jnp.asarray([0.0, -d[s], 0.0]) @ z_rot(jnp.float32(theta[s])))
        assert np.allclose(tr[s], expected, atol=1e-4)


def test_transform_points_matches_reference_form():
    pts = np.random.RandomState(1).randn(12, 3).astype(np.float32)
    theta = 0.3
    tr = np.float32([1.0, -2.0, 0.5])
    ours = np.asarray(traj.transform_points(jnp.asarray(pts), jnp.float32(theta), jnp.asarray(tr)))
    ref = pts @ np.asarray(z_rot(jnp.float32(theta))) + tr
    assert np.allclose(ours, ref, atol=1e-5)
