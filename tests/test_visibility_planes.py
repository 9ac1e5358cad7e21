"""Plane visibility (painter's algorithm) and plane warping behavior."""
import numpy as np
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
from future_urban_scene_generation_tpu.geometry import projection as proj
from future_urban_scene_generation_tpu.render import planes as pl
from future_urban_scene_generation_tpu.render import visibility as vis
from future_urban_scene_generation_tpu.utils import mesh as mesh_utils
from future_urban_scene_generation_tpu.utils.keypoints import KEYPOINT_NAMES

rng = np.random.RandomState(15)

K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]], dtype=np.float32)


def _car_pose(yaw=0.6):
    _, kp3d = mesh_utils.make_test_car()
    kp3d = kp3d * 5.0
    r_wc = np.asarray(x_rot(jnp.float32(-np.pi / 2.5)) @ z_rot(jnp.float32(yaw)))
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = r_wc
    ext[:3, 3] = [0, 0.5, 14.0]
    kp2d = np.asarray(proj.project_points_extrinsic(jnp.asarray(kp3d, jnp.float32), jnp.asarray(K), jnp.asarray(ext)))
    return kp3d, kp2d, ext


def test_plane_indices_match_keypoint_schema():
    # Spot-check the topology against the reference's name lists
    # (online_visibility.py:9-25).
    names = KEYPOINT_NAMES
    left = [names[i] for i in vis.TEXTURE_PLANES[0][:6]]
    assert left == [
        "left_back_trunk", "left_back_wheel", "left_front_wheel",
        "left_front_light", "upper_left_windshield", "upper_left_rearwindow",
    ]
    roof = [names[i] for i in vis.TEXTURE_PLANES[2][:4]]
    assert roof == [
        "upper_left_rearwindow", "upper_left_windshield",
        "upper_right_windshield", "upper_right_rearwindow",
    ]
    front_bt = [names[i] for i in vis.OCCLUSION_PLANES[0][:4]]
    assert front_bt == [
        "left_front_light", "right_front_light",
        "right_front_wheel", "left_front_wheel",
    ]


def test_visibility_left_vs_right():
    # Camera sees the car's left-front: left plane visible, right occluded.
    kp3d, kp2d, ext = _car_pose(yaw=0.6)
    v = np.asarray(
        vis.compute_visibility(jnp.asarray(ext), jnp.asarray(kp2d, jnp.float32), jnp.asarray(kp3d, jnp.float32), (480, 640))
    )
    vis_map = dict(zip(vis.PLANE_NAMES, v[:5]))
    assert vis_map["left"] and not vis_map["right"], vis_map


def test_get_planes_masks():
    frame = jnp.asarray(rng.rand(120, 160, 3).astype(np.float32))
    kp2d = rng.rand(12, 2).astype(np.float32) * [150, 110] + 5
    planes, polys = pl.get_planes(frame, jnp.asarray(kp2d))
    planes = np.asarray(planes)
    assert planes.shape == (5, 120, 160, 3)
    assert polys.shape == (5, 6, 2)
    # Each plane is the frame masked by a polygon: nonzero pixels subset of frame.
    for p in range(5):
        nz = planes[p].sum(-1) > 0
        assert 0 < nz.sum() < 120 * 160
        assert np.allclose(planes[p][nz], np.asarray(frame)[nz])


def test_warp_identity():
    frame = jnp.asarray(rng.rand(96, 96, 3).astype(np.float32))
    kp2d = jnp.asarray(rng.rand(12, 2).astype(np.float32) * 80 + 8)
    planes, polys = pl.get_planes(frame, kp2d)
    vis_all = jnp.ones(5, bool)
    warped, unwarped = pl.warp_unwarp_planes(planes, polys, polys, vis_all, vis_all)
    # src == dst keypoints -> identity homography -> warped ~ src planes.
    err = np.abs(np.asarray(warped) - np.asarray(planes)).mean()
    assert err < 0.02, err


def test_warp_symmetry_substitution():
    frame = jnp.asarray(rng.rand(96, 96, 3).astype(np.float32))
    kp2d = jnp.asarray(rng.rand(12, 2).astype(np.float32) * 80 + 8)
    planes, polys = pl.get_planes(frame, kp2d)
    src_vis = jnp.asarray([True, False, True, True, True])
    dst_vis = jnp.asarray([False, True, True, True, True])  # left invisible in dst
    warped, _ = pl.warp_unwarp_planes(planes, polys, polys, src_vis, dst_vis)
    warped = np.asarray(warped)
    # Left (src-visible) is warped into the RIGHT slot (dst left invisible).
    assert warped[1].sum() > 0
    assert warped[0].sum() == 0  # left slot untouched


def test_warp_skips_invisible():
    frame = jnp.asarray(rng.rand(96, 96, 3).astype(np.float32))
    kp2d = jnp.asarray(rng.rand(12, 2).astype(np.float32) * 80 + 8)
    planes, polys = pl.get_planes(frame, kp2d)
    src_vis = jnp.zeros(5, bool)
    dst_vis = jnp.ones(5, bool)
    warped, unwarped = pl.warp_unwarp_planes(planes, polys, polys, src_vis, dst_vis)
    assert np.asarray(warped).sum() == 0
    assert np.asarray(unwarped).sum() == 0


def test_visibility_scale_invariance():
    """The painter's-area visibility flags at vis_scale=0.5 match full
    resolution across a pose sweep — pins the serving/bench config (bench.py runs
    vis_scale=0.5; the 0.9-area rule is a ratio, so grid resolution only moves
    boundary-degenerate cases — measured: 62/63 at 0.5, 58/63 at 0.25, so 0.25
    is NOT used for serving)."""
    import jax

    _, kp3d = mesh_utils.make_test_car()
    kp3d = (kp3d * 5.0).astype(np.float32)
    full_hw = (480, 640)
    half_hw = (240, 320)
    agree, total = 0, 0
    for yaw in (0.3, 0.9, 1.5, 2.1, 2.8, 3.6, 4.3, 5.1, 5.8):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.asarray(x_rot(jnp.float32(-np.pi / 2.5)) @ z_rot(jnp.float32(yaw)))
        ext[:3, 3] = [0, 0.5, 14.0]
        kp2d = np.asarray(
            proj.project_points_extrinsic(
                jnp.asarray(kp3d), jnp.asarray(K), jnp.asarray(ext)
            )
        )
        v_full = np.asarray(
            vis.compute_visibility(jnp.asarray(ext), jnp.asarray(kp2d),
                                   jnp.asarray(kp3d), full_hw)
        )
        v_half = np.asarray(
            vis.compute_visibility(jnp.asarray(ext), jnp.asarray(kp2d) * 0.5,
                                   jnp.asarray(kp3d), half_hw)
        )
        agree += int((v_full == v_half).sum())
        total += len(v_full)
    # Demand near-total agreement (boundary-degenerate poses may flip one flag).
    assert agree >= total - 1, (agree, total)
