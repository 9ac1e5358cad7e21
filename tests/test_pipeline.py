"""End-to-end pipeline integration on a synthetic scene (no CityFlow data needed).

A test car is rendered into a synthetic frame at a known pose; ground-truth projected
keypoints are injected as the perception oracle (the CAD/keypoint nets are
random-weight here), so PnP recovers the exact pose and the full geometric path —
rollout, sketch rendering, visibility, plane warping, synthesis, compositing — is
exercised meaningfully.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.projection import project_points_extrinsic
from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
from future_urban_scene_generation_tpu.ops import crop as cr
from future_urban_scene_generation_tpu.pipeline import runner, stages
from future_urban_scene_generation_tpu.render import rasterizer as rz
from future_urban_scene_generation_tpu.utils import mesh as mu

# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow

H, W = 240, 320
K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], dtype=np.float32)


@pytest.fixture(scope="module")
def scene():
    mesh, kp3d = mu.make_test_car(subdiv=2)
    cad_bank = runner.build_cad_bank([mesh] * 2, [kp3d] * 2, scale=5.0)

    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.asarray(x_rot(jnp.float32(-np.pi / 2.4)) @ z_rot(jnp.float32(0.5)))
    ext[:3, 3] = [0.0, 2.0, 18.0]

    # Synthetic "video frame": background gradient + the car's normal sketch.
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    background = np.stack([xx / W, yy / H, 0.5 * np.ones_like(xx)], -1)
    cam = rz.Camera.from_intrinsic(jnp.asarray(K))
    sketch, bg_mask = rz.render_normal_sketch(
        cad_bank.vertices[0], cad_bank.triangles[0], cad_bank.normals[0],
        jnp.asarray(ext), cam, (H, W),
    )
    frame = np.where(np.asarray(bg_mask)[..., None], background, np.asarray(sketch))

    kp3d_s = np.asarray(cad_bank.keypoints3d[0])
    kp2d = np.asarray(
        project_points_extrinsic(jnp.asarray(kp3d_s), jnp.asarray(K), jnp.asarray(ext))
    )
    ys, xs = np.nonzero(~np.asarray(bg_mask))
    bbox = np.float32([xs.min(), ys.min(), xs.max(), ys.max()])

    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=cadm.init(key, dummy),
        hourglass_params=hgm.init(key, dummy),
        icn_params=icnm.init(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=vunm.init(
            {"params": key}, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 6)),
            cov=0.0,
        ),
    )
    return dict(
        models=models, cad_bank=cad_bank, frame=frame, background=background,
        ext=ext, kp2d=kp2d, bbox=bbox,
    )


def _oracle_perception(scene_d):
    bbox = jnp.asarray(scene_d["bbox"])[None]
    window = jax.vmap(cr.square_window_from_bbox)(bbox)
    crop = jax.vmap(lambda w: cr.crop_resize(jnp.asarray(scene_d["frame"]), w, 256))(window)
    return stages.Perception(
        cad_idx=jnp.zeros(1, jnp.int32),
        kp_frame=jnp.asarray(scene_d["kp2d"])[None],
        window=window,
        crop=crop,
    )


def test_end_to_end_synthesis(scene):
    perception = _oracle_perception(scene)
    # Straight-line trajectory: 2 future steps, moving ~1.2 m per step.
    t = np.linspace(0, 2.4, 3)
    meters = np.stack([t, np.zeros_like(t)], -1)[None]  # (1, 3, 2)

    result = runner.synthesize_scene(
        scene["models"], scene["cad_bank"], jnp.asarray(scene["frame"]),
        jnp.asarray(scene["background"]), perception, jnp.asarray(np.float32(meters)),
        jnp.asarray(K),
    )
    frames_icn = np.asarray(result.frames_icn)
    frames_vunet = np.asarray(result.frames_vunet)
    assert frames_icn.shape == (3, H, W, 3)
    assert np.isfinite(frames_icn).all() and np.isfinite(frames_vunet).all()

    # PnP recovered the pose from oracle keypoints.
    assert float(result.pnp_error[0]) < 1.0, float(result.pnp_error[0])

    # Step 0: synthesized content replaces the vehicle region; background untouched.
    bg = scene["background"]
    diff0 = np.abs(frames_icn[0] - bg).sum(-1) > 0.05
    assert 0.002 < diff0.mean() < 0.5, diff0.mean()

    # The vehicle region moves across future steps (centroid shifts with trajectory).
    cys = []
    for s in range(3):
        d = np.abs(frames_icn[s] - bg).sum(-1) > 0.05
        assert d.sum() > 50, (s, d.sum())
        ys, xs = np.nonzero(d)
        cys.append((xs.mean(), ys.mean()))
    move = np.hypot(cys[2][0] - cys[0][0], cys[2][1] - cys[0][1])
    assert move > 3.0, (cys, move)

    # VUNet branch also composited (masks differ from background in the same areas).
    dv = np.abs(frames_vunet[0] - bg).sum(-1) > 0.05
    assert dv.sum() > 50


def test_fault_barrier_isolates_bad_vehicle(scene):
    """A vehicle with garbage keypoints (the reference's bare try/except skip,
    trajectory_inference.py:252-253) must contribute nothing — the composite stays
    finite and equals the single-good-vehicle composite."""
    good = _oracle_perception(scene)
    # Two vehicles: the good one + one with NaN keypoints and a degenerate bbox.
    bad_kp = jnp.full((1, 12, 2), jnp.nan)
    bad_bbox = jnp.asarray([[5.0, 5.0, 5.0, 5.0]])
    bad_window = jax.vmap(cr.square_window_from_bbox)(bad_bbox)
    bad_crop = jnp.zeros((1, 256, 256, 3))
    perception2 = stages.Perception(
        cad_idx=jnp.zeros(2, jnp.int32),
        kp_frame=jnp.concatenate([good.kp_frame, bad_kp]),
        window=jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b]), good.window, bad_window
        ),
        crop=jnp.concatenate([good.crop, bad_crop]),
    )
    t = np.linspace(0, 2.4, 3)
    meters1 = np.stack([t, np.zeros_like(t)], -1)[None]
    meters2 = np.concatenate([meters1, np.full_like(meters1, np.nan)])

    ref = runner.synthesize_scene(
        scene["models"], scene["cad_bank"], jnp.asarray(scene["frame"]),
        jnp.asarray(scene["background"]), good, jnp.asarray(np.float32(meters1)),
        jnp.asarray(K),
    )
    both = runner.synthesize_scene(
        scene["models"], scene["cad_bank"], jnp.asarray(scene["frame"]),
        jnp.asarray(scene["background"]), perception2,
        jnp.asarray(np.float32(meters2)), jnp.asarray(K),
    )
    assert np.isfinite(np.asarray(both.frames_icn)).all()
    assert np.isfinite(np.asarray(both.frames_vunet)).all()
    # atol 5e-3: catches a phantom car (order-1 pixel deltas) while tolerating the
    # batch-size-dependent float reassociation of the generator norm reductions
    # (V=2 vs V=1 vmap -> ~3e-4 output wiggle on the good vehicle).
    np.testing.assert_allclose(
        np.asarray(both.frames_icn), np.asarray(ref.frames_icn), atol=5e-3
    )


def test_staged_runner_matches_monolith(scene):
    """synthesize_scene_staged (two jits, ROADMAP #3) equals the fused program."""
    perception = _oracle_perception(scene)
    t = np.linspace(0, 2.4, 3)
    meters = jnp.asarray(np.float32(np.stack([t, np.zeros_like(t)], -1)[None]))
    args = (
        scene["models"], scene["cad_bank"], jnp.asarray(scene["frame"]),
        jnp.asarray(scene["background"]), perception, meters, jnp.asarray(K),
    )
    fused = runner.synthesize_scene(*args)
    staged = runner.synthesize_scene_staged(*args)
    # atol 1e-3: the stage boundary materializes f32 intermediates the fused
    # program keeps inside fusions — reassociation wiggles a handful of pixels
    # by ~1e-4.
    np.testing.assert_allclose(
        np.asarray(staged.frames_icn), np.asarray(fused.frames_icn), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(staged.frames_vunet), np.asarray(fused.frames_vunet), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(staged.pnp_error), np.asarray(fused.pnp_error), rtol=1e-5
    )
