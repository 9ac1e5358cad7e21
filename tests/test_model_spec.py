"""configure_models() after a compiled scene run must retrace, never silently
no-op (MODEL_SPEC is read at trace time; several knobs don't change avals).

Pins the spec_key() static-argument plumbing in pipeline/runner.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from future_urban_scene_generation_tpu.geometry.projection import (
    project_points_extrinsic,
)
from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
from future_urban_scene_generation_tpu.ops import crop as cr
from future_urban_scene_generation_tpu.pipeline import runner, stages
from future_urban_scene_generation_tpu.pipeline.stages import configure_models
from future_urban_scene_generation_tpu.utils import mesh as mu

# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow


@pytest.fixture
def tiny_scene():
    H, W = 180, 320
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    mesh, kp3d = mu.make_test_car(subdiv=1)
    cad_bank = runner.build_cad_bank([mesh], [kp3d], scale=5.0)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.asarray(x_rot(jnp.float32(-np.pi / 2.4)) @ z_rot(jnp.float32(0.4)))
    ext[:3, 3] = [0.0, 2.0, 25.0]
    kp2d = np.asarray(
        project_points_extrinsic(cad_bank.keypoints3d[0], jnp.asarray(K), jnp.asarray(ext))
    )
    x0, y0 = kp2d.min(0)
    x1, y1 = kp2d.max(0)
    bbox = jnp.asarray([[x0 - 2, y0 - 2, x1 + 2, y1 + 2]], jnp.float32)
    window = jax.vmap(cr.square_window_from_bbox)(bbox)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    crops = jax.vmap(lambda w: cr.crop_resize(frame, w, 256))(window)
    perception = stages.Perception(
        cad_idx=jnp.zeros(1, jnp.int32),
        kp_frame=jnp.asarray(kp2d[None], jnp.float32),
        window=window,
        crop=crops,
    )
    meters = jnp.asarray(
        np.stack([np.linspace(0, 2.0, 3), np.zeros(3)], -1)[None], jnp.float32
    )
    key = jax.random.PRNGKey(0)
    _, _, icnm, vunm = stages.Models.modules()
    models = stages.Models(
        cad_params={},  # perception is oracle-injected; cad/hourglass unused
        hourglass_params={},
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init(
                {"params": k},
                jnp.zeros((1, 256, 256, 3)),
                jnp.zeros((1, 256, 256, 6)),
                cov=0.0,
            )
        )(key),
    )
    return models, cad_bank, frame, perception, meters, jnp.asarray(K)


def test_configure_models_retraces_compiled_scene(tiny_scene):
    models, cad_bank, frame, perception, meters, K = tiny_scene
    old_spec = dict(stages.MODEL_SPEC)
    try:
        configure_models(warp_plane_res=256, generator_dtype="float32")
        r256 = runner.synthesize_scene(
            models, cad_bank, frame, frame, perception, meters, K
        )
        n256 = runner._synthesize_scene_impl._cache_size()

        # Toggle a knob that does NOT change any aval: without the spec static
        # argument this silently reused the compiled 256-res program.
        configure_models(warp_plane_res=64)
        r64 = runner.synthesize_scene(
            models, cad_bank, frame, frame, perception, meters, K
        )
        n64 = runner._synthesize_scene_impl._cache_size()
        assert n64 == n256 + 1, "warp_plane_res change must retrace the scene jit"

        # The two programs genuinely differ (different warp sampling grid).
        a = np.asarray(r256.frames_icn)
        b = np.asarray(r64.frames_icn)
        assert a.shape == b.shape
        assert not np.allclose(a, b)

        # bf16 toggle equally must retrace.
        configure_models(generator_dtype="bfloat16")
        runner.synthesize_scene(
            models, cad_bank, frame, frame, perception, meters, K
        )
        assert runner._synthesize_scene_impl._cache_size() == n64 + 1
    finally:
        stages.MODEL_SPEC.update(old_spec)


def test_spec_key_hashable_and_sensitive():
    old = dict(stages.MODEL_SPEC)
    try:
        k0 = stages.spec_key()
        hash(k0)
        configure_models(warp_plane_res=99)
        assert stages.spec_key() != k0
    finally:
        stages.MODEL_SPEC.update(old)
