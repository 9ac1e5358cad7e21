"""Synthetic training-pair generation feeds the trainers end-to-end."""
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.pipeline import datagen, runner
from future_urban_scene_generation_tpu.utils import mesh as mu
import pytest

# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow

K = jnp.asarray([[600.0, 0, 320], [0, 600.0, 180], [0, 0, 1]])
FRAME_HW = (360, 640)


def _bank():
    mesh, kp3d = mu.make_test_car(subdiv=1)
    return runner.build_cad_bank([mesh] * 2, [kp3d] * 2, scale=5.0)


def test_icn_batch_shapes_and_ranges():
    frame = jnp.asarray(np.random.RandomState(0).rand(*FRAME_HW, 3).astype(np.float32))
    sample = datagen.icn_batch(
        jax.random.PRNGKey(0), _bank(), frame, K, batch=2, frame_hw=FRAME_HW,
        vis_res=128,
    )
    assert sample.inputs.shape == (2, 256, 256, 21)
    assert sample.targets.shape == (2, 256, 256, 3)
    assert np.isfinite(np.asarray(sample.inputs)).all()
    assert float(jnp.abs(sample.inputs).max()) <= 1.0 + 1e-4
    # Distinct keys give distinct poses.
    s2 = datagen.icn_batch(
        jax.random.PRNGKey(1), _bank(), frame, K, batch=2, frame_hw=FRAME_HW,
        vis_res=128,
    )
    assert not np.allclose(np.asarray(sample.inputs), np.asarray(s2.inputs))


def test_vunet_batch_shapes():
    frame = jnp.asarray(np.random.RandomState(1).rand(*FRAME_HW, 3).astype(np.float32))
    s = datagen.vunet_batch(
        jax.random.PRNGKey(0), _bank(), frame, K, batch=2, frame_hw=FRAME_HW,
        vis_res=128,
    )
    assert s.y_tilde.shape == (2, 256, 256, 3)
    assert s.x_app.shape == (2, 256, 256, 6)
    assert s.target.shape == (2, 256, 256, 3)


def test_cad_batch_is_learnable():
    """datagen.cad_batch: shape-dependent sketches labeled by bank index —
    different labels must come with DIFFERENT images (the earlier random-label
    data made cad training sit at ln(10) by construction)."""
    # Geometrically distinct entries (mirrors cli/train._variant_cad_bank).
    meshes = [mu.make_test_car(length=1.0 + 0.3 * i, subdiv=1) for i in range(3)]
    bank = runner.build_cad_bank([m for m, _ in meshes], [k for _, k in meshes],
                                 scale=5.0)
    s = datagen.cad_batch(jax.random.PRNGKey(0), bank, K, batch=6)
    assert s.images.shape == (6, 256, 256, 3)
    assert s.labels.shape == (6,) and s.labels.dtype == jnp.int32
    assert np.asarray(s.labels).min() >= 0
    assert np.asarray(s.labels).max() < 3
    imgs = np.asarray(s.images)
    assert np.isfinite(imgs).all() and imgs.max() <= 1.0 + 1e-5
    # Sketches must carry signal (a rendered vehicle, not a blank frame).
    assert (imgs.reshape(6, -1).max(1) > 0.1).all()


def test_hourglass_batch_keypoints_on_sketch():
    """datagen.hourglass_batch: projected keypoints land in [0,1] crop coords
    and the sketch actually covers the keypoint locations (coarse check: the
    keypoint cell neighborhood is non-background for most keypoints)."""
    mesh, kp3d = mu.make_test_car(subdiv=1)
    bank = runner.build_cad_bank([mesh], [kp3d], scale=5.0)
    s = datagen.hourglass_batch(jax.random.PRNGKey(3), bank, K, batch=3)
    assert s.images.shape == (3, 256, 256, 3)
    assert s.kp_norm.shape == (3, 12, 2)
    kp = np.asarray(s.kp_norm)
    assert (kp >= 0).all() and (kp <= 1).all()
    imgs = np.asarray(s.images)
    hits = 0
    for b in range(3):
        for j in range(12):
            x, y = (kp[b, j] * 255).astype(int)
            y0, y1 = max(y - 6, 0), min(y + 7, 256)
            x0, x1 = max(x - 6, 0), min(x + 7, 256)
            hits += imgs[b, y0:y1, x0:x1].max() > 0.05
    assert hits >= 3 * 12 * 0.7  # most keypoints sit on rendered geometry


def test_edgeconnect_batch_and_train_step():
    from future_urban_scene_generation_tpu.pipeline.training import EdgeModelTrainer

    imgs = jnp.asarray(np.random.RandomState(2).rand(2, 64, 64, 3).astype(np.float32))
    gray, edges, masks = datagen.edgeconnect_batch(jax.random.PRNGKey(0), imgs, sigma=1.0)
    assert gray.shape == (2, 64, 64, 1)
    assert edges.shape == (2, 64, 64, 1)
    assert masks.shape == (2, 64, 64, 1)
    assert set(np.unique(np.asarray(masks))).issubset({0.0, 1.0})

    trainer = EdgeModelTrainer(lr=1e-4)
    state = trainer.init(jax.random.PRNGKey(1), hw=(64, 64))
    state, metrics = jax.jit(trainer.train_step)(state, gray, edges, masks)
    assert all(np.isfinite(float(v)) for v in metrics.values())
