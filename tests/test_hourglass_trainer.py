"""Hourglass + CAD-classifier trainers: steps run, losses descend, BN stats update."""
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops.heatmap import heatmaps_from_kpoints
import pytest

from future_urban_scene_generation_tpu.pipeline.training import (
    CadClassifierTrainer,
    HourglassTrainer,
)


# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow


def test_hourglass_train_step_and_bn_stats():
    trainer = HourglassTrainer(lr=1e-3)
    key = jax.random.PRNGKey(0)
    params, opt_state = trainer.init(key, hw=(64, 64))

    images = jax.random.uniform(key, (2, 64, 64, 3))
    kps = jax.random.uniform(key, (12, 2)) * 0.8 + 0.1
    target = heatmaps_from_kpoints(kps, (16, 16), sigma=1.5)[None]
    target = jnp.broadcast_to(target, (2, 16, 16, 12))

    rm0 = np.asarray(params["bn1"]["running_mean"]).copy()
    losses = []
    step = jax.jit(trainer.train_step)
    for _ in range(4):
        params, opt_state, metrics = step(params, opt_state, images, target)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # Running stats moved toward the batch statistics.
    rm1 = np.asarray(params["bn1"]["running_mean"])
    assert not np.allclose(rm0, rm1)
    # Eval-mode forward consumes the updated running stats without bn_stats.
    out = trainer.eval_model.apply({"params": params}, images)
    assert out["heatmaps"][-1].shape == (2, 16, 16, 12)


def test_cad_classifier_train_step():
    trainer = CadClassifierTrainer(num_classes=4, lr=1e-3)
    key = jax.random.PRNGKey(1)
    params, opt_state = trainer.init(key, hw=(64, 64))
    images = jax.random.uniform(key, (2, 64, 64, 3))
    labels = jnp.asarray([1, 3])
    step = jax.jit(trainer.train_step)
    losses = []
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, images, labels)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
