"""Mesh/sharding on the virtual 8-device CPU mesh + training-step behavior."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from future_urban_scene_generation_tpu.parallel import mesh as pmesh
import pytest

from future_urban_scene_generation_tpu.pipeline.training import (
    EdgeModelTrainer,
    ICNTrainer,
)


# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow


def test_make_mesh_shapes():
    m = pmesh.make_mesh(data=4, model=2)
    assert m.shape == {"data": 4, "model": 2}
    m2 = pmesh.make_mesh(model=2)
    assert m2.shape == {"data": 4, "model": 2}
    m3 = pmesh.make_mesh(data=2, model=2, context=2)
    assert m3.shape == {"data": 2, "model": 2, "context": 2}


def test_param_shardings_rules():
    m = pmesh.make_mesh(data=4, model=2)
    params = {
        "conv": {"kernel": jnp.zeros((3, 3, 16, 64)), "bias": jnp.zeros(64)},
        "odd": {"kernel": jnp.zeros((3, 3, 4, 7))},  # 7 not divisible -> replicated
    }
    sh = pmesh.param_shardings(params, m)
    assert sh["conv"]["kernel"].spec == P(None, None, None, "model")
    assert sh["conv"]["bias"].spec == P("model")
    assert sh["odd"]["kernel"].spec == P()


def test_icn_train_step_runs_and_descends():
    trainer = ICNTrainer(input_nc=5, ndf=8, lr=1e-3)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 32, 32, 5))
    y = jax.random.uniform(key, (2, 32, 32, 3))
    state = trainer.init(key, x[:1], y[:1])
    step = jax.jit(trainer.train_step)
    metrics_hist = []
    for _ in range(5):
        state, metrics = step(state, x, y)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    assert int(state.iteration) == 5
    assert all(np.isfinite(list(m.values())).all() for m in metrics_hist)
    # L1 reconstruction improves over a few steps on a fixed batch.
    assert metrics_hist[-1]["l_l1"] < metrics_hist[0]["l_l1"]


def test_icn_train_step_sharded_dp_tp():
    m = pmesh.make_mesh(data=4, model=2)
    trainer = ICNTrainer(input_nc=5, ndf=8, lr=1e-3)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (8, 32, 32, 5))
    y = jax.random.uniform(key, (8, 32, 32, 3))
    state = trainer.init(key, x[:1], y[:1])

    sh = pmesh.param_shardings(
        (state.gen_params, state.dis_params, state.gen_opt_state, state.dis_opt_state), m
    )
    state = jax.device_put(
        state,
        type(state)(sh[0], sh[1], sh[2], sh[3], pmesh.replicated(m)),
    )
    x = jax.device_put(x, pmesh.batch_sharding(m))
    y = jax.device_put(y, pmesh.batch_sharding(m))

    state2, metrics = jax.jit(trainer.train_step)(state, x, y)
    assert np.isfinite(float(metrics["l_g"]))

    # Sharded result matches the unsharded step (same math, distributed execution).
    state_r = jax.device_put(state, jax.tree.map(lambda _: pmesh.replicated(m), state))
    _, metrics_r = jax.jit(trainer.train_step)(state_r, x, y)
    assert abs(float(metrics["l_g"]) - float(metrics_r["l_g"])) < 1e-3


def test_edge_trainer_smoke():
    trainer = EdgeModelTrainer(lr=1e-4)
    key = jax.random.PRNGKey(1)
    state = trainer.init(key, hw=(64, 64))
    gray = jax.random.uniform(key, (1, 64, 64, 1))
    edges = (jax.random.uniform(key, (1, 64, 64, 1)) > 0.9).astype(jnp.float32)
    masks = jnp.zeros((1, 64, 64, 1)).at[:, 20:40, 20:40].set(1.0)
    state, metrics = jax.jit(trainer.train_step)(state, gray, edges, masks)
    assert int(state.iteration) == 1
    for v in metrics.values():
        assert np.isfinite(float(v))
