"""VUNet trainer smoke: one step runs, losses finite, params update."""
import numpy as np
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models.vunet import Vunet
from future_urban_scene_generation_tpu.pipeline.training import VunetTrainer
import pytest

# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow


def test_vunet_train_step():
    trainer = VunetTrainer(vunet=Vunet(vunet_256=False), lr=1e-4)
    key = jax.random.PRNGKey(0)
    y = jax.random.uniform(key, (1, 128, 128, 3)) * 2 - 1
    x_app = jax.random.uniform(key, (1, 128, 128, 6)) * 2 - 1
    target = jax.random.uniform(key, (1, 128, 128, 3)) * 2 - 1
    params, opt_state = trainer.init(key, y, x_app)
    step = jax.jit(trainer.train_step)
    params2, opt_state, metrics = step(params, opt_state, key, y, x_app, target)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # Parameters actually moved.
    leaf0 = jax.tree_util.tree_leaves(params)[0]
    leaf1 = jax.tree_util.tree_leaves(params2)[0]
    assert not np.array_equal(np.asarray(leaf0), np.asarray(leaf1))
