"""Width-folded VUNet 256² stage: value parity with the unfolded path.

The fold (models/layers.py width_fold_region) is a TPU lane-fill/layout
optimization — chip A/B: 3x3 conv 2.60 vs 3.82 ms at (24,256,256,32->64) bf16
when the chain stays folded. These tests force the folded trace on CPU and pin
that it computes the SAME function.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from future_urban_scene_generation_tpu.models import layers as L
from future_urban_scene_generation_tpu.models.vunet import Vunet

pytestmark = pytest.mark.slow

rng = np.random.RandomState(21)


def test_depth_to_space_folded_matches():
    z = jnp.asarray(rng.rand(2, 8, 12, 4 * 5).astype(np.float32))
    got = L.depth_to_space_folded(z)
    ref = L.fold_width4(L.depth_to_space(z, 2))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_concat_folded_matches():
    a = jnp.asarray(rng.rand(1, 4, 16, 8).astype(np.float32))
    b = jnp.asarray(rng.rand(1, 4, 16, 12).astype(np.float32))
    got = L.concat_folded(L.fold_width4(a), L.fold_width4(b))
    ref = L.fold_width4(jnp.concatenate([a, b], axis=-1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("vunet_256,res", [(False, 128), (True, 256)])
def test_vunet_decode_folded_matches_unfolded(vunet_256, res):
    model = Vunet(vunet_256=vunet_256)
    key = jax.random.PRNGKey(0)
    y = jnp.asarray(rng.rand(1, res, res, 3).astype(np.float32))
    x_app = jnp.asarray(rng.rand(1, res, res, 6).astype(np.float32))
    with L.force_width_fold(False):
        params = jax.jit(
            lambda k: model.init({"params": k}, y, x_app, cov=0.0)
        )(key)
        mu = model.apply(params, x_app, cov=0.0, method=Vunet.encode_appearance)
        ref = model.apply(params, y, mu, cov=0.0, method=Vunet.decode_shape)
    with L.force_width_fold(True):
        got = model.apply(params, y, mu, cov=0.0, method=Vunet.decode_shape)
    assert got.shape == ref.shape
    # f32 reassociation noise only: measured rel-err 1.7e-6 on outputs of
    # magnitude ~20 (random-init nets amplify layer-by-layer rounding).
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-3
    )


def test_fold_disabled_when_not_deterministic():
    """Training mode (dropout active) must never enter the folded region —
    dropout2d's channel semantics differ on folded tensors."""
    model = Vunet(vunet_256=False, drop_prob=0.2)
    y = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    with L.force_width_fold(True):
        assert model._fold256(y, deterministic=False) is False
        assert model._fold256(y, deterministic=True) is True