"""VGG19 trunk + CAD classifier vs torchvision (random-init architecture oracle)."""
import numpy as np
import pytest
import torch
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models.vgg import (
    VGG19Classifier,
    VGG19Features,
    convert_vgg19_classifier,
)
from future_urban_scene_generation_tpu.models.convert import convert_state_dict
from torch_refs import t_vgg19

rng = np.random.RandomState(12)


def _torch_vgg10():
    return t_vgg19(num_classes=10).eval()


@pytest.mark.slow  # >40s: full torchvision-architecture VGG19 build
def test_cad_classifier_parity():
    tm = _torch_vgg10()
    params = convert_vgg19_classifier(tm.state_dict())
    jm = VGG19Classifier(num_classes=10)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)  # small input exercises adaptive pool
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jm.apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 10)
    assert np.abs(ours - ref).max() < 2e-2, np.abs(ours - ref).max()
    assert np.argmax(ours) == np.argmax(ref)


@pytest.mark.slow  # >40s: full torchvision-architecture VGG19 build
def test_cad_classifier_parity_256():
    tm = _torch_vgg10()
    params = convert_vgg19_classifier(tm.state_dict())
    jm = VGG19Classifier(num_classes=10)
    x = rng.rand(1, 256, 256, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(jm.apply(params, jnp.asarray(x)))
    assert np.argmax(ours) == np.argmax(ref)
    assert np.abs(ours - ref).max() < 5e-2


def test_feature_taps_parity():
    tm = t_vgg19().eval()
    feats_sd = {k: v for k, v in tm.state_dict().items() if k.startswith("features")}
    params = convert_state_dict(feats_sd)
    jm = VGG19Features()
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    taps = jm.apply(params, jnp.asarray(x))
    # Check two taps against manual torch slicing.
    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        relu1_1 = tm.features[:2](xt)
        relu3_1 = tm.features[:12](xt)
    assert np.abs(np.asarray(taps["relu1_1"]) - relu1_1.numpy().transpose(0, 2, 3, 1)).max() < 1e-4
    assert np.abs(np.asarray(taps["relu3_1"]) - relu3_1.numpy().transpose(0, 2, 3, 1)).max() < 1e-3
    assert set(taps) >= {"relu1_1", "relu2_2", "relu3_4", "relu4_4", "relu5_2", "final"}
