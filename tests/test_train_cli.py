"""Training-driver CLI: the inpaint branch and its pretrained-VGG loss path.

The reference's InpaintingModel losses tap a pretrained VGG19
(edgeconnect/loss.py:45-99, 102-224); the CLI must load a torch trunk when given
and warn loudly when training against random features.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models.vgg import (
    VGG19Features,
    convert_vgg19_features,
)


def _random_trunk_sd(prefix=""):
    """A torchvision-shaped vgg19 features.* state dict with random weights."""
    plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    rng = np.random.RandomState(0)
    sd, c_in, idx = {}, 3, 0
    for entry in plan:
        if entry == "M":
            idx += 1  # the MaxPool module consumes an index
            continue
        w = rng.randn(entry, c_in, 3, 3).astype(np.float32) * 0.05
        b = rng.randn(entry).astype(np.float32) * 0.01
        sd[f"{prefix}features.{idx}.weight"] = torch.from_numpy(w)
        sd[f"{prefix}features.{idx}.bias"] = torch.from_numpy(b)
        c_in = entry
        idx += 2  # conv + relu
    return sd


def test_convert_vgg19_features_structure():
    sd = _random_trunk_sd()
    # classifier entries must be ignored; module. prefixes stripped
    sd["classifier.0.weight"] = torch.zeros(1, 1)
    params = convert_vgg19_features(sd)
    template = VGG19Features().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    t_shapes = jax.tree.map(lambda a: a.shape, template)
    c_shapes = jax.tree.map(lambda a: a.shape, params)
    assert t_shapes == c_shapes
    # the converted kernel really is the torch weight, OIHW -> HWIO
    w0 = np.asarray(params["params"]["features_0"]["kernel"])
    assert np.array_equal(w0, sd["features.0.weight"].numpy().transpose(2, 3, 1, 0))

    prefixed = convert_vgg19_features(_random_trunk_sd(prefix="module."))
    assert jax.tree.map(lambda a: a.shape, prefixed) == t_shapes

    with pytest.raises(ValueError):
        convert_vgg19_features({"classifier.0.weight": torch.zeros(1, 1)})


@pytest.mark.slow  # inpaint GAN step + VGG19 compile on CPU
def test_train_cli_inpaint(tmp_path, capsys):
    from future_urban_scene_generation_tpu.cli import train as train_cli

    vgg_path = tmp_path / "vgg19.pth"
    torch.save(_random_trunk_sd(), vgg_path)

    out = tmp_path / "run"
    rc = train_cli.main([
        "--model", "inpaint", "--steps", "1", "--batch", "1",
        "--image-size", "64", "--out", str(out),
        "--vgg-weights", str(vgg_path), "--save-interval", "1",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "loaded pretrained VGG19 features" in captured
    assert "RANDOMLY INITIALIZED" not in captured
    assert (out / "checkpoint").exists()

    # Without --vgg-weights the driver must warn loudly.
    rc = train_cli.main([
        "--model", "inpaint", "--steps", "1", "--batch", "1",
        "--image-size", "64", "--out", str(tmp_path / "run2"),
    ])
    assert rc == 0
    assert "RANDOMLY INITIALIZED" in capsys.readouterr().out
