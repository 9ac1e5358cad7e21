"""Orbax round trip + reference .pth zoo loading."""
import numpy as np
import torch
import jax.numpy as jnp

from future_urban_scene_generation_tpu.pipeline import checkpoint as ckpt


def test_orbax_round_trip(tmp_path):
    tree = {
        "params": {
            "conv": {"kernel": jnp.arange(12.0).reshape(3, 4), "bias": jnp.ones(4)}
        },
        "iteration": jnp.int32(7),
    }
    path = tmp_path / "ckpt"
    ckpt.save(path, tree)
    restored = ckpt.restore(path)
    assert np.array_equal(
        np.asarray(restored["params"]["conv"]["kernel"]),
        np.asarray(tree["params"]["conv"]["kernel"]),
    )
    assert int(restored["iteration"]) == 7


def test_load_torch_checkpoint_generator_wrapper(tmp_path):
    # EdgeConnect-style {"iteration", "generator"} wrapper (edgeconnect/models.py:45-48).
    sd = {"encoder.1.weight": torch.randn(8, 3, 7, 7), "encoder.1.bias": torch.randn(8)}
    path = tmp_path / "EdgeModel_gen.pth"
    torch.save({"iteration": 1234, "generator": sd}, path)
    params, iteration = ckpt.load_torch_checkpoint(path)
    assert iteration == 1234
    assert params["params"]["encoder_1"]["kernel"].shape == (7, 7, 3, 8)


def test_load_reference_model_zoo_partial(tmp_path):
    # Only the hourglass checkpoint exists -> zoo contains just that entry.
    (tmp_path / "kpoints").mkdir()
    sd = {"conv1.weight": torch.randn(64, 3, 7, 7), "conv1.bias": torch.randn(64)}
    torch.save(sd, tmp_path / "kpoints" / "hourglass.pth")
    zoo = ckpt.load_reference_model_zoo(tmp_path)
    assert set(zoo) == {"hourglass"}
    assert zoo["hourglass"]["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)


def test_load_reference_model_zoo_maskrcnn(tmp_path):
    (tmp_path / "maskrcnn").mkdir()
    sd = {
        "backbone.body.conv1.weight": torch.randn(8, 3, 7, 7),
        "roi_heads.mask_predictor.conv5_mask.weight": torch.randn(8, 8, 2, 2),
        "roi_heads.mask_predictor.conv5_mask.bias": torch.randn(8),
    }
    # torchvision checkpoints sometimes wrap the state dict under "model".
    torch.save({"model": sd}, tmp_path / "maskrcnn" / "maskrcnn.pth")
    zoo = ckpt.load_reference_model_zoo(tmp_path)
    assert set(zoo) == {"maskrcnn"}
    p = zoo["maskrcnn"]["params"]
    assert p["backbone"]["body"]["conv1"]["kernel"].shape == (7, 7, 3, 8)
    # conv5_mask converts with the ConvTranspose layout (kh, kw, in, out).
    assert p["roi_heads"]["mask_predictor"]["conv5_mask"]["kernel"].shape == (2, 2, 8, 8)


def test_zoo_conversion_cache_round_trip(tmp_path):
    import numpy as np

    (tmp_path / "kpoints").mkdir()
    sd = {"conv1.weight": torch.randn(8, 3, 7, 7), "conv1.bias": torch.randn(8)}
    torch.save(sd, tmp_path / "kpoints" / "hourglass.pth")
    first = ckpt.load_reference_model_zoo(tmp_path)
    assert (tmp_path / ".converted_zoo").exists()
    second = ckpt.load_reference_model_zoo(tmp_path)  # restored from cache
    np.testing.assert_allclose(
        np.asarray(first["hourglass"]["params"]["conv1"]["kernel"]),
        np.asarray(second["hourglass"]["params"]["conv1"]["kernel"]),
    )
    # A newer .pth invalidates the cache (mtime-based).
    import os
    import time as _time

    _time.sleep(0.01)
    sd2 = {"conv1.weight": torch.randn(8, 3, 7, 7) + 5.0,
           "conv1.bias": torch.randn(8)}
    torch.save(sd2, tmp_path / "kpoints" / "hourglass.pth")
    os.utime(tmp_path / "kpoints" / "hourglass.pth")
    third = ckpt.load_reference_model_zoo(tmp_path)
    assert (
        abs(
            float(np.asarray(third["hourglass"]["params"]["conv1"]["kernel"]).mean())
            - float(np.asarray(first["hourglass"]["params"]["conv1"]["kernel"]).mean())
        )
        > 1.0
    )
