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
