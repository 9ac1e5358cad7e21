"""Hourglass model: checkpoint conversion + activation parity vs the torch oracle."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models import convert
from future_urban_scene_generation_tpu.models.hourglass import HourglassNet, decode_heatmaps
from torch_refs import THourglassNet, randomize_bn_stats

rng = np.random.RandomState(9)


def _build_pair():
    tm = randomize_bn_stats(THourglassNet(2, 1, 12)).eval()
    params = convert.convert_state_dict(tm.state_dict())
    jm = HourglassNet(num_stacks=2, num_blocks=1, num_classes=12)
    return tm, jm, params


def test_activation_parity():
    tm, jm, params = _build_pair()
    x = rng.randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out = jm.apply(params, jnp.asarray(x))
    assert len(out["heatmaps"]) == 2
    for stack in range(2):
        ours = np.asarray(out["heatmaps"][stack])
        theirs = ref[stack].numpy().transpose(0, 2, 3, 1)
        assert ours.shape == theirs.shape == (1, 32, 32, 12)
        err = np.abs(ours - theirs).max()
        assert err < 5e-3, (stack, err)


def test_full_resolution_shapes():
    _, jm, params = _build_pair()
    x = jnp.zeros((2, 256, 256, 3))
    out = jm.apply(params, x)
    assert out["heatmaps"][-1].shape == (2, 64, 64, 12)


def test_decode_heatmaps_matches_reference_decoding():
    # Against the reference decoding: nearest-upsample 64->256 then unravel argmax
    # (trajectory_inference.py:77 + utils/keypoint_utils.py:66-92).
    hm = rng.randn(2, 12, 64, 64).astype(np.float32)  # NCHW like torch
    up = torch.nn.functional.interpolate(torch.from_numpy(hm), (256, 256)).numpy()
    expected = np.zeros((2, 12, 2))
    for b in range(2):
        for c in range(12):
            y, x = np.unravel_index(np.argmax(up[b, c]), (256, 256))
            expected[b, c] = [x / 256, y / 256]
    ours = np.asarray(decode_heatmaps(jnp.asarray(hm.transpose(0, 2, 3, 1))))
    assert np.allclose(ours, expected)
