"""VUNet: conversion + activation parity vs torch oracle (deterministic cov=0)."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models import convert
from future_urban_scene_generation_tpu.models.vunet import Vunet
from torch_refs import TVunet

rng = np.random.RandomState(13)


def _pair(vunet_256):
    tm = TVunet(vunet_256=vunet_256).eval()
    params = convert.convert_state_dict(tm.state_dict())
    jm = Vunet(vunet_256=vunet_256)
    return tm, jm, params


def test_full_forward_parity_128():
    tm, jm, params = _pair(vunet_256=False)
    x_app = rng.rand(1, 128, 128, 6).astype(np.float32) * 2 - 1
    y_shape = rng.rand(1, 128, 128, 3).astype(np.float32) * 2 - 1

    with torch.no_grad():
        out_up, skips_up = tm.forward_enc_up(torch.from_numpy(x_app.transpose(0, 3, 1, 2)))
        mu_app, _ = tm.forward_enc_down(out_up, skips_up)
        out_dec, skips_dec = tm.forward_dec_up(torch.from_numpy(y_shape.transpose(0, 3, 1, 2)))
        ref, _, _ = tm.forward_dec_down(out_dec, skips_dec, mu_app)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    mu_app_j = jm.apply(params, jnp.asarray(x_app), cov=0.0, method=Vunet.encode_appearance)
    ours = np.asarray(
        jm.apply(params, jnp.asarray(y_shape), mu_app_j, cov=0.0, method=Vunet.decode_shape)
    )
    assert ours.shape == ref.shape == (1, 128, 128, 3)
    err = np.abs(ours - ref).max()
    assert err < 5e-3, err

    # Appearance codes themselves match.
    for m_j, m_t in zip(mu_app_j, mu_app):
        assert np.abs(np.asarray(m_j) - m_t.numpy().transpose(0, 2, 3, 1)).max() < 2e-3


def test_shape_only_mode():
    # mean_shape mode: decoder driven by its own sampled latents (vunet/models.py:478-481).
    _, jm, params = _pair(vunet_256=False)
    y_shape = jnp.asarray(rng.rand(1, 128, 128, 3).astype(np.float32))
    out = jm.apply(
        params, y_shape, mean_mode="mean_shape", cov=1.0,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    assert out.shape == (1, 128, 128, 3)
    # Stochastic: different keys give different outputs.
    out2 = jm.apply(
        params, y_shape, mean_mode="mean_shape", cov=1.0,
        rngs={"sample": jax.random.PRNGKey(1)},
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_vunet_256_shapes():
    tm, jm, params = _pair(vunet_256=True)
    x_app = rng.rand(1, 256, 256, 6).astype(np.float32)
    y_shape = rng.rand(1, 256, 256, 3).astype(np.float32)
    mu_app = jm.apply(params, jnp.asarray(x_app), cov=0.0, method=Vunet.encode_appearance)
    assert mu_app[0].shape == (1, 4, 4, 128)
    assert mu_app[1].shape == (1, 8, 8, 128)
    out = jm.apply(
        params, jnp.asarray(y_shape), mu_app, cov=0.0, method=Vunet.decode_shape
    )
    assert out.shape == (1, 256, 256, 3)
    # Spot-check against torch at 256 as well.
    with torch.no_grad():
        out_up, skips_up = tm.forward_enc_up(torch.from_numpy(x_app.transpose(0, 3, 1, 2)))
        mu_t, _ = tm.forward_enc_down(out_up, skips_up)
        out_dec, skips_dec = tm.forward_dec_up(torch.from_numpy(y_shape.transpose(0, 3, 1, 2)))
        ref, _, _ = tm.forward_dec_down(out_dec, skips_dec, mu_t)
    err = np.abs(np.asarray(out) - ref.numpy().transpose(0, 2, 3, 1)).max()
    assert err < 5e-3, err
