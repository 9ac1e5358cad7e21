"""ICN generator + discriminator: conversion + activation parity vs torch oracle."""
import numpy as np
import torch
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models import convert
from future_urban_scene_generation_tpu.models.icn import DNLayersMulti, GResnet, gan_loss
from torch_refs import TDMulti, TGResnet

rng = np.random.RandomState(10)


def test_gresnet_parity():
    tm = TGResnet(input_nc=21).eval()
    params = convert.convert_state_dict(tm.state_dict())
    jm = GResnet(input_nc=21)
    x = rng.rand(1, 64, 64, 21).astype(np.float32) * 2 - 1
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(jm.apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 64, 64, 3)
    err = np.abs(ours - ref).max()
    assert err < 2e-3, err


def test_dmulti_parity():
    tm = TDMulti(input_nc=3, ndf=32, n_layers=2, num_D=2).eval()
    params = convert.convert_state_dict(tm.state_dict())
    jm = DNLayersMulti(input_nc=3, ndf=32, n_layers=2, num_d=2)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    with torch.no_grad():
        refs = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ours = jm.apply(params, jnp.asarray(x))
    assert len(ours) == 2
    for o, r in zip(ours, refs):
        r = r.numpy().transpose(0, 2, 3, 1)
        assert o.shape == r.shape
        assert np.abs(np.asarray(o) - r).max() < 1e-3


def test_gan_loss_values():
    preds = [jnp.full((1, 8, 8, 1), 0.3), jnp.full((1, 4, 4, 1), 0.7)]
    # real: mean((0.3-1)^2) + mean((0.7-1)^2)
    expected = 0.7**2 + 0.3**2
    assert abs(float(gan_loss(preds, True)) - expected) < 1e-6
    expected_fake = 0.3**2 + 0.7**2
    assert abs(float(gan_loss(preds, False)) - expected_fake) < 1e-6


def test_gan_loss_masked():
    preds = [jnp.ones((1, 8, 8, 1))]
    mask = jnp.zeros((1, 16, 16, 1))
    assert float(gan_loss(preds, True, mask=mask)) == 0.0
