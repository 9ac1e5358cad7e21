"""EdgeConnect networks: spectral-norm folding + activation parity vs torch oracle."""
import numpy as np
import torch
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models import convert
from future_urban_scene_generation_tpu.models.edgeconnect import (
    ECDiscriminator,
    EDGECONNECT_CONVT_KEYS,
    EdgeGenerator,
    InpaintGenerator,
    adversarial_loss,
    edge_model_forward,
    gram_matrix,
)
from torch_refs import TECDiscriminator, _t_ec_generator

rng = np.random.RandomState(11)


def test_edge_generator_parity():
    tm = _t_ec_generator(3, 1, use_sn=True, blocks=8).eval()
    params = convert.convert_state_dict(tm.state_dict(), convt_keys=EDGECONNECT_CONVT_KEYS)
    jm = EdgeGenerator()
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(jm.apply(params, jnp.asarray(x)))
    assert ours.shape == ref.shape == (1, 64, 64, 1)
    assert np.abs(ours - ref).max() < 2e-3


def test_inpaint_generator_parity():
    tm = _t_ec_generator(4, 3, use_sn=False, blocks=8).eval()
    params = convert.convert_state_dict(tm.state_dict(), convt_keys=EDGECONNECT_CONVT_KEYS)
    jm = InpaintGenerator()
    x = rng.rand(1, 64, 64, 4).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(jm.apply(params, jnp.asarray(x)))
    assert np.abs(ours - ref).max() < 2e-3


def test_discriminator_parity():
    tm = TECDiscriminator(3, use_sigmoid=True, use_sn=True).eval()
    params = convert.convert_state_dict(tm.state_dict())
    jm = ECDiscriminator(in_channels=3)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        ref_out, ref_feats = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    out, feats = jm.apply(params, jnp.asarray(x))
    assert np.abs(np.asarray(out) - ref_out.numpy().transpose(0, 2, 3, 1)).max() < 1e-3
    assert len(feats) == 5
    # Random-init D activations grow to ~1e9 (no norm layers); compare relatively.
    for f, rf in zip(feats, ref_feats):
        rf = rf.numpy().transpose(0, 2, 3, 1)
        rel = np.abs(np.asarray(f) - rf).max() / (np.abs(rf).max() + 1e-9)
        assert rel < 1e-4, rel


def test_edge_model_forward_masking():
    tm = _t_ec_generator(3, 1, use_sn=True, blocks=8).eval()
    params = convert.convert_state_dict(tm.state_dict(), convt_keys=EDGECONNECT_CONVT_KEYS)
    gray = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
    edges = jnp.asarray(rng.rand(1, 64, 64, 1).astype(np.float32))
    masks = jnp.zeros((1, 64, 64, 1)).at[:, 20:40, 20:40].set(1.0)
    out = edge_model_forward(params, gray, edges, masks)
    assert out.shape == (1, 64, 64, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_adversarial_loss_matches_torch():
    x = torch.rand(2, 1, 8, 8) * 0.8 + 0.1
    bce_real = torch.nn.BCELoss()(x, torch.ones_like(x)).item()
    ours = float(adversarial_loss(jnp.asarray(x.numpy()), True, kind="nsgan"))
    assert abs(ours - bce_real) < 1e-5
    mse_fake = torch.nn.MSELoss()(x, torch.zeros_like(x)).item()
    ours_ls = float(adversarial_loss(jnp.asarray(x.numpy()), False, kind="lsgan"))
    assert abs(ours_ls - mse_fake) < 1e-6


def test_gram_matrix_matches_torch():
    x = rng.rand(2, 6, 5, 4).astype(np.float32)  # NHWC
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    b, ch, h, w = xt.size()
    f = xt.view(b, ch, w * h)
    ref = (f.bmm(f.transpose(1, 2)) / (h * w * ch)).numpy()
    ours = np.asarray(gram_matrix(jnp.asarray(x)))
    assert np.abs(ours - ref).max() < 1e-5
