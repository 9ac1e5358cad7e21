"""Training-mode spectral norm vs torch's power-iteration semantics."""
import numpy as np
import torch
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models.layers import SNConv

rng = np.random.RandomState(41)


def test_snconv_matches_torch_power_iteration():
    conv = torch.nn.Conv2d(4, 6, 3, padding=1, bias=True)
    conv = torch.nn.utils.spectral_norm(conv)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # .copy() matters: .numpy() returns a VIEW that torch's in-place power-iteration
    # update would mutate underneath the (possibly zero-copy) jax arrays.
    w_orig = conv.weight_orig.detach().numpy().copy()  # (out, in, kh, kw)
    u0 = conv.weight_u.detach().numpy().copy()
    bias = conv.bias.detach().numpy().copy()

    variables = {
        "params": {
            "kernel": jnp.asarray(w_orig.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(bias),
        },
        "spectral": {"u": jnp.asarray(u0)},
    }
    mod = SNConv(features=6, kernel_size=3, padding=1)

    # torch training forward does one power iteration then normalizes.
    conv.train()
    with torch.no_grad():
        ref = conv(xt).numpy().transpose(0, 2, 3, 1)
    ours, state = mod.apply(variables, jnp.asarray(x), mutable=["spectral"])
    assert np.abs(np.asarray(ours) - ref).max() < 1e-4
    # u was updated to torch's new u.
    assert np.abs(np.asarray(state["spectral"]["u"]) - conv.weight_u.detach().numpy()).max() < 1e-4

    # A second step continues the iteration identically.
    with torch.no_grad():
        ref2 = conv(xt).numpy().transpose(0, 2, 3, 1)
    variables2 = {"params": variables["params"], "spectral": state["spectral"]}
    ours2, _ = mod.apply(variables2, jnp.asarray(x), mutable=["spectral"])
    assert np.abs(np.asarray(ours2) - ref2).max() < 1e-4


def test_snconv_eval_mode_read_only():
    mod = SNConv(features=4, kernel_size=3, padding=1)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 8, 8, 3))
    variables = mod.init(key, x)
    # Without mutable, the forward works and does not error.
    out = mod.apply(variables, x)
    assert out.shape == (1, 8, 8, 4)
    # Normalized weight has spectral norm ~1 after a few mutable steps.
    v = variables
    for _ in range(20):
        _, st = mod.apply(v, x, mutable=["spectral"])
        v = {"params": v["params"], "spectral": st["spectral"]}
    k = np.asarray(v["params"]["kernel"]).transpose(3, 0, 1, 2).reshape(4, -1)
    u = np.asarray(v["spectral"]["u"])
    vv = k.T @ u / np.linalg.norm(k.T @ u)
    sigma = u @ k @ vv
    s_max = np.linalg.svd(k, compute_uv=False)[0]
    assert abs(sigma - s_max) / s_max < 0.05  # power iteration converged
