"""Training-mode spectral norm vs torch's power-iteration semantics."""
import pytest
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

def test_snconvtranspose_matches_torch_power_iteration():
    convt = torch.nn.ConvTranspose2d(6, 4, 4, stride=2, padding=1, bias=True)
    convt = torch.nn.utils.spectral_norm(convt)  # torch picks dim=1 for ConvT
    x = rng.randn(2, 8, 8, 6).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    w_orig = convt.weight_orig.detach().numpy().copy()  # (in, out, kh, kw)
    u0 = convt.weight_u.detach().numpy().copy()
    bias = convt.bias.detach().numpy().copy()

    from future_urban_scene_generation_tpu.models.layers import SNConvTranspose

    variables = {
        "params": {
            "kernel": jnp.asarray(w_orig.transpose(2, 3, 0, 1)),  # -> (kh, kw, in, out)
            "bias": jnp.asarray(bias),
        },
        "spectral": {"u": jnp.asarray(u0)},
    }
    mod = SNConvTranspose(features=4, kernel_size=4, stride=2, padding=1)

    convt.train()
    with torch.no_grad():
        ref = convt(xt).numpy().transpose(0, 2, 3, 1)
    ours, state = mod.apply(variables, jnp.asarray(x), mutable=["spectral"])
    assert np.abs(np.asarray(ours) - ref).max() < 1e-4
    assert (
        np.abs(np.asarray(state["spectral"]["u"]) - convt.weight_u.detach().numpy()).max()
        < 1e-4
    )

    with torch.no_grad():
        ref2 = convt(xt).numpy().transpose(0, 2, 3, 1)
    variables2 = {"params": variables["params"], "spectral": state["spectral"]}
    ours2, _ = mod.apply(variables2, jnp.asarray(x), mutable=["spectral"])
    assert np.abs(np.asarray(ours2) - ref2).max() < 1e-4


@pytest.mark.slow  # >10s: big torch build / heavy sweep
def test_sn_edge_generator_trains():
    """EdgeGenerator(spectral=True) + EdgeModelTrainer: one step runs, advances
    both SN power-iteration states, and keeps losses finite."""
    from future_urban_scene_generation_tpu.pipeline.training import EdgeModelTrainer

    trainer = EdgeModelTrainer(lr=1e-4)
    state = trainer.init(jax.random.PRNGKey(0), hw=(32, 32))
    assert state.gen_state is not None and "encoder_1" in str(
        jax.tree_util.tree_structure(state.gen_state)
    )
    g = rng.rand(2, 32, 32, 1).astype(np.float32)
    e = (rng.rand(2, 32, 32, 1) > 0.9).astype(np.float32)
    m = np.zeros((2, 32, 32, 1), np.float32)
    m[:, 8:24, 8:24] = 1.0
    new_state, metrics = trainer.train_step(
        state, jnp.asarray(g), jnp.asarray(e), jnp.asarray(m)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # Both power-iteration states advanced.
    gen_moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.gen_state, new_state.gen_state,
    )
    assert max(jax.tree_util.tree_leaves(gen_moved)) > 1e-6
    dis_moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.dis_state, new_state.dis_state,
    )
    assert max(jax.tree_util.tree_leaves(dis_moved)) > 1e-6
