"""bf16 generator inference mode: quality vs f32 and dtype plumbing.

MODEL_SPEC["generator_dtype"]="bfloat16" casts ICN/VUNet activations (and, via
models/layers.py, the effective conv weights) to bf16 while every normalization
statistic stays f32. These tests pin the output quality loss and that the f32
path is bit-unchanged by the mixed-precision plumbing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from future_urban_scene_generation_tpu.pipeline import stages

# Scene-program compiles / torch network builds: slow tier (cold-cache cost
# is minutes; `pytest -m smoke` skips these for per-change runs).
pytestmark = pytest.mark.slow

rng = np.random.RandomState(11)


@pytest.fixture()
def models():
    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    return stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init(
                {"params": k}, jnp.zeros((1, 256, 256, 3)),
                jnp.zeros((1, 256, 256, 6)), cov=0.0,
            )
        )(key),
    )


def _psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def _icn_inputs():
    sketch = jnp.asarray(rng.rand(256, 256, 3).astype(np.float32))
    central = jnp.asarray(rng.rand(256, 256, 3).astype(np.float32) * 2 - 1)
    planes = jnp.asarray(rng.rand(5, 256, 256, 3).astype(np.float32) * 2 - 1)
    return sketch, central, planes


def test_bf16_icn_quality(models):
    sketch, central, planes = _icn_inputs()
    f32 = stages.icn_synthesize(models, sketch, central, planes)
    stages.configure_models(generator_dtype="bfloat16")
    try:
        bf16 = stages.icn_synthesize(models, sketch, central, planes)
    finally:
        stages.configure_models(generator_dtype="float32")
    assert bf16.dtype == jnp.float32  # outputs are upcast at the stage boundary
    psnr = _psnr(f32, bf16)
    assert psnr > 35.0, psnr


def test_bf16_vunet_quality(models):
    from future_urban_scene_generation_tpu.ops import crop as cr

    frame = jnp.asarray(rng.rand(400, 640, 3).astype(np.float32))
    sketch = jnp.asarray(rng.rand(256, 256, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(256, 256) > 0.5)
    win = cr.Window(jnp.float32(100), jnp.float32(50), jnp.float32(256), jnp.float32(256))

    mu = stages.vunet_encode_appearance(models, frame, sketch, mask, win)
    f32 = stages.vunet_synthesize(models, sketch, mu)
    stages.configure_models(generator_dtype="bfloat16")
    try:
        mu_bf = stages.vunet_encode_appearance(models, frame, sketch, mask, win)
        bf16 = stages.vunet_synthesize(models, sketch, mu_bf)
    finally:
        stages.configure_models(generator_dtype="float32")
    psnr = _psnr(f32, bf16)
    assert psnr > 30.0, psnr


def test_f32_path_unchanged_by_mixed_precision_plumbing(models):
    """The .astype(x.dtype) casts in layers are no-ops for f32 inputs: outputs of
    the f32 path must be numerically identical across the plumbing change."""
    sketch, central, planes = _icn_inputs()
    a = stages.icn_synthesize(models, sketch, central, planes)
    b = stages.icn_synthesize(models, sketch, central, planes)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.dtype == jnp.float32


def test_reference_channel_order_switch(models):
    """PARITY.md §6: the switch reproduces the reference's per-tensor channel
    conventions — VUNet sketches channel-reversed, vehicle/central crops consumed
    BGR — and is a no-op when off."""
    from future_urban_scene_generation_tpu.ops import crop as cr

    frame = jnp.asarray(rng.rand(300, 400, 3).astype(np.float32))
    sketch = jnp.asarray(rng.rand(256, 256, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(256, 256) > 0.5)
    win = cr.Window(jnp.float32(40), jnp.float32(30), jnp.float32(200), jnp.float32(200))

    base_mu = stages.vunet_encode_appearance(models, frame, sketch, mask, win)
    base_out = stages.vunet_synthesize(models, sketch, base_mu)

    stages.configure_models(reference_channel_order=True)
    try:
        # Equivalent to the default path on a channel-flipped frame + sketch.
        flip_mu = stages.vunet_encode_appearance(models, frame, sketch, mask, win)
        flip_out = stages.vunet_synthesize(models, sketch, flip_mu)
        stages.configure_models(reference_channel_order=False)
        manual_mu = stages.vunet_encode_appearance(
            models, frame[..., ::-1], sketch[..., ::-1], mask, win
        )
        manual_out = stages.vunet_synthesize(models, sketch[..., ::-1], manual_mu)
    finally:
        stages.configure_models(reference_channel_order=False)

    np.testing.assert_allclose(np.asarray(flip_out), np.asarray(manual_out), atol=1e-6)
    # And it actually changes the computation (the nets see different channels).
    assert float(jnp.abs(flip_out - base_out).max()) > 1e-4

    # Off-path unchanged.
    again = stages.vunet_synthesize(models, sketch, base_mu)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(base_out))
