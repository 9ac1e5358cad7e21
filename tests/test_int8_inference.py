"""int8 quantized-conv serving tier: quality vs float and dispatch plumbing.

MODEL_SPEC["quantized_convs"]=True routes every wide generator conv
(models/layers._int8_conv) through a symmetric int8 MXU pass — dynamic
per-tensor activation scales, per-output-channel weight scales, exact int32
accumulation. These tests pin (a) the single-conv quantization error, (b) the
end-to-end generator quality loss vs the float path, and (c) that the float
path is bit-unchanged while the knob is off (the default: every parity and
crossval tier runs float).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from future_urban_scene_generation_tpu.models import layers
from future_urban_scene_generation_tpu.pipeline import stages

rng = np.random.RandomState(7)


def _psnr(a, b):
    mse = float(jnp.mean((jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.fixture()
def quantized():
    stages.configure_models(quantized_convs=True)
    try:
        yield
    finally:
        stages.configure_models(quantized_convs=False)


@pytest.mark.smoke
def test_int8_conv_close_to_float():
    x = jnp.asarray(rng.randn(2, 24, 24, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 96).astype(np.float32) * 0.05)
    ref = layers._xla_conv(x, w, 1, 1)
    q = layers._int8_conv(x, w, 1, 1)
    rel = float(jnp.max(jnp.abs(q - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel
    assert q.dtype == x.dtype


@pytest.mark.smoke
def test_int8_dispatch_gating(quantized):
    x = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    routed = layers._dispatch_conv(x, w, 1, 1)
    np.testing.assert_array_equal(
        np.asarray(routed), np.asarray(layers._int8_conv(x, w, 1, 1))
    )
    # Narrow convs (stems/heads) stay on their float/packed paths.
    xn = jnp.asarray(rng.randn(1, 16, 16, 8).astype(np.float32))
    wn = jnp.asarray(rng.randn(3, 3, 8, 64).astype(np.float32) * 0.05)
    np.testing.assert_array_equal(
        np.asarray(layers._dispatch_conv(xn, wn, 1, 1)),
        np.asarray(layers._xla_conv(xn, wn, 1, 1)),
    )


@pytest.mark.smoke
def test_int8_knob_off_is_bit_exact():
    x = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    a = np.asarray(layers._dispatch_conv(x, w, 1, 1))
    stages.configure_models(quantized_convs=True)
    stages.configure_models(quantized_convs=False)
    b = np.asarray(layers._dispatch_conv(x, w, 1, 1))
    np.testing.assert_array_equal(a, b)


@pytest.mark.smoke
def test_int8_spec_key_changes():
    """spec_key() must differ across the knob so scene-level jits retrace."""
    base = stages.spec_key()
    stages.configure_models(quantized_convs=True)
    try:
        assert stages.spec_key() != base
    finally:
        stages.configure_models(quantized_convs=False)
    assert stages.spec_key() == base


@pytest.mark.smoke
def test_int8_upconv_quantized(quantized):
    """The fused ICN up-stage quantizes its phase-packed main conv; borders are
    recomputed in float, so the interior matches the int8 error scale and the
    whole output stays close to the float composition."""
    x = jnp.asarray(rng.randn(1, 16, 16, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(5, 5, 64, 64).astype(np.float32) * 0.04)
    q = layers.upconv2x_nearest_reflect(x, k)
    stages.configure_models(quantized_convs=False)
    ref = layers.upconv2x_nearest_reflect_reference(x, k)
    rel = float(jnp.max(jnp.abs(q - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 0.05, rel


# --- End-to-end generator quality (scene-sized forwards: slow tier) ---

pytest_slow = pytest.mark.slow


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


@pytest_slow
def test_int8_icn_quality(models):
    sketch = jnp.asarray(rng.rand(256, 256, 3).astype(np.float32))
    central = jnp.asarray(rng.rand(256, 256, 3).astype(np.float32) * 2 - 1)
    planes = jnp.asarray(rng.rand(5, 256, 256, 3).astype(np.float32) * 2 - 1)
    f32 = stages.icn_synthesize(models, sketch, central, planes)
    stages.configure_models(quantized_convs=True, generator_dtype="bfloat16")
    try:
        q = stages.icn_synthesize(models, sketch, central, planes)
    finally:
        stages.configure_models(quantized_convs=False, generator_dtype="float32")
    assert q.dtype == jnp.float32
    psnr = _psnr(f32, q)
    assert psnr > 27.0, psnr


@pytest_slow
def test_int8_edgeconnect_quality():
    """EdgeConnect's inpaint generator is instance-normed like ICN, so the
    int8 tier covers it (encoder + dilated resnet trunk through TorchConv,
    decoder through the TorchConvTranspose int8 branch)."""
    from future_urban_scene_generation_tpu.models.edgeconnect import InpaintGenerator

    gm = InpaintGenerator()
    x = jnp.asarray(rng.rand(1, 256, 256, 4).astype(np.float32))
    params = jax.jit(gm.init)(jax.random.PRNGKey(2), x)
    f32 = gm.apply(params, x)
    stages.configure_models(quantized_convs=True)
    try:
        q = gm.apply(params, x)
    finally:
        stages.configure_models(quantized_convs=False)
    psnr = _psnr(f32, q)
    assert psnr > 27.0, psnr


@pytest_slow
def test_int8_vunet_suppressed(models):
    """VUNet stays on the float path under the int8 tier: its weight-normed
    stack has no post-conv renormalization, so per-conv rounding compounds —
    measured 18.5 dB (per-tensor scales) / 20.1 dB (per-channel scales) vs
    f32, below the serving bar. stages wraps both VUNet forwards in
    layers.suppress_quantization(); with f32 generators the knob must
    therefore be a bit-exact no-op on VUNet outputs."""
    from future_urban_scene_generation_tpu.ops import crop as cr

    frame = jnp.asarray(rng.rand(400, 640, 3).astype(np.float32))
    sketch = jnp.asarray(rng.rand(256, 256, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(256, 256) > 0.5)
    win = cr.Window(jnp.float32(100), jnp.float32(50), jnp.float32(256), jnp.float32(256))

    mu = stages.vunet_encode_appearance(models, frame, sketch, mask, win)
    f32 = stages.vunet_synthesize(models, sketch, mu)
    stages.configure_models(quantized_convs=True)
    try:
        mu_q = stages.vunet_encode_appearance(models, frame, sketch, mask, win)
        q = stages.vunet_synthesize(models, sketch, mu_q)
    finally:
        stages.configure_models(quantized_convs=False)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(f32))
