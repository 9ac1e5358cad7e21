"""Layer-level numerical parity vs torch primitives — the foundation of model parity."""
import numpy as np
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models import layers as L

rng = np.random.RandomState(8)


def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))


def _nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


def test_conv_matches_torch():
    x = rng.randn(2, 16, 16, 5).astype(np.float32)
    w = rng.randn(7, 5, 3, 3).astype(np.float32)  # OIHW
    b = rng.randn(7).astype(np.float32)
    ref = F.conv2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=2, padding=1)
    mod = L.TorchConv(features=7, kernel_size=3, stride=2, padding=1)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_reflect_pad_conv_matches_torch():
    x = rng.randn(1, 10, 10, 4).astype(np.float32)
    w = rng.randn(6, 4, 7, 7).astype(np.float32)
    ref = F.conv2d(F.pad(_nchw(x), (3, 3, 3, 3), mode="reflect"), torch.from_numpy(w))
    mod = L.TorchConv(features=6, kernel_size=7, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    ours = np.asarray(mod.apply(params, L.reflect_pad(jnp.asarray(x), 3)))
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_dilated_conv_matches_torch():
    x = rng.randn(1, 12, 12, 4).astype(np.float32)
    w = rng.randn(4, 4, 3, 3).astype(np.float32)
    ref = F.conv2d(_nchw(x), torch.from_numpy(w), dilation=2, padding=2)
    mod = L.TorchConv(features=4, kernel_size=3, padding=2, dilation=2, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_conv_transpose_k4s2p1_matches_torch():
    # EdgeConnect decoder convs (edgeconnect/networks.py:64,68).
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    w = rng.randn(5, 6, 4, 4).astype(np.float32)  # torch convT: (in, out, kh, kw)
    b = rng.randn(6).astype(np.float32)
    ref = F.conv_transpose2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b), stride=2, padding=1)
    mod = L.TorchConvTranspose(features=6, kernel_size=4, stride=2, padding=1)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1)), "bias": jnp.asarray(b)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert ours.shape == (2, 16, 16, 6)
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_conv_transpose_k3s2p1op1_matches_torch():
    # VUNet DeConv2d (vunet/layers.py:61-80).
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    w = rng.randn(4, 3, 3, 3).astype(np.float32)
    ref = F.conv_transpose2d(_nchw(x), torch.from_numpy(w), stride=2, padding=1, output_padding=1)
    mod = L.TorchConvTranspose(features=3, kernel_size=3, stride=2, padding=1, output_padding=1, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 0, 1))}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert ours.shape == (1, 16, 16, 3)
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_instance_norm_matches_torch():
    x = rng.randn(2, 9, 11, 6).astype(np.float32) * 3 + 1
    ref = torch.nn.InstanceNorm2d(6, track_running_stats=False)(_nchw(x))
    ours = np.asarray(L.instance_norm(jnp.asarray(x)))
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_warp_learn_layernorm_matches_reference_formula():
    # Reference normalizes with x.view(b,-1).std(1) (unbiased) and divides by std+eps
    # (warp_learn/models.py:26-35).
    x = rng.randn(3, 5, 5, 4).astype(np.float32) * 2
    gamma = rng.rand(4).astype(np.float32)
    beta = rng.randn(4).astype(np.float32)
    xt = _nchw(x)
    mean = xt.reshape(3, -1).mean(1).reshape(3, 1, 1, 1)
    std = xt.reshape(3, -1).std(1).reshape(3, 1, 1, 1)
    ref = (xt - mean) / (std + 1e-5)
    ref = ref * torch.from_numpy(gamma).reshape(1, 4, 1, 1) + torch.from_numpy(beta).reshape(1, 4, 1, 1)
    mod = L.WarpLearnLayerNorm(features=4)
    params = {"params": {"gamma": jnp.asarray(gamma), "beta": jnp.asarray(beta)}}
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_batchnorm_inference_matches_torch():
    x = rng.randn(2, 6, 6, 8).astype(np.float32)
    bn = torch.nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(rng.rand(8).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(rng.randn(8).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(rng.randn(8).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(rng.rand(8).astype(np.float32) + 0.5))
    ref = bn(_nchw(x))
    params = {
        "params": {
            "gamma": jnp.asarray(bn.weight.detach().numpy()),
            "beta": jnp.asarray(bn.bias.detach().numpy()),
            "running_mean": jnp.asarray(bn.running_mean.numpy()),
            "running_var": jnp.asarray(bn.running_var.numpy()),
        }
    }
    ours = np.asarray(L.TorchBatchNorm(features=8).apply(params, jnp.asarray(x)))
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_weight_norm_conv_matches_torch():
    conv = torch.nn.Conv2d(5, 7, 3, stride=1, padding=1, bias=True)
    conv = torch.nn.utils.weight_norm(conv, dim=0)
    x = rng.randn(2, 10, 10, 5).astype(np.float32)
    ref = conv(_nchw(x))
    v = conv.weight_v.detach().numpy()  # (out, in, kh, kw)
    g = conv.weight_g.detach().numpy().reshape(-1)
    b = conv.bias.detach().numpy()
    params = {
        "params": {
            "v": jnp.asarray(v.transpose(2, 3, 1, 0)),
            "g": jnp.asarray(g),
            "bias": jnp.asarray(b),
        }
    }
    ours = np.asarray(
        L.WNConv(features=7, kernel_size=3, padding=1).apply(params, jnp.asarray(x))
    )
    assert np.abs(ours - _nhwc(ref)).max() < 1e-4


def test_maxpool_matches_torch():
    x = rng.randn(2, 12, 12, 3).astype(np.float32)
    ref = F.max_pool2d(_nchw(x), 2, stride=2)
    ours = np.asarray(L.max_pool2(jnp.asarray(x)))
    assert np.array_equal(ours, _nhwc(ref))


def test_avgpool_torch_semantics():
    x = rng.randn(2, 9, 9, 3).astype(np.float32)
    ref = torch.nn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)(_nchw(x))
    ours = np.asarray(L.avg_pool_torch(jnp.asarray(x)))
    assert np.abs(ours - _nhwc(ref)).max() < 1e-5


def test_depth_to_space_matches_vunet_gist():
    # Empirically verified: the VUNet gist == TF ordering (r1, r2, c) — NOT pixel_shuffle.
    x = rng.randn(2, 3, 5, 8).astype(np.float32)
    out = np.asarray(L.depth_to_space(jnp.asarray(x), 2))
    import einops

    ref = einops.rearrange(x, "b h w (r1 r2 c) -> b (h r1) (w r2) c", r1=2, r2=2)
    assert np.array_equal(out, ref)


def test_space_to_depth_inverse():
    x = rng.randn(2, 6, 10, 8).astype(np.float32)
    back = np.asarray(L.depth_to_space(L.space_to_depth(jnp.asarray(x), 2), 2))
    assert np.array_equal(back, x)


def test_dropout2d_channel_structure():
    x = jnp.ones((4, 8, 8, 16))
    out = L.dropout2d(x, 0.5, jax.random.PRNGKey(0), deterministic=False)
    out = np.asarray(out)
    # Each (sample, channel) map is either all zero or all 2.0.
    per_chan = out.reshape(4, 64, 16)
    assert set(np.unique(per_chan)).issubset({0.0, 2.0})
    assert np.all((per_chan.min(1) == per_chan.max(1)))
    # Deterministic mode is identity.
    assert np.array_equal(np.asarray(L.dropout2d(x, 0.5, jax.random.PRNGKey(0), True)), np.asarray(x))


def test_elu_matches_torch():
    x = rng.randn(100).astype(np.float32) * 3
    ref = F.elu(torch.from_numpy(x)).numpy()
    ours = np.asarray(L.activation("elu")(jnp.asarray(x)))
    assert np.abs(ours - ref).max() < 1e-6


def test_small_cin_matmul_conv_matches_lax():
    """The tap-stacked-matmul fast path for small-input-channel stride-1 convs
    (layers._conv_small_cin_matmul) is numerically the same conv."""
    import jax

    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(3)
    for (h, w, c, k, p, o) in ((18, 22, 21, 7, 3, 8), (16, 16, 3, 3, 1, 5),
                               (12, 14, 6, 5, 0, 4)):
        x = jnp.asarray(rng.rand(2, h, w, c).astype(np.float32))
        kern = jnp.asarray(rng.rand(k, k, c, o).astype(np.float32) - 0.5)
        fast = L._conv_small_cin_matmul(x, kern, p)
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        assert fast.shape == ref.shape
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref), atol=2e-4)


def test_pallas_small_cin_conv_matches_lax():
    """ops/pallas_conv.conv_small_cin (the TPU stem fast path wired through
    layers._dispatch_conv) is numerically the same VALID conv — interpret mode
    on CPU; the TPU path shares the kernel body."""
    import jax

    from future_urban_scene_generation_tpu.ops.pallas_conv import conv_small_cin

    rng = np.random.RandomState(5)
    for (n, h, w, c, k, o, rows) in ((2, 22, 26, 21, 7, 16, 8),
                                     (1, 19, 20, 3, 3, 8, 8),
                                     (2, 38, 34, 6, 5, 12, 16)):
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        kern = jnp.asarray((rng.rand(k, k, c, o) - 0.5).astype(np.float32))
        got = conv_small_cin(x, kern, rows=rows, interpret=True)
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_pallas_small_cin_conv_v2_matches_lax():
    """ops/pallas_conv.conv_small_cin_v2 (output-lane-packed stem kernel:
    one dot per row tile with kx folded into the output lanes, recovered by a
    k-term shift-sum) is numerically the same VALID conv — interpret mode on
    CPU; the TPU path shares the kernel body."""
    import jax

    from future_urban_scene_generation_tpu.ops.pallas_conv import conv_small_cin_v2

    rng = np.random.RandomState(7)
    for (n, h, w, c, k, o, rows) in ((2, 22, 26, 21, 7, 16, 8),
                                     (1, 19, 20, 3, 3, 8, 8),
                                     (2, 38, 34, 6, 5, 12, 16)):
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        kern = jnp.asarray((rng.rand(k, k, c, o) - 0.5).astype(np.float32))
        got = conv_small_cin_v2(x, kern, rows=rows, interpret=True)
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_pallas_icn_stem_fused_matches_concat_conv():
    """ops/pallas_conv.icn_stem_conv_fused (three-piece BlockSpec assembly: the
    21-channel concat, its layout transpose and the central-patch repeat never
    materialize) computes exactly reflect_pad(3) -> VALID conv of
    concat([sketch, central, planes]) — interpret mode on CPU; the TPU path
    shares the kernel body. Covers s_repeat (central carried per-vehicle and
    block-index-mapped i // s onto the flattened vehicle x step batch)."""
    import jax

    from future_urban_scene_generation_tpu.ops.pallas_conv import (
        icn_stem_conv_fused,
    )

    rng = np.random.RandomState(11)
    for (v, s, h, w, p, k, o, pad) in ((2, 2, 24, 26, 5, 7, 16, 3),
                                       (1, 3, 18, 20, 5, 7, 8, 3),
                                       (3, 1, 21, 19, 2, 5, 8, 2)):
        n = v * s
        c = 3 * (2 + p)
        sketch = jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32))
        central = jnp.asarray(rng.rand(v, h, w, 3).astype(np.float32))
        planes = jnp.asarray(rng.rand(n, p, h, w, 3).astype(np.float32))
        kern = jnp.asarray((rng.rand(k, k, c, o) - 0.5).astype(np.float32))
        got = icn_stem_conv_fused(
            sketch, central, planes, kern, pad=pad, s_repeat=s, interpret=True
        )
        central_rep = jnp.repeat(central, s, axis=0)
        planes_cat = jnp.moveaxis(planes, 1, 3).reshape(n, h, w, 3 * p)
        inp = jnp.concatenate([sketch, central_rep, planes_cat], axis=-1)
        inp = jnp.pad(
            inp, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
        )
        ref = jax.lax.conv_general_dilated(
            inp, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_icn_fused_forward_matches_concat_path():
    """stages._icn_fused_forward (fused Pallas stem + from_stem apply) equals
    the concat-path icn_synthesize_batch output — interpret mode on CPU."""
    from future_urban_scene_generation_tpu.pipeline import stages

    rng = np.random.RandomState(13)
    v, s, res = 1, 2, 64
    n = v * s
    icn_model = stages.Models.modules()[2]
    params = icn_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, res, res, 21), jnp.float32)
    )
    models = stages.Models(
        cad_params=None, hourglass_params=None, icn_params=params,
        vunet_params=None,
    )
    sketches = jnp.asarray(rng.rand(n, res, res, 3).astype(np.float32))
    central = jnp.asarray(
        (rng.rand(v, res, res, 3) * 2 - 1).astype(np.float32)
    )
    planes = jnp.asarray(
        (rng.rand(n, 5, res, res, 3) * 2 - 1).astype(np.float32)
    )
    ref = stages.icn_synthesize_batch(models, sketches, central, planes,
                                      s_repeat=s)
    got = stages._icn_fused_forward(
        models, icn_model, sketches, central, planes, s_repeat=s,
        interpret=True,
    )
    got = stages.cs.lab_to_rgb((got.astype(jnp.float32) + 1.0) / 2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_phase_packed_conv_matches_lax():
    """The 2x2-phase-packed stride-2 rewrite of odd-k stride-1 SAME convs
    (layers._conv_phase_packed — the VUNet 256²/32-channel tail on TPU) is
    numerically the same conv."""
    import jax

    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(8)
    for (n, h, w, c, k, o) in ((2, 16, 20, 64, 3, 32), (1, 12, 12, 32, 3, 32),
                               (2, 10, 14, 48, 5, 16), (1, 8, 8, 32, 1, 32)):
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        kern = jnp.asarray((rng.rand(k, k, c, o) - 0.5).astype(np.float32))
        got = L._conv_phase_packed(x, kern, k // 2)
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((k // 2,) * 2, (k // 2,) * 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_width_folded_1x1_conv_matches_lax():
    """The 4-pixel width-fold block-diag matmul for 1x1 convs
    (layers._conv1x1_width_folded) is numerically the same conv."""
    import jax

    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(9)
    for (n, h, w, c, o) in ((2, 12, 16, 32, 32), (1, 8, 20, 64, 16)):
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        kern = jnp.asarray((rng.rand(1, 1, c, o) - 0.5).astype(np.float32))
        got = L._conv1x1_width_folded(x, kern)
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_small_cout_packed_conv_matches_lax():
    """The row-tap output-packing path for tiny-C_out convs
    (layers._conv_small_cout_packed — the ICN/EdgeConnect heads on TPU) is
    numerically the same conv."""
    import jax

    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(6)
    for (n, h, w, c, k, p, o) in ((2, 20, 24, 64, 7, 3, 3), (1, 16, 18, 32, 3, 1, 1),
                                  (2, 14, 14, 48, 5, 2, 4)):
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        kern = jnp.asarray((rng.rand(k, k, c, o) - 0.5).astype(np.float32))
        got = L._conv_small_cout_packed(x, kern, p)
        ref = jax.lax.conv_general_dilated(
            x, kern, (1, 1), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-4)


def test_upconv2x_fused_matches_reference_composition():
    """The ICN decoder's fused up stage (layers.upconv2x_nearest_reflect:
    nearest-2x upsample + ReflectionPad2d(2) + 5x5 conv rewritten as one
    phase-packed 3x3 conv + depth-to-space with exact border strips) is the
    SAME function as the reference composition, including the 2-pixel borders
    the collapse cannot express (reference pair: warp_learn/models.py:171-180)."""
    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(11)
    # Minimal (4x4), odd, rectangular, and realistic decoder shapes.
    for (n, h, w, c, o) in ((1, 4, 4, 3, 2), (2, 5, 7, 7, 5), (2, 8, 4, 2, 3),
                            (1, 64, 64, 16, 8)):
        x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
        kern = jnp.asarray(rng.randn(5, 5, c, o).astype(np.float32))
        ref = L.upconv2x_nearest_reflect_reference(x, kern)
        fused = L.upconv2x_nearest_reflect(x, kern)
        assert fused.shape == (n, 2 * h, 2 * w, o)
        scale = float(jnp.max(jnp.abs(ref)))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), atol=2e-6 * scale
        )
    # Non-5x5 kernels and sub-4 inputs take the reference path verbatim.
    x = jnp.asarray(rng.randn(1, 3, 3, 2).astype(np.float32))
    kern = jnp.asarray(rng.randn(5, 5, 2, 2).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(L.upconv2x_nearest_reflect(x, kern)),
        np.asarray(L.upconv2x_nearest_reflect_reference(x, kern)),
        rtol=1e-6, atol=1e-6,
    )


def test_upconv2x_fused_gradients_match_reference():
    """ICNTrainer differentiates through the fused up stage; its VJP (through
    the phase conv, depth-to-space, and the border dynamic-update-slices) must
    match the reference composition's VJP."""
    import jax

    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 6, 7, 3).astype(np.float32))
    kern = jnp.asarray(rng.randn(5, 5, 3, 4).astype(np.float32))
    ct = jnp.asarray(rng.randn(2, 12, 14, 4).astype(np.float32))

    def loss_ref(x_, k_):
        return jnp.sum(L.upconv2x_nearest_reflect_reference(x_, k_) * ct)

    def loss_fused(x_, k_):
        return jnp.sum(L.upconv2x_nearest_reflect(x_, k_) * ct)

    gx_r, gk_r = jax.grad(loss_ref, argnums=(0, 1))(x, kern)
    gx_f, gk_f = jax.grad(loss_fused, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_r), atol=1e-4)


def test_upconv2x_fused_bf16_close_to_f32():
    """The bf16 serving path of the fused up stage stays within bf16 rounding
    of the f32 reference composition (the collapse sums taps in f32 before
    casting, so it cannot be less accurate than per-tap bf16 rounding)."""
    from future_urban_scene_generation_tpu.models import layers as L

    rng = np.random.RandomState(13)
    x32 = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    kern = jnp.asarray(rng.randn(5, 5, 8, 4).astype(np.float32))
    ref32 = L.upconv2x_nearest_reflect_reference(x32, kern)
    fused16 = L.upconv2x_nearest_reflect(x32.astype(jnp.bfloat16), kern)
    assert fused16.dtype == jnp.bfloat16
    err = np.abs(np.asarray(fused16, np.float32) - np.asarray(ref32))
    scale = np.abs(np.asarray(ref32)).max()
    assert err.max() / scale < 2e-2, err.max() / scale
