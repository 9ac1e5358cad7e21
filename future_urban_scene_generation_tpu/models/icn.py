"""ICN — the Warp&Learn image completion network (Flax, NHWC).

Parity target: warp_learn/models.py:38-208. `GResnet` is the 21-channel LAB-space
encoder/decoder (content encoder: 7x7 stem + 2 stride-2 downs + 3 instance-norm
ResBlocks; decoder: 3 ResBlocks + 2 nearest-upsample convs with the custom LayerNorm +
7x7 tanh head). `DNLayersMulti` and `gan_loss` port the vestigial training heads
(warp_learn/models.py:211-320) so the framework exposes a trainer for ICN.

Submodule names mirror the torch tree for mechanical checkpoint conversion:
enc_content/model_0..3, dec/model_0..5, nested ResBlocks as model_i/model_j.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from future_urban_scene_generation_tpu.models.layers import (
    TorchConv,
    WarpLearnLayerNorm,
    activation,
    avg_pool_torch,
    instance_norm,
    reflect_pad,
    upconv2x_nearest_reflect,
    zero_pad,
)


class Conv2dBlock(nn.Module):
    """pad -> conv(bias) -> norm -> activation (warp_learn/models.py:38-90)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    norm: str = "none"  # none | inst | ln | batch
    activ: str = "relu"
    pad_type: str = "zero"

    @nn.compact
    def __call__(self, x):
        pad = {"reflect": reflect_pad, "zero": zero_pad}[self.pad_type]
        x = TorchConv(self.features, self.kernel_size, stride=self.stride, name="conv")(
            pad(x, self.padding)
        )
        if self.norm == "inst":
            x = instance_norm(x)
        elif self.norm == "ln":
            x = WarpLearnLayerNorm(self.features, name="norm")(x)
        elif self.norm != "none":
            raise ValueError(f"unsupported norm {self.norm}")
        return activation(self.activ)(x)


class ResBlock(nn.Module):
    """Two Conv2dBlocks with residual add (warp_learn/models.py:93-110)."""

    dim: int
    norm: str = "inst"
    activ: str = "relu"
    pad_type: str = "zero"

    @nn.compact
    def __call__(self, x):
        out = Conv2dBlock(
            self.dim, 3, 1, 1, norm=self.norm, activ=self.activ, pad_type=self.pad_type,
            name="model_0",
        )(x)
        out = Conv2dBlock(
            self.dim, 3, 1, 1, norm=self.norm, activ="none", pad_type=self.pad_type,
            name="model_1",
        )(out)
        return out + x


class ResBlocks(nn.Module):
    num_blocks: int
    dim: int
    norm: str = "inst"
    activ: str = "relu"
    pad_type: str = "zero"

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = ResBlock(
                self.dim, norm=self.norm, activ=self.activ, pad_type=self.pad_type,
                name=f"model_{i}",
            )(x)
        return x


class ContentEncoder(nn.Module):
    """7x7 stem + n_downsample stride-2 convs + ResBlocks (warp_learn/models.py:127-148)."""

    n_downsample: int = 2
    n_res: int = 3
    dim: int = 64
    norm: str = "inst"
    activ: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x, *, from_stem: bool = False):
        dim = self.dim
        if not from_stem:
            x = Conv2dBlock(
                dim, 7, 1, 3, norm=self.norm, activ=self.activ, pad_type="reflect",
                name="model_0",
            )(x)
        for i in range(self.n_downsample):
            x = Conv2dBlock(
                2 * dim, 4, 2, 1, norm=self.norm, activ=self.activ, pad_type="reflect",
                name=f"model_{i + 1}",
            )(x)
            dim *= 2
        x = ResBlocks(
            self.n_res, dim, norm=self.norm, activ=self.activ, pad_type=self.pad_type,
            name=f"model_{self.n_downsample + 1}",
        )(x)
        return x


class _UpConv5(nn.Module):
    """The up-stage 5x5 conv applied to a pre-upsample input via the fused
    phase-decomposed rewrite (layers.upconv2x_nearest_reflect). Param layout
    (conv/kernel (5,5,C,O) + conv/bias) is identical to the TorchConv the
    reference composition used, so checkpoint conversion is unchanged."""

    features: int

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (5, 5, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = upconv2x_nearest_reflect(x, kernel)
        return out + bias.astype(out.dtype)


class UpConv2dBlock(nn.Module):
    """Fused Upsample(2x nearest) + Conv2dBlock(5, 1, 2, norm='ln', reflect):
    exact same function as the reference pair (warp_learn/models.py:171-180),
    computed at source resolution — 36 tap-applications per source pixel
    instead of 100, and no 4x-upsampled HBM intermediate."""

    features: int
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        x = _UpConv5(self.features, name="conv")(x)
        x = WarpLearnLayerNorm(self.features, name="norm")(x)
        return activation(self.activ)(x)


class Decoder(nn.Module):
    """ResBlocks + nearest-up 5x5 'ln' convs + 7x7 tanh head (warp_learn/models.py:162-187)."""

    n_upsample: int = 2
    n_res: int = 3
    dim: int = 256
    output_dim: int = 3
    norm: str = "inst"
    activ: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        dim = self.dim
        x = ResBlocks(
            self.n_res, dim, norm=self.norm, activ=self.activ, pad_type=self.pad_type,
            name="model_0",
        )(x)
        idx = 1
        for _ in range(self.n_upsample):
            idx += 1  # the param-free Upsample module occupies a Sequential slot
            x = UpConv2dBlock(dim // 2, activ=self.activ, name=f"model_{idx}")(x)
            idx += 1
            dim //= 2
        x = Conv2dBlock(
            self.output_dim, 7, 1, 3, norm="none", activ="tanh", pad_type="reflect",
            name=f"model_{idx}",
        )(x)
        return x


class GResnet(nn.Module):
    """G_Resnet (warp_learn/models.py:190-208): input 21ch LAB [-1,1], output 3ch."""

    input_nc: int = 21
    output_nc: int = 3
    num_downs: int = 2
    n_res: int = 3
    ngf: int = 64

    @nn.compact
    def __call__(self, x, *, from_stem: bool = False):
        """``from_stem=True``: ``x`` is the PRE-COMPUTED stem activation
        (post conv+instance-norm+relu of enc_content/model_0) — the serving
        path computes it with the fused three-piece Pallas kernel
        (ops/pallas_conv.icn_stem_conv_fused) so the 21-channel input concat
        never materializes. Param structure is unchanged (init runs the full
        path); apply simply skips model_0."""
        content = ContentEncoder(
            self.num_downs, self.n_res, self.ngf, "inst", "relu", "reflect",
            name="enc_content",
        )(x, from_stem=from_stem)
        return Decoder(
            self.num_downs, self.n_res, self.ngf * (2 ** self.num_downs),
            self.output_nc, "inst", "relu", "reflect", name="dec",
        )(content)


class DNLayersMulti(nn.Module):
    """Multi-scale PatchGAN discriminator (warp_learn/models.py:211-259).

    The torch version registers towers as ``model_0``/``model_1`` Sequentials
    (state-dict keys model_0.0.weight, model_0.2.weight, ...); layer names here fuse
    the tower and Sequential indices (``model_0_0``) to match the converter's
    digit-merging rule. Instance norms are affine-free (no params).
    """

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 2
    num_d: int = 2

    def _tower(self, i: int, ndf: int, x):
        lrelu = activation("lrelu")
        seq = 0
        x = lrelu(TorchConv(ndf, 4, 2, 1, name=f"model_{i}_{seq}")(x))
        seq += 2  # conv + lrelu
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            x = TorchConv(ndf * nf_mult, 4, 2, 1, name=f"model_{i}_{seq}")(x)
            x = lrelu(instance_norm(x))
            seq += 3  # conv + norm + lrelu
        nf_mult = min(2**self.n_layers, 8)
        x = TorchConv(ndf * nf_mult, 4, 1, 1, name=f"model_{i}_{seq}")(x)
        x = lrelu(instance_norm(x))
        seq += 3
        return TorchConv(1, 4, 1, 1, name=f"model_{i}_{seq}")(x)

    @nn.compact
    def __call__(self, x):
        results = []
        down = x
        for i in range(self.num_d):
            ndf_i = int(round(self.ndf / (2**i)))
            results.append(self._tower(i, ndf_i, down))
            if i != self.num_d - 1:
                down = avg_pool_torch(down, 3, 2, 1)
        return results


def gan_loss(
    predictions,
    target_is_real: bool,
    smooth_noise: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
):
    """LSGAN-style MSE objective over multi-scale predictions
    (warp_learn/models.py:262-320). ``smooth_noise`` is the label-smoothing offset in
    [-0.25, 0.25] (pass jax.random.uniform-derived scalar to enable). The mask is
    downsampled with torch F.interpolate's default nearest mode, as in the reference
    (warp_learn/models.py:315)."""
    from future_urban_scene_generation_tpu.ops.resize import resize_nearest

    total = 0.0
    for pred in predictions:
        target = jnp.full_like(pred, 1.0 if target_is_real else 0.0)
        if smooth_noise is not None:
            target = target + smooth_noise
        if mask is not None:
            mask_down = resize_nearest(mask, (pred.shape[1], pred.shape[2]))
            pred = pred * mask_down
            target = target * mask_down
        total = total + jnp.mean((pred - target) ** 2)
    return total
