"""EdgeConnect two-stage inpainting networks and losses (Flax, NHWC).

Parity target: edgeconnect/networks.py:37-210 and edgeconnect/loss.py:6-99.

* ``EdgeGenerator`` — 3ch (masked gray + masked edge + mask) -> 1ch edge map,
  spectral-normed convs (folded to plain weights at conversion — inference uses
  torch's eval-mode effective weight), 8 dilation-2 resblocks, sigmoid.
* ``InpaintGenerator`` — 4ch (masked RGB + edge) -> 3ch, (tanh+1)/2.
* ``ECDiscriminator`` — 70x70-style PatchGAN returning per-layer feature taps.
* ``edge_model_forward`` / ``inpaint_model_forward`` — the input masking wrappers
  (edgeconnect/models.py:130-135, 236-240).
* ``adversarial_loss`` (nsgan | lsgan | hinge), style/perceptual losses via the shared
  VGG19 feature extractor (models/vgg.py).

Layer names fuse torch Sequential indices (encoder_1, middle_0/conv_block_1,
decoder_0, conv1_0, ...) for mechanical conversion of the reference checkpoints
(EdgeModel_gen.pth / InpaintingModel_gen.pth store {"iteration", "generator"}).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from future_urban_scene_generation_tpu.models.layers import (
    SNConv,
    SNConvTranspose,
    TorchConv,
    TorchConvTranspose,
    activation,
    instance_norm,
    reflect_pad,
)

# Torch keys of ConvTranspose2d weights in the generators (needed by the converter).
EDGECONNECT_CONVT_KEYS = ("decoder.0.weight", "decoder.3.weight")


class ECResnetBlock(nn.Module):
    """Dilated residual block (edgeconnect/networks.py:184-203). torch sets
    bias = not use_spectral_norm, so the edge generator's blocks are bias-free while
    the inpaint generator's keep bias."""

    dim: int
    dilation: int = 2
    conv_bias: bool = True
    spectral: bool = False

    @nn.compact
    def __call__(self, x):
        conv = SNConv if self.spectral else TorchConv
        relu = activation("relu")
        out = reflect_pad(x, self.dilation)
        out = conv(
            self.dim, 3, dilation=self.dilation, use_bias=self.conv_bias,
            name="conv_block_1",
        )(out)
        out = relu(instance_norm(out))
        out = reflect_pad(out, 1)
        out = conv(self.dim, 3, use_bias=self.conv_bias, name="conv_block_5")(out)
        out = instance_norm(out)
        return x + out


def _generator_trunk(
    x, out_features: int, residual_blocks: int, resblock_bias: bool,
    spectral: bool = False,
):
    """Shared encoder/middle/decoder trunk. Called inside a generator's compact
    context so its layers register directly on the generator (torch has no extra
    nesting level: keys are encoder.1.weight, middle.0..., decoder.0...).

    Encoder/decoder convs always keep bias (torch passes no bias= there); only the
    resblocks differ between the two generators (bias = not use_spectral_norm).
    ``spectral=True`` (training-mode edge generator — torch spectral_norms EVERY
    conv/convT in it, networks.py:213-217) swaps in power-iteration SN layers;
    inference from converted checkpoints keeps plain convs with folded weights."""
    conv = SNConv if spectral else TorchConv
    convt = SNConvTranspose if spectral else TorchConvTranspose
    relu = activation("relu")
    x = reflect_pad(x, 3)
    x = conv(64, 7, name="encoder_1")(x)
    x = relu(instance_norm(x))
    x = conv(128, 4, 2, 1, name="encoder_4")(x)
    x = relu(instance_norm(x))
    x = conv(256, 4, 2, 1, name="encoder_7")(x)
    x = relu(instance_norm(x))

    for i in range(residual_blocks):
        x = ECResnetBlock(
            256, conv_bias=resblock_bias, spectral=spectral, name=f"middle_{i}"
        )(x)

    x = convt(128, 4, 2, 1, name="decoder_0")(x)
    x = relu(instance_norm(x))
    x = convt(64, 4, 2, 1, name="decoder_3")(x)
    x = relu(instance_norm(x))
    x = reflect_pad(x, 3)
    return conv(out_features, 7, name="decoder_7")(x)


class EdgeGenerator(nn.Module):
    """edgeconnect/networks.py:88-135. Spectral-normed (folded at conversion);
    resblocks are bias-free (bias = not use_spectral_norm)."""

    residual_blocks: int = 8
    spectral: bool = False

    @nn.compact
    def __call__(self, x):
        out = _generator_trunk(
            x, 1, self.residual_blocks, resblock_bias=False, spectral=self.spectral
        )
        return activation("sigmoid")(out)


class InpaintGenerator(nn.Module):
    """edgeconnect/networks.py:37-85 (plain convs with bias)."""

    residual_blocks: int = 8

    @nn.compact
    def __call__(self, x):
        out = _generator_trunk(x, 3, self.residual_blocks, resblock_bias=True)
        return (jnp.tanh(out) + 1.0) / 2.0


class ECDiscriminator(nn.Module):
    """PatchGAN with feature taps (edgeconnect/networks.py:138-181).

    ``spectral=True`` (training mode) uses power-iteration spectral norm like the
    torch original; False (converted-checkpoint inference) uses plain folded convs.
    """

    in_channels: int
    use_sigmoid: bool = True
    spectral: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
        conv = SNConv if self.spectral else TorchConv
        lrelu = activation("lrelu")
        c1 = lrelu(conv(64, 4, 2, 1, use_bias=False, name="conv1_0")(x))
        c2 = lrelu(conv(128, 4, 2, 1, use_bias=False, name="conv2_0")(c1))
        c3 = lrelu(conv(256, 4, 2, 1, use_bias=False, name="conv3_0")(c2))
        c4 = lrelu(conv(512, 4, 1, 1, use_bias=False, name="conv4_0")(c3))
        c5 = conv(1, 4, 1, 1, use_bias=False, name="conv5_0")(c4)
        out = activation("sigmoid")(c5) if self.use_sigmoid else c5
        return out, [c1, c2, c3, c4, c5]


def edge_model_forward(params, images_gray, edges, masks, generator=None, mutable=False):
    """EdgeModel.forward (edgeconnect/models.py:130-135): mask the inputs, concat,
    generate. All tensors NHWC in [0, 1]; mask 1 = hole. ``mutable`` forwards to
    apply (used by the trainer to advance the generator's SN power iteration)."""
    generator = generator or EdgeGenerator()
    edges_masked = edges * (1.0 - masks)
    images_masked = images_gray * (1.0 - masks) + masks
    inputs = jnp.concatenate([images_masked, edges_masked, masks], axis=-1)
    if mutable:
        return generator.apply(params, inputs, mutable=mutable)
    return generator.apply(params, inputs)


def inpaint_model_forward(params, images, edges, masks, generator=None):
    """InpaintingModel.forward (edgeconnect/models.py:236-240)."""
    generator = generator or InpaintGenerator()
    images_masked = images * (1.0 - masks) + masks
    inputs = jnp.concatenate([images_masked, edges], axis=-1)
    return generator.apply(params, inputs)


# ---------------------------------------------------------------------------
# Losses (edgeconnect/loss.py)
# ---------------------------------------------------------------------------

def adversarial_loss(outputs, is_real: bool, is_disc: bool = False, kind: str = "nsgan"):
    """edgeconnect/loss.py:6-42. nsgan = BCE on sigmoid outputs; lsgan = MSE;
    hinge = relu margins for D, -mean for G."""
    if kind == "hinge":
        if is_disc:
            o = -outputs if is_real else outputs
            return jnp.mean(jax.nn.relu(1.0 + o))
        return jnp.mean(-outputs)
    label = 1.0 if is_real else 0.0
    if kind == "nsgan":
        eps = 1e-12
        o = jnp.clip(outputs, eps, 1.0 - eps)
        return -jnp.mean(label * jnp.log(o) + (1.0 - label) * jnp.log(1.0 - o))
    if kind == "lsgan":
        return jnp.mean((outputs - label) ** 2)
    raise ValueError(kind)


def gram_matrix(feat: jnp.ndarray) -> jnp.ndarray:
    """Gram of NHWC features: (B, C, C) / (H * W * C) (edgeconnect/loss.py:55-61)."""
    b, h, w, c = feat.shape
    f = feat.reshape(b, h * w, c)
    return jnp.einsum("bnc,bnd->bcd", f, f) / (h * w * c)


STYLE_TAPS = ("relu2_2", "relu3_4", "relu4_4", "relu5_2")
PERCEPTUAL_TAPS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")


def style_loss(feats_x: Dict[str, jnp.ndarray], feats_y: Dict[str, jnp.ndarray]):
    """Gram-matrix L1 over the reference's 4 taps (edgeconnect/loss.py:63-74)."""
    total = 0.0
    for tap in STYLE_TAPS:
        total = total + jnp.mean(jnp.abs(gram_matrix(feats_x[tap]) - gram_matrix(feats_y[tap])))
    return total


def perceptual_loss(feats_x, feats_y, weights=(1.0, 1.0, 1.0, 1.0, 1.0)):
    """L1 over the 5 relu*_1 taps (edgeconnect/loss.py:88-99)."""
    total = 0.0
    for w, tap in zip(weights, PERCEPTUAL_TAPS):
        total = total + w * jnp.mean(jnp.abs(feats_x[tap] - feats_y[tap]))
    return total
