"""Stacked hourglass keypoint network (Flax, NHWC).

Architecture parity with the reference (stacked_hourglass/models.py:5-167):
pre-activation Bottleneck (expansion 2), recursive depth-4 hourglass, 2 stacks with
intermediate supervision, 12 heatmap classes on 64x64 maps from 256x256 inputs.

Submodule names mirror the torch module tree (see models/convert.py) so checkpoints
convert mechanically: conv1/bn1/layer1_0/.../hg_0 (a Hourglass whose bottlenecks are
hg_<depth>_<branch>_<block>), res_0_0, fc_0_0 (conv) + fc_0_1 (bn), score_0,
fc__0, score__0.
"""
from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
from flax import linen as nn

from future_urban_scene_generation_tpu.models.layers import (
    TorchBatchNorm,
    TorchConv,
    activation,
    max_pool2,
    upsample2x_nearest_nhwc,
)


class Bottleneck(nn.Module):
    """Pre-activation bottleneck, expansion 2 (stacked_hourglass/models.py:5-42)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    train: bool = False

    @nn.compact
    def __call__(self, x):
        relu = activation("relu")
        out = TorchConv(self.planes, 1, name="conv1")(
            relu(TorchBatchNorm(x.shape[-1], train=self.train, name="bn1")(x))
        )
        out = TorchConv(self.planes, 3, stride=self.stride, padding=1, name="conv2")(
            relu(TorchBatchNorm(self.planes, train=self.train, name="bn2")(out))
        )
        out = TorchConv(self.planes * 2, 1, name="conv3")(
            relu(TorchBatchNorm(self.planes, train=self.train, name="bn3")(out))
        )
        residual = x
        if self.downsample:
            residual = TorchConv(
                self.planes * 2, 1, stride=self.stride, name="downsample_0"
            )(x)
        return out + residual


class Hourglass(nn.Module):
    """Recursive hourglass of given depth over ``planes * 2`` channels
    (stacked_hourglass/models.py:45-86). Returns (out, innermost_feats)."""

    planes: int
    depth: int = 4
    num_blocks: int = 1
    train: bool = False

    def _residual_chain(self, i: int, j: int, x):
        for b in range(self.num_blocks):
            x = Bottleneck(self.planes, train=self.train, name=f"hg_{i}_{j}_{b}")(x)
        return x

    @nn.compact
    def __call__(self, x):
        def forward(n, x):
            up1 = self._residual_chain(n - 1, 0, x)
            low1 = max_pool2(x)
            low1 = self._residual_chain(n - 1, 1, low1)
            if n > 1:
                low2, feats = forward(n - 1, low1)
            else:
                feats = self._residual_chain(n - 1, 3, low1)
                low2 = feats
            low3 = self._residual_chain(n - 1, 2, low2)
            up2 = upsample2x_nearest_nhwc(low3)
            return up1 + up2, feats

        return forward(self.depth, x)


class HourglassNet(nn.Module):
    """2-stack hourglass head producing per-stack (B, 64, 64, num_classes) heatmaps
    (stacked_hourglass/models.py:89-167). Input: ImageNet-normalized (B, 256, 256, 3)."""

    num_stacks: int = 2
    num_blocks: int = 1
    num_classes: int = 12
    num_feats: int = 128
    train: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, List[jnp.ndarray]]:
        t = self.train
        relu = activation("relu")
        x = TorchConv(64, 7, stride=2, padding=3, name="conv1")(x)
        x = relu(TorchBatchNorm(64, train=t, name="bn1")(x))
        x = Bottleneck(64, downsample=True, train=t, name="layer1_0")(x)
        x = max_pool2(x)
        x = Bottleneck(128, downsample=True, train=t, name="layer2_0")(x)
        x = Bottleneck(self.num_feats, train=t, name="layer3_0")(x)

        ch = self.num_feats * 2
        heatmaps = []
        for i in range(self.num_stacks):
            y, _ = Hourglass(
                self.num_feats, depth=4, num_blocks=self.num_blocks, train=t,
                name=f"hg_{i}",
            )(x)
            for b in range(self.num_blocks):
                y = Bottleneck(self.num_feats, train=t, name=f"res_{i}_{b}")(y)
            # fc: conv1x1 -> bn -> relu (stacked_hourglass/models.py:136-139)
            y = TorchConv(ch, 1, name=f"fc_{i}_0")(y)
            y = relu(TorchBatchNorm(ch, train=t, name=f"fc_{i}_1")(y))
            score = TorchConv(self.num_classes, 1, name=f"score_{i}")(y)
            heatmaps.append(score)
            if i < self.num_stacks - 1:
                fc_ = TorchConv(ch, 1, name=f"fc__{i}")(y)
                score_ = TorchConv(ch, 1, name=f"score__{i}")(score)
                x = x + fc_ + score_
        return {"heatmaps": heatmaps}


def decode_heatmaps(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Per-channel argmax -> normalized (x, y) in [0, 1].

    Replaces the reference's host loop over np.unravel_index (utils/keypoint_utils.py:66-92)
    with a batched argmax. The reference first nearest-upsamples 64->256 then argmaxes
    (trajectory_inference.py:77); a nearest upsample cannot change which cell wins, and
    maps winning cell c to pixel 4c, so coordinates here are computed directly from the
    64-grid as (4 * c) / 256 — bit-identical to the reference path.

    heatmaps: (..., H, W, K) -> (..., K, 2) with (x, y) in [0, 1].
    """
    h, w, k = heatmaps.shape[-3], heatmaps.shape[-2], heatmaps.shape[-1]
    up = 256 // h
    flat = heatmaps.reshape(heatmaps.shape[:-3] + (h * w, k))
    idx = jnp.argmax(flat, axis=-2)  # (..., K)
    ys = idx // w
    xs = idx % w
    x_norm = (xs * up).astype(jnp.float32) / (w * up)
    y_norm = (ys * up).astype(jnp.float32) / (h * up)
    return jnp.stack([x_norm, y_norm], axis=-1)
