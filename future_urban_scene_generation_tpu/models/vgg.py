"""VGG19: feature extractor (loss taps) + the 10-way CAD-shape classifier head.

Two reference uses:
* CAD classifier — torchvision vgg19 with classifier[6] swapped to Linear(4096, 10),
  argmax picks the Pascal3D+ CAD mesh (run_test.py:45-58, trajectory_inference.py:68-69).
* Loss features — the 16 relu taps consumed by EdgeConnect's style/perceptual losses
  (edgeconnect/loss.py:102-224).

One conv trunk serves both. Layer names follow torchvision's Sequential indices
(features_0, features_2, ..., classifier_0/3/6) so torchvision/reference checkpoints
convert mechanically (flatten_linear_key="classifier.0.weight", chw=(512, 7, 7)).
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from future_urban_scene_generation_tpu.models.layers import (
    TorchConv,
    TorchLinear,
    activation,
    adaptive_avg_pool,
    max_pool2,
)

# torchvision vgg19 'features' Sequential: conv indices and the relu tap names after
# each (edgeconnect/loss.py:127-173). 'M' marks MaxPool positions.
_VGG19_PLAN = (
    (0, 64, "relu1_1"),
    (2, 64, "relu1_2"),
    ("M",),
    (5, 128, "relu2_1"),
    (7, 128, "relu2_2"),
    ("M",),
    (10, 256, "relu3_1"),
    (12, 256, "relu3_2"),
    (14, 256, "relu3_3"),
    (16, 256, "relu3_4"),
    ("M",),
    (19, 512, "relu4_1"),
    (21, 512, "relu4_2"),
    (23, 512, "relu4_3"),
    (25, 512, "relu4_4"),
    ("M",),
    (28, 512, "relu5_1"),
    (30, 512, "relu5_2"),
    (32, 512, "relu5_3"),
    (34, 512, "relu5_4"),
    ("M",),
)


class VGG19Features(nn.Module):
    """The conv trunk with named relu taps. Input: ImageNet-normalized NHWC."""

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        relu = activation("relu")
        taps: Dict[str, jnp.ndarray] = {}
        for entry in _VGG19_PLAN:
            if entry[0] == "M":
                x = max_pool2(x)
            else:
                idx, ch, tap = entry
                x = relu(TorchConv(ch, 3, padding=1, name=f"features_{idx}")(x))
                taps[tap] = x
        taps["final"] = x
        return taps


class VGG19Classifier(nn.Module):
    """Full torchvision vgg19 with a ``num_classes``-way final linear — the CAD head."""

    num_classes: int = 10

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        feats = VGG19Features(name="trunk")(x)["final"]
        pooled = adaptive_avg_pool(feats, (7, 7))
        flat = pooled.reshape(pooled.shape[0], -1)  # HWC order; converter permutes
        relu = activation("relu")
        h = relu(TorchLinear(4096, name="classifier_0")(flat))
        h = relu(TorchLinear(4096, name="classifier_3")(h))
        return TorchLinear(self.num_classes, name="classifier_6")(h)


def convert_vgg19_features(sd) -> dict:
    """Convert the conv-trunk slice of a torchvision-style vgg19 state dict into
    ``VGG19Features`` params.

    Accepts the full torchvision ``vgg19(pretrained=True).state_dict()`` (what the
    reference's loss VGG loads, edgeconnect/loss.py:102-224), the CAD classifier
    checkpoint (same trunk), or a bare ``features.*`` dict; an optional
    ``vgg.``/``module.`` prefix is stripped. Classifier entries are ignored.
    """
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict

    feats = {}
    for k, v in sd.items():
        for pre in ("module.", "vgg.", ""):
            if k.startswith(pre + "features."):
                feats[k[len(pre):]] = v
                break
    if not feats:
        raise ValueError(
            "state dict has no 'features.N.*' entries — not a VGG19 trunk"
        )
    params = convert_state_dict(feats)["params"]
    return {"params": params}


def convert_vgg19_classifier(sd) -> dict:
    """Convert a torchvision-style vgg19 state dict (with 10-way classifier[6])."""
    from future_urban_scene_generation_tpu.models.convert import convert_state_dict

    converted = convert_state_dict(
        sd,
        flatten_linear_key="classifier.0.weight",
        flatten_linear_chw=(512, 7, 7),
    )
    params = converted["params"]
    # features_* live under the 'trunk' submodule in VGG19Classifier.
    trunk = {k: v for k, v in params.items() if k.startswith("features_")}
    rest = {k: v for k, v in params.items() if not k.startswith("features_")}
    return {"params": {"trunk": trunk, **rest}}
