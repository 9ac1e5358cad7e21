#!/usr/bin/env python
"""Generate tests/fixtures/zoo_template.json — the torch state-dict key/shape
templates of the reference's five-checkpoint model zoo (run_test.py:24-89).

The template drives models/convert.export_state_dict (flax -> torch), making
trained TPU weights loadable by the reference's own load_state_dict calls.
Requires /root/reference mounted; the committed JSON is the reproducible
artifact so the exporter itself needs no reference checkout.

    python tools/gen_zoo_template.py [--out tests/fixtures/zoo_template.json]
"""
import argparse
import json
import sys
import types
from pathlib import Path

REF = Path("/root/reference")


def install_stubs():
    """torchvision.transforms stub — warp_learn.models imports ToTensor/Normalize."""
    import numpy as np
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")

        class ToTensor:
            def __call__(self, img):
                t = torch.from_numpy(np.ascontiguousarray(np.asarray(img)))
                if t.dtype == torch.uint8:
                    t = t.float() / 255.0
                return t.permute(2, 0, 1)

        class Normalize:
            def __init__(self, mean, std):
                self.mean, self.std = mean, std

            def __call__(self, t):
                mean = torch.as_tensor(self.mean, dtype=t.dtype)[:, None, None]
                std = torch.as_tensor(self.std, dtype=t.dtype)[:, None, None]
                return (t - mean) / std

        tr.ToTensor, tr.Normalize = ToTensor, Normalize
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr


def vgg19_template():
    """torchvision vgg19 key/shape table (handwritten from the published
    architecture: cfg E convs + 3-layer classifier, classifier[6] -> 10 classes
    as run_test.py:48-58 rebuilds it). torchvision itself is absent here."""
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    keys = {}
    idx, cin = 0, 3
    for v in cfg:
        if v == "M":
            idx += 1
            continue
        keys[f"features.{idx}.weight"] = [v, cin, 3, 3]
        keys[f"features.{idx}.bias"] = [v]
        cin = v
        idx += 2  # conv + relu
    keys["classifier.0.weight"] = [4096, 25088]
    keys["classifier.0.bias"] = [4096]
    keys["classifier.3.weight"] = [4096, 4096]
    keys["classifier.3.bias"] = [4096]
    keys["classifier.6.weight"] = [10, 4096]
    keys["classifier.6.bias"] = [10]
    return keys


def sd_shapes(module):
    return {k: list(v.shape) for k, v in module.state_dict().items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=Path,
                    default=Path(__file__).resolve().parent.parent
                    / "tests" / "fixtures" / "zoo_template.json")
    args = ap.parse_args(argv)

    if not REF.exists():
        print("reference not mounted; cannot regenerate", file=sys.stderr)
        return 1
    sys.path.insert(0, str(REF))
    install_stubs()

    import torch  # noqa: F401
    from argparse import Namespace

    from stacked_hourglass.models import HourglassNet
    from warp_learn.models import G_Resnet
    from vunet.models import Vunet_fix_res
    from edgeconnect.networks import EdgeGenerator, InpaintGenerator

    template = {
        # run_test.py:60-70 — plain state dict
        "hourglass": {
            "keys": sd_shapes(HourglassNet(num_stacks=2, num_blocks=1,
                                           num_classes=12)),
            "wrapper": None,
        },
        # run_test.py:72-78 — plain state dict
        "icn": {"keys": sd_shapes(G_Resnet(21)), "wrapper": None},
        # run_test.py:80-87 — plain state dict (w_norm => weight_v/weight_g)
        "vunet": {
            "keys": sd_shapes(Vunet_fix_res(Namespace(
                up_mode="subpixel", w_norm=True, drop_prob=0.2,
                vunet_256=True))),
            "wrapper": None,
        },
        # edgeconnect/models.py:20-52 — {"iteration", "generator"} wrapper;
        # EdgeGenerator is spectral-normed (weight_orig/u/v triples)
        "edge": {
            "keys": sd_shapes(EdgeGenerator(use_spectral_norm=True)),
            "wrapper": "generator",
            "convt_keys": ["decoder.0.weight", "decoder.3.weight"],
        },
        "inpaint": {
            "keys": sd_shapes(InpaintGenerator()),
            "wrapper": "generator",
            "convt_keys": ["decoder.0.weight", "decoder.3.weight"],
        },
        # run_test.py:45-58 — torchvision vgg19 with classifier[6] -> 10
        "cad": {
            "keys": vgg19_template(),
            "wrapper": None,
            "flatten_linear_key": "classifier.0.weight",
            "flatten_linear_chw": [512, 7, 7],
        },
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    args.out.write_text(json.dumps(template, indent=0) + "\n")
    n = {m: len(t["keys"]) for m, t in template.items()}
    print(f"wrote {args.out} — key counts {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
