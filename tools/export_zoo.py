#!/usr/bin/env python
"""Export training runs to the reference's checkpoint tree (.pth files).

Takes the Orbax checkpoints written by ``cli/train.py`` and writes the exact
file layout the reference's ``run_test.py:24-89`` / ``edgeconnect/models.py:
20-52`` load: ``kpoints/hourglass.pth``, ``icn/256_synth/gnet_00020.pth``,
``vunet/256/vunet.pth``, ``inpainting/{EdgeModel,InpaintingModel}_gen.pth``,
``cads/model.pth`` — torch state dicts in the reference's key names/layouts
(models/convert.export_state_dict, templates from tools/gen_zoo_template.py).
Weights trained in this framework then drop into the reference unchanged, and
round-trip back through pipeline/checkpoint.load_reference_model_zoo.

    python tools/export_zoo.py --runs icn=<dir> hourglass=<dir> ... --out <ckpt_dir>

Each <dir> is a ``cli/train.py --out`` directory (containing ``checkpoint/``).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Reference checkpoint-tree location per model (run_test.py:54-87).
ZOO_PATHS = {
    "hourglass": "kpoints/hourglass.pth",
    "icn": "icn/256_synth/gnet_00020.pth",
    "vunet": "vunet/256/vunet.pth",
    "edge": "inpainting/EdgeModel_gen.pth",
    "inpaint": "inpainting/InpaintingModel_gen.pth",
    "cad": "cads/model.pth",
}
# EdgeConnect checkpoints nest the weights under "generator" with an iteration
# counter (edgeconnect/models.py:20-41).
WRAP_GENERATOR = {"edge", "inpaint"}


def generator_params(state):
    """Pull the generator/model flax params out of a restored train state.

    cli/train.py saves either a ``GANTrainState`` (pipeline/training.py:30-41;
    Orbax restores the NamedTuple as a dict keyed by field name) or a plain
    ``(params, opt_state)`` pair whose element 0 is the weight tree.
    """
    if isinstance(state, dict):
        if "gen_params" in state:  # restored GANTrainState
            return state["gen_params"]
        return state  # already a bare params tree
    tree = state[0]
    if not (isinstance(tree, dict) and ("params" in tree or tree)):
        raise ValueError(f"cannot locate params in restored state ({type(state)})")
    return tree


def export_run(model: str, run_dir: Path, out_root: Path, template: dict,
               iteration: int = 0) -> Path:
    import numpy as np
    import torch

    from future_urban_scene_generation_tpu.models.convert import export_state_dict
    from future_urban_scene_generation_tpu.pipeline import checkpoint

    ckpt = run_dir / "checkpoint" if (run_dir / "checkpoint").exists() else run_dir
    state = checkpoint.restore(ckpt)
    params = generator_params(state)
    if model == "cad":
        # Inverse of convert_vgg19_classifier's import nesting: the flax
        # VGG19Classifier holds the conv trunk under a 'trunk' submodule
        # (models/vgg.py), while the torch template addresses features_* at
        # top level next to classifier_*.
        tree = params.get("params", params)
        if "trunk" in tree:
            tree = {k: v for k, v in tree.items() if k != "trunk"} | tree["trunk"]
            params = {"params": tree}
    entry = template[model]
    sd_np = export_state_dict(
        params,
        entry["keys"],
        convt_keys=tuple(entry.get("convt_keys") or ()),
        flatten_linear_key=entry.get("flatten_linear_key"),
        flatten_linear_chw=(tuple(entry["flatten_linear_chw"])
                            if entry.get("flatten_linear_chw") else None),
    )
    sd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
          for k, v in sd_np.items()}
    dest = out_root / ZOO_PATHS[model]
    dest.parent.mkdir(parents=True, exist_ok=True)
    if model in WRAP_GENERATOR:
        torch.save({"iteration": int(iteration), "generator": sd}, dest)
    else:
        torch.save(sd, dest)
    return dest


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", nargs="+", metavar="MODEL=DIR", required=True,
                    help="model=train-run-dir pairs; models: "
                         + ",".join(ZOO_PATHS))
    ap.add_argument("--out", type=Path, required=True,
                    help="checkpoint tree root to write (reference layout)")
    ap.add_argument("--template", type=Path,
                    default=REPO / "tests" / "fixtures" / "zoo_template.json")
    args = ap.parse_args(argv)

    template = json.loads(args.template.read_text())
    for pair in args.runs:
        model, _, run = pair.partition("=")
        if model not in ZOO_PATHS:
            raise SystemExit(f"unknown model {model!r}; choose from {list(ZOO_PATHS)}")
        dest = export_run(model, Path(run), args.out, template)
        print(f"exported {model}: {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
