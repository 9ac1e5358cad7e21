"""Train -> export -> reference-layout .pth -> convert -> serve params: the full
trained-weights loop (VERDICT r2 item 2 offline proxy).

The reference's real checkpoints are unreachable downloads (run_test.py:54-87,
README.md:56-60), so this proves the entire chain they would travel: weights
TRAINED in this framework (cli/train.py), exported to the reference's exact
checkpoint tree (tools/export_zoo.py -> kpoints/hourglass.pth,
icn/256_synth/gnet_00020.pth), then loaded back through the serving converter
(pipeline/checkpoint.load_reference_model_zoo) — landing bit-identical to the
trained weights. Real downloaded checkpoints are a pure drop-in for the middle
of this chain; tools/ssim_signoff.py then closes the fidelity number.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _trees_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            _trees_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-6,
                err_msg=f"{path}/{k}",
            )


def test_train_export_serve_chain(tmp_path):
    import json

    from future_urban_scene_generation_tpu.cli import train
    from future_urban_scene_generation_tpu.pipeline import checkpoint

    sys.path.insert(0, str(REPO / "tools"))
    try:
        import export_zoo
    finally:
        sys.path.remove(str(REPO / "tools"))

    template = json.loads(
        (REPO / "tests" / "fixtures" / "zoo_template.json").read_text()
    )

    runs = {}
    for model in ("hourglass", "icn", "cad"):
        out = tmp_path / f"run_{model}"
        rc = train.main([
            "--model", model, "--steps", "2", "--batch", "2",
            "--image-size", "64", "--save-interval", "1",
            "--out", str(out),
        ])
        assert rc == 0 and (out / "checkpoint").exists()
        runs[model] = out

    ckpt_root = tmp_path / "checkpoints"
    for model, run in runs.items():
        dest = export_zoo.export_run(model, run, ckpt_root, template)
        assert dest.exists()
    assert (ckpt_root / "kpoints" / "hourglass.pth").exists()
    assert (ckpt_root / "icn" / "256_synth" / "gnet_00020.pth").exists()
    assert (ckpt_root / "cads" / "model.pth").exists()

    # Serve path: the zoo converter must land exactly on the trained weights
    # (cad additionally pins the trunk-nesting round trip: the flax classifier
    # holds features_* under 'trunk', the torch layout is flat — export
    # flattens, import re-nests).
    zoo = checkpoint.load_reference_model_zoo(ckpt_root, cache=False)
    assert set(zoo) >= {"hourglass", "icn", "cad"}
    for model in ("hourglass", "icn", "cad"):
        trained = export_zoo.generator_params(
            checkpoint.restore(runs[model] / "checkpoint")
        )
        trained = trained.get("params", trained)
        served = zoo[model]
        served = served.get("params", served)
        _trees_equal(trained, served, model)
