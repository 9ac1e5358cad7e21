"""tools/: checkpoint-layout validation and the SSIM sign-off plumbing,
exercised with synthetic stand-ins (the real .pth downloads are external)."""
import sys
from pathlib import Path

import numpy as np
import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))
sys.path.insert(0, str(TOOLS.parent))

import fetch_checkpoints  # noqa: E402
import ssim_signoff  # noqa: E402


def _write_png(path, arr):
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def test_fetch_check_reports_missing_and_complete(tmp_path, capsys):
    root = tmp_path / "ckpts"
    root.mkdir()
    assert fetch_checkpoints.check_layout(root) == 1
    out = capsys.readouterr().out
    assert "MISSING" in out and "hourglass.pth" in out

    for rel, _ in fetch_checkpoints.EXPECTED_FILES:
        p = root / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"stub")
    assert fetch_checkpoints.check_layout(root) == 0
    assert "All required checkpoint files present" in capsys.readouterr().out


def test_fetch_main_offline_graceful(tmp_path, monkeypatch, capsys):
    import urllib.request

    def no_net(*a, **k):
        raise OSError("no egress")

    monkeypatch.setattr(urllib.request, "urlopen", no_net)
    rc = fetch_checkpoints.main([str(tmp_path / "dest")])
    assert rc == 1
    out = capsys.readouterr().out
    assert "gdown" in out and fetch_checkpoints.DRIVE_FOLDER_ID in out


def test_compare_trees_identical_and_corrupted(tmp_path):
    rng = np.random.RandomState(0)
    img = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    for branch in ("warp&learn", "vunet"):
        _write_png(ours / branch / "S01_c001" / "0001.png", img)
        _write_png(ref / branch / "S01_c001" / "0001.png", img)
    results = ssim_signoff.compare_trees(ours, ref)
    assert len(results) == 2
    assert all(v is not None and v > 0.999 for _, v in results)

    # Corrupt one reference image: SSIM must drop well below threshold.
    _write_png(ref / "vunet" / "S01_c001" / "0001.png",
               (rng.rand(48, 64, 3) * 255).astype(np.uint8))
    results = dict(ssim_signoff.compare_trees(ours, ref))
    assert results["warp&learn/S01_c001/0001.png"] > 0.999
    assert results["vunet/S01_c001/0001.png"] < 0.5


def test_compare_trees_unmatched_and_shape_mismatch(tmp_path):
    rng = np.random.RandomState(1)
    ours = tmp_path / "ours"
    ref = tmp_path / "ref"
    _write_png(ours / "a" / "1.png", (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    _write_png(ours / "b" / "1.png", (rng.rand(32, 32, 3) * 255).astype(np.uint8))
    _write_png(ref / "b" / "1.png", (rng.rand(16, 16, 3) * 255).astype(np.uint8))
    results = dict(ssim_signoff.compare_trees(ours, ref))
    assert results["a/1.png"] is None  # no reference counterpart
    assert results["b/1.png"] == 0.0  # shape mismatch


def test_signoff_skip_run_end_to_end(tmp_path, capsys):
    """Full main() in --skip-run mode: compares an existing output dir and
    returns pass/fail by threshold (exit 0 iff min SSIM >= 0.99)."""
    rng = np.random.RandomState(2)
    img = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    out_dir = tmp_path / "outs"
    ref_dir = tmp_path / "refs"
    _write_png(out_dir / "vunet" / "x" / "0001.png", img)
    _write_png(ref_dir / "vunet" / "x" / "0001.png", img)
    rc = ssim_signoff.main([
        "v", "k", "c", "--reference-results", str(ref_dir),
        "--select-ids", "1", "--output-dir", str(out_dir), "--skip-run",
    ])
    assert rc == 0
    assert "SIGN-OFF: PASS" in capsys.readouterr().out

    noisy = np.clip(img.astype(int) + rng.randint(-60, 60, img.shape), 0, 255)
    _write_png(ref_dir / "vunet" / "x" / "0001.png", noisy.astype(np.uint8))
    rc = ssim_signoff.main([
        "v", "k", "c", "--reference-results", str(ref_dir),
        "--select-ids", "1", "--output-dir", str(out_dir), "--skip-run",
    ])
    assert rc == 1
    assert "SIGN-OFF: FAIL" in capsys.readouterr().out


def test_scene_profile_parse_trace(tmp_path):
    """tools/scene_profile.parse_trace aggregates per-fusg-scope device time
    from a jax.profiler Chrome trace (the stage-budget tool behind the
    README's per-scene numbers). Op-level events only exist in TPU traces, so
    this builds a synthetic vm.trace.json.gz with the TPU layout: an "XLA Ops"
    thread whose events carry fusg scopes in args.long_name."""
    import gzip
    import json

    import scene_profile

    events = [
        {"ph": "M", "pid": 1, "tid": 7, "name": "thread_name",
         "args": {"name": "/device:TPU:0 XLA Ops"}},
        {"ph": "M", "pid": 1, "tid": 9, "name": "thread_name",
         "args": {"name": "python"}},
        # Two ops in fusg.icn, one in fusg.render, one unattributed.
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.1", "dur": 1500.0,
         "args": {"long_name": "jit(run)/fusg.icn/conv_general_dilated",
                  "hlo_category": "convolution fusion",
                  "model_flops": "3000000000", "bytes_accessed": 1.5e8}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.2", "dur": 500.0,
         "args": {"long_name": "jit(run)/fusg.icn/add",
                  "hlo_category": "loop fusion",
                  "model_flops": 1e9, "bytes_accessed": 5e7}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "custom-call.3", "dur": 250.0,
         "args": {"long_name": "jit(run)/fusg.render/pallas_call",
                  "hlo_category": "custom call"}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "copy.4", "dur": 100.0,
         "args": {"long_name": "jit(run)/copy", "hlo_category": "copy"}},
        # Host-thread event must be ignored.
        {"ph": "X", "pid": 1, "tid": 9, "name": "hostwork", "dur": 9e9,
         "args": {}},
    ]
    tdir = tmp_path / "trace" / "plugins" / "profile" / "2026_01_01"
    tdir.mkdir(parents=True)
    with gzip.open(tdir / "vm.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)

    scopes, ops, cost = scene_profile.parse_trace(str(tmp_path / "trace"))
    assert scopes["fusg.icn"] == 2000.0
    assert scopes["fusg.render"] == 250.0
    assert scopes["unattributed"] == 100.0
    assert scopes["TOTAL"] == 2350.0
    assert ops["fusion.1"][0] == 1500.0 and ops["fusion.1"][2] == "fusg.icn"
    # Roofline inputs aggregate per scope (string or numeric annotations);
    # ops without cost annotations contribute zero, not a crash.
    assert cost["fusg.icn"] == [4e9, 2e8]
    assert cost["fusg.render"] == [0.0, 0.0]
    assert cost["TOTAL"] == [4e9, 2e8]


def test_bench_transient_backend_error_classifier():
    """bench retries (re-execs) on transient axon-tunnel failures instead of
    recording a 0.0-fps round; everything else still fails fast with the
    error JSON line."""
    import bench

    assert bench._is_transient_backend_error(
        RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU backend "
            "setup/compile error (Unavailable)."
        )
    )
    assert not bench._is_transient_backend_error(ValueError("shape mismatch"))
