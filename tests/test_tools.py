"""tools/: checkpoint-layout validation and the SSIM sign-off plumbing,
exercised with synthetic stand-ins (the real .pth downloads are external)."""
import sys
from pathlib import Path

import numpy as np
import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

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
