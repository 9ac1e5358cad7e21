"""Headless CLI + SceneService end-to-end on a synthetic on-disk dataset."""
from pathlib import Path

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """CityFlow-shaped directory: S01/c001/{frames/, calibration.txt, mtsc/...},
    with intrinsic.npy two levels up (trajectory_inference.py:99)."""
    root = tmp_path_factory.mktemp("data")
    video_dir = root / "train" / "S01" / "c001"
    (video_dir / "frames").mkdir(parents=True)
    (video_dir / "mtsc").mkdir()

    h, w = 240, 320
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    bg = np.stack([xx / w, yy / h, 0.4 + 0 * xx], -1)
    for i in range(12):
        frame = bg.copy()
        frame[100:140, 60 + 6 * i: 120 + 6 * i] = [0.8, 0.2, 0.2]  # moving "vehicle"
        np.save(video_dir / "frames" / f"{i:04}.npy", frame)

    # Tracking: vehicle id 7 moving right, 10 columns.
    rows = []
    for i in range(12):
        rows.append([i + 1, 7, 60 + 6 * i, 100, 60, 40, 1, -1, -1, -1])
    np.savetxt(video_dir / "mtsc" / "mtsc_tc_ssd512.txt", np.asarray(rows), delimiter=",")

    # Calibration: pixel->GPS homography (tiny offsets around a base lat/lon).
    hmat = np.array([[1e-5, 0, 45.0], [0, 1e-5, 11.0], [0, 0, 1.0]])
    matrix_str = ";".join(" ".join(str(v) for v in row) for row in hmat)
    (video_dir / "calibration.txt").write_text(
        yaml.safe_dump({"Homography matrix": matrix_str})
    )

    np.save(root / "intrinsic.npy", np.array(
        [[300.0, 0, w / 2], [0, 300.0, h / 2], [0, 0, 1]], np.float32
    ))
    return video_dir


def test_video_io(dataset):
    from future_urban_scene_generation_tpu.utils import video as vio

    tracks = vio.parse_tracking_file(dataset, "tc", "ssd512")
    assert tracks.shape == (12, 6)
    hmat = vio.parse_calibration_file(dataset / "calibration.txt")
    assert hmat.shape == (3, 3)
    inv = vio.inverse_homography(hmat)
    assert np.allclose(inv @ hmat, np.eye(3), atol=1e-9)

    reader = vio.VideoReader(dataset / "frames", resize_hw=None)
    f1 = reader.read(1)
    assert f1.shape == (240, 320, 3) and f1.dtype == np.float32
    assert reader.read(100) is None

    future = vio.select_future_track(tracks, 7, 3)
    assert len(future) == 5  # rows 3,5,7,9,11
    assert future[0, 0] == 3


@pytest.mark.slow
def test_cli_headless_end_to_end(dataset, tmp_path):
    from future_urban_scene_generation_tpu.cli.run_test import main

    out_dir = tmp_path / "results"
    rc = main([
        str(dataset), str(tmp_path / "no_kpoints"), str(tmp_path / "no_ckpts"),
        "--select-ids", "7", "--frame-id", "1",
        "--output-dir", str(out_dir),
        "--frame-hw", "-1", "-1",  # native 240x320
    ])
    assert rc == 0
    pngs = sorted(out_dir.rglob("*.png"))
    assert len(pngs) == 12  # 6 frames x 2 branches
    names = {p.parent.parent.name for p in pngs}
    assert names == {"warp&learn", "vunet"}


def test_cli_requires_selection(dataset, tmp_path):
    from future_urban_scene_generation_tpu.cli.run_test import main

    rc = main([str(dataset), "x", "y"])
    assert rc == 2


@pytest.mark.slow
def test_cli_inpaint_mode_end_to_end(dataset, tmp_path):
    """Inpaint branch: EdgeConnect checkpoints present -> per-step erased backgrounds."""
    import torch

    from torch_refs import _t_ec_generator

    ckpt = tmp_path / "ckpts" / "inpainting"
    ckpt.mkdir(parents=True)
    edge = _t_ec_generator(3, 1, use_sn=True, blocks=8)
    inpaint = _t_ec_generator(4, 3, use_sn=False, blocks=8)
    torch.save({"iteration": 1, "generator": edge.state_dict()}, ckpt / "EdgeModel_gen.pth")
    torch.save(
        {"iteration": 1, "generator": inpaint.state_dict()}, ckpt / "InpaintingModel_gen.pth"
    )
    (ckpt / "config.yml").write_text("SIGMA: 2\n")

    from future_urban_scene_generation_tpu.cli.run_test import main

    out_dir = tmp_path / "results_inpaint"
    rc = main([
        str(dataset), str(tmp_path / "nokp"), str(tmp_path / "ckpts"),
        "--select-ids", "7", "--frame-id", "1", "--inpaint",
        "--output-dir", str(out_dir),
        "--frame-hw", "-1", "-1",
    ])
    assert rc == 0
    pngs = sorted(out_dir.rglob("*.png"))
    assert len(pngs) == 12


def test_input_validation_errors(tmp_path):
    """Host-edge validation parity (SURVEY §5): missing tracking/calibration files
    raise FileNotFoundError; an empty frames dir raises; malformed tracking rows
    raise ValueError (run_test.py:127-128, video_info_utils.py:14-15,28-29)."""
    import pytest

    from future_urban_scene_generation_tpu.utils import video as vio

    with pytest.raises(FileNotFoundError):
        vio.parse_tracking_file(tmp_path, "tc", "ssd512")
    with pytest.raises(FileNotFoundError):
        vio.parse_calibration_file(tmp_path / "calibration.txt")

    (tmp_path / "frames").mkdir()
    with pytest.raises(FileNotFoundError):
        vio.VideoReader(tmp_path / "frames", resize_hw=None)

    (tmp_path / "mtsc").mkdir()
    bad = tmp_path / "mtsc" / "mtsc_tc_ssd512.txt"
    np.savetxt(bad, np.zeros((3, 7)), delimiter=",")  # 7 cols, not 10
    with pytest.raises(ValueError):
        vio.parse_tracking_file(tmp_path, "tc", "ssd512")


@pytest.mark.slow
def test_warmup_cli_fills_cache(tmp_path):
    """cli.warmup precompiles the requested vehicle buckets into the
    persistent cache (the deploy-time answer to the cold-compile cliff,
    docs/SERVING.md): one run at a tiny shape compiles + executes the scene
    program for each bucket and the cache directory is non-empty after.

    Runs in a FRESH subprocess, as the CLI is deployed: jax binds its
    compilation-cache object to the first configured directory per process,
    so any earlier in-process test that compiled against the default repo
    cache would make warmup's --cache-dir silently land there instead (this
    is exactly why warmup is a process entry point, not a library call for
    already-warm processes)."""
    import subprocess
    import sys

    cache = tmp_path / "cache"
    repo = str(Path(__file__).resolve().parent.parent)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from future_urban_scene_generation_tpu.cli import warmup; "
        "raise SystemExit(warmup.main(["
        "'--frame-hw', '96', '128', '--vehicles', '1', '--steps', '2', "
        "'--generator-dtype', 'float32', '--warp-plane-res', '64', "
        "'--cache-dir', %r]))" % (repo, str(cache))
    )
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert cache.is_dir() and any(cache.iterdir())
