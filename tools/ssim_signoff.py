#!/usr/bin/env python
"""One-command fidelity sign-off: composited frames vs the reference's outputs.

Runs the headless CLI (cli/run_test.py) with ``--reference-channel-order`` (the
bit-exact channel-convention switch for the reference's trained checkpoints,
PARITY.md §6) on the given scene, then SSIM-compares every produced PNG against
the same-named file in ``--reference-results`` (the reference's
``./results/{warp&learn,vunet}/<scene>_<cam>/<frame>.png`` tree,
trajectory_inference.py:461-473). Exits 0 iff min SSIM >= --threshold (default
0.99 — BASELINE.md's fidelity north star).

    python tools/ssim_signoff.py <video_dir> <kpoints_dir> <checkpoints_dir> \
        --reference-results <dir> --select-ids 7 --frame-id 120

Works today with synthetic stand-in weights (tested); closes the real-weights
fidelity target the moment the Drive downloads are reachable
(tools/fetch_checkpoints.py).
"""
from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np


def load_png(path: Path) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def compare_trees(ours_dir: Path, ref_dir: Path):
    """Pair PNGs by path relative to each root; return [(relpath, ssim)].

    Matching is by basename within each branch directory so
    `<out>/warp&learn/<scene>/0001.png` pairs with the reference's identical
    relative path.
    """
    from future_urban_scene_generation_tpu.ops.metrics import ssim

    ours = sorted(Path(ours_dir).rglob("*.png"))
    if not ours:
        raise FileNotFoundError(f"no PNGs under {ours_dir}")
    results = []
    for p in ours:
        rel = p.relative_to(ours_dir)
        ref = Path(ref_dir) / rel
        if not ref.exists():
            results.append((str(rel), None))
            continue
        a = load_png(p)
        b = load_png(ref)
        if a.shape != b.shape:
            results.append((str(rel), 0.0))
            continue
        results.append((str(rel), float(ssim(a, b, max_val=1.0))))
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("video_dir", type=Path)
    p.add_argument("kpoints_dir", type=Path)
    p.add_argument("checkpoints_dir", type=Path)
    p.add_argument("--reference-results", type=Path, required=True,
                   help="the reference run's ./results directory")
    p.add_argument("--select-ids", type=int, nargs="+", required=True)
    p.add_argument("--frame-id", type=int, default=1)
    p.add_argument("--threshold", type=float, default=0.99)
    p.add_argument("--output-dir", type=Path, default=None,
                   help="keep our outputs here (default: temp dir)")
    p.add_argument("--frame-hw", type=int, nargs=2, default=None)
    p.add_argument("--skip-run", action="store_true",
                   help="compare an existing --output-dir without re-running")
    args = p.parse_args(argv)

    out_dir = args.output_dir or Path(tempfile.mkdtemp(prefix="fusg_signoff_"))
    if not args.skip_run:
        from future_urban_scene_generation_tpu.cli.run_test import main as run_main

        cli = [
            str(args.video_dir), str(args.kpoints_dir), str(args.checkpoints_dir),
            "--select-ids", *[str(i) for i in args.select_ids],
            "--frame-id", str(args.frame_id),
            "--output-dir", str(out_dir),
            "--reference-channel-order",
        ]
        if args.frame_hw:
            cli += ["--frame-hw", str(args.frame_hw[0]), str(args.frame_hw[1])]
        rc = run_main(cli)
        if rc != 0:
            print(f"pipeline run failed (rc={rc})", file=sys.stderr)
            return rc

    results = compare_trees(out_dir, args.reference_results)
    vals = [v for _, v in results if v is not None]
    unmatched = [r for r, v in results if v is None]
    for rel, v in results:
        print(f"  {rel}: {'NO REFERENCE' if v is None else f'SSIM {v:.4f}'}")
    if unmatched:
        print(f"{len(unmatched)} output(s) had no reference counterpart",
              file=sys.stderr)
        return 3
    if not vals:
        print("nothing compared", file=sys.stderr)
        return 3
    print(f"min SSIM {min(vals):.4f}  mean {np.mean(vals):.4f}  "
          f"threshold {args.threshold}")
    ok = min(vals) >= args.threshold
    print("SIGN-OFF: PASS" if ok else "SIGN-OFF: FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
