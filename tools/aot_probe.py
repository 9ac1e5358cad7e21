"""Measure what AOT export (pipeline/aot.py) buys a warm serving restart.

The compile probe established that a warm restart (persistent cache hot) is
TRACE-dominated: ~10-17 s of Python retracing vs ~4-6 s of cached XLA compile
(docs/SERVING.md table). `jax.export` artifacts skip the retrace. This tool
measures the end-to-end restart cost both ways, each in a FRESH subprocess on
the SAME persistent cache:

  export   — build inputs, run the normal jit path once (fills cache), then
             aot.export_run_scene (one-time deploy step; reports artifact size
             and export wall).
  retrace  — fresh process, build inputs, time the first runner.run_scene call
             (trace + cached compile): today's warm-restart cost.
  aot      — fresh process, build inputs, time aot.lookup_run_scene + first
             call (deserialize + cached compile): the restart cost with an
             artifact.

Input building (model init etc.) is timed separately — both restart paths pay
it identically, so the comparable figure is `first_call_s`.

Usage:
  python tools/aot_probe.py [--hw 720 1280] [--vehicles 4] [--steps 6] [--cpu]

Only one process may use the TPU at a time — do not run concurrently with
bench.py or other tools.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AOT_DIR = os.path.join(REPO, ".jax_cache", "aot")


def _child(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # lookup_run_scene gates fresh-process CPU restores off by default
        # (XLA:CPU segfault, aot.py); the probe's whole point is to exercise
        # the restore path, so opt in explicitly (same as tests/test_aot.py).
        os.environ["FUSG_AOT_CPU"] = "1"
    import jax.numpy as jnp  # noqa: F401

    sys.path.insert(0, REPO)
    import bench

    from future_urban_scene_generation_tpu.pipeline import aot, runner

    t0 = time.perf_counter()
    models, cad_bank, frame, background, bboxes, meters, K, H, W, T = (
        bench.setup_scene(args.vehicles, hw=tuple(args.hw), t_steps=args.steps)
    )
    t_inputs = time.perf_counter() - t0
    vis_res = 192
    out = {"phase": args.phase, "inputs_s": round(t_inputs, 2)}

    if args.phase == "export":
        t0 = time.perf_counter()
        res = runner.run_scene(models, cad_bank, frame, background, bboxes,
                               meters, K, vis_res=vis_res)
        jax.block_until_ready(res)
        out["jit_first_call_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        path = aot.export_run_scene(models, cad_bank, frame, background, bboxes,
                                    meters, K, vis_res=vis_res, directory=AOT_DIR)
        out["export_s"] = round(time.perf_counter() - t0, 2)
        out["artifact_mb"] = round(os.path.getsize(path) / 1e6, 2)
        out["artifact"] = os.path.basename(str(path))
        # Pre-warm the deserialized module's persistent-cache entry (its HLO
        # hash differs from the jit path's): the deploy step pays this once so
        # every later restart's XLA compile is a cache hit. cli.warmup --export
        # does the same.
        t0 = time.perf_counter()
        run = aot.lookup_run_scene(models, cad_bank, frame, background, bboxes,
                                   meters, K, vis_res=vis_res, directory=AOT_DIR)
        if run is None:
            print(json.dumps({**out, "error": "exported artifact not found "
                              "by lookup (key mismatch?)"}))
            return 1
        jax.block_until_ready(run(models, cad_bank, frame, background, bboxes,
                                  meters, K))
        out["prewarm_s"] = round(time.perf_counter() - t0, 2)
    elif args.phase == "retrace":
        t0 = time.perf_counter()
        res = runner.run_scene(models, cad_bank, frame, background, bboxes,
                               meters, K, vis_res=vis_res)
        jax.block_until_ready(res)
        out["first_call_s"] = round(time.perf_counter() - t0, 2)
    elif args.phase == "aot":
        t0 = time.perf_counter()
        run = aot.lookup_run_scene(models, cad_bank, frame, background, bboxes,
                                   meters, K, vis_res=vis_res, directory=AOT_DIR)
        out["lookup_s"] = round(time.perf_counter() - t0, 2)
        if run is None:
            print(json.dumps({**out, "error": "no artifact — run export first"}))
            return 1
        t0 = time.perf_counter()
        res = run(models, cad_bank, frame, background, bboxes, meters, K)
        jax.block_until_ready(res)
        out["first_call_s"] = round(time.perf_counter() - t0, 2)
        # Sanity: the deserialized program must produce the documented pytree
        # with finite frames (numeric equivalence vs the jit path is pinned by
        # tests/test_aot.py; this is the smoke check for the probe itself).
        import numpy as np
        out["result_shape"] = list(res.frames_icn.shape)
        out["result_finite"] = bool(np.isfinite(np.asarray(res.frames_icn)).all())
    print(json.dumps(out))
    return 0


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hw", type=int, nargs=2, default=[720, 1280])
    ap.add_argument("--vehicles", type=int, default=4)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--phase", default=None,
                    help=argparse.SUPPRESS)  # set for child invocations
    ap.add_argument("--phases", nargs="+",
                    default=["export", "retrace", "aot"])
    args = ap.parse_args()

    if args.phase:
        sys.exit(_child(args))

    for phase in args.phases:
        cmd = [sys.executable, os.path.abspath(__file__), "--phase", phase,
               "--hw", *map(str, args.hw), "--vehicles", str(args.vehicles),
               "--steps", str(args.steps)] + (["--cpu"] if args.cpu else [])
        t0 = time.perf_counter()
        rc = subprocess.call(cmd, cwd=REPO)
        print(json.dumps({"phase": phase, "process_wall_s":
                          round(time.perf_counter() - t0, 2), "rc": rc}))
        if rc:
            sys.exit(rc)


if __name__ == "__main__":
    main()
