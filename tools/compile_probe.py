"""Cold-compile probe: measure the structural compile-time levers of the scene program.

The full serving program compiles through a REMOTE compile server in the
15-40 minute range cold at 1080p (docs/SERVING.md table). This tool measures,
with a FRESH persistent-cache directory per variant (honest cold) plus a
second same-cache run (the warm/deploy number), the wall time of:

  - ``monolith``  — ``runner.run_scene``'s single jit (perception + geometry +
                    generators + composite in one program; the production
                    serving path).
  - ``staged``    — the same total work as three independently-compiled jits:
                    ``jax.jit(stages.perceive)`` + ``runner._scene_geometry``
                    + ``runner._scene_generate`` (the development runner,
                    ``runner.synthesize_scene_staged``).

Each variant runs in a FRESH SUBPROCESS so in-process jit caches can't leak
between variants. Trace/lower time and XLA-compile time are reported
separately via the AOT path (``jitted.lower(...).compile()``).

Caveats disclosed with the numbers:
  - The remote compile server may keep its own HLO-keyed cache across
    processes; run the probe at a shape the deployment has NOT already
    compiled (the default 720x1280 differs from the 1080p headline bench) and
    treat the first-variant-first-run ordering as the most trustworthy cold
    figure.
  - Only one process may use the TPU at a time — do not run this concurrently
    with bench.py.

Usage:
  python tools/compile_probe.py [--hw 720 1280] [--vehicles 4] [--steps 6]
      [--variants monolith staged]

Reference for the program being compiled: the reference's whole pipeline is a
one-shot eager torch script (trajectory_inference.py:39-475) with no compile
step at all — compile latency is a TPU-serving concern this framework owns.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child(args) -> int:
    import jax

    if args.cpu:
        # Mechanics testing / CI without touching the (single-tenant) TPU.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    import bench

    models, cad_bank, frame, background, bboxes, meters, K, H, W, T = (
        bench.setup_scene(
            args.vehicles, warp_res=96, hw=tuple(args.hw), t_steps=args.steps,
            cache_dir=args.cache_dir,
        )
    )
    from future_urban_scene_generation_tpu.pipeline import runner, stages

    if args.variant == "monolith-dlt":
        # Attribution knob: the pre-round-4 solver (normalized-DLT eigensolve
        # on every plane) inside the otherwise-identical monolith.
        stages.configure_models(quad_homography=False)

    K = jnp.asarray(K)
    spec = stages.spec_key()
    timings = {}

    def aot(name, jitted, *a, **kw):
        t0 = time.time()
        lowered = jitted.lower(*a, **kw)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        timings[name] = {"trace_s": round(t1 - t0, 2),
                         "xla_compile_s": round(t2 - t1, 2)}
        return compiled

    if args.variant in ("monolith", "monolith-dlt"):
        c = aot("run_scene", runner._run_scene_impl, models, cad_bank, frame,
                background, bboxes, meters, K, vis_res=192, spec=spec)
        out = c(models, cad_bank, frame, background, bboxes, meters, K)
        _ = float(jnp.sum(out.frames_icn[0, ::64, ::64, 0]))
    elif args.variant == "staged":
        import jax

        perceive_jit = jax.jit(stages.perceive)
        c_p = aot("perceive", perceive_jit, models, frame, bboxes)
        perception = c_p(models, frame, bboxes)
        c_g = aot("geometry", runner._scene_geometry_impl, models, cad_bank,
                  frame, perception, meters, K, vis_res=192, spec=spec)
        geom = c_g(models, cad_bank, frame, perception, meters, K)
        c_gen = aot("generate", runner._scene_generate_impl, models, frame,
                    background, geom, perception.cad_idx, spec=spec)
        out = c_gen(models, frame, background, geom, perception.cad_idx)
        _ = float(jnp.sum(out.frames_icn[0, ::64, ::64, 0]))
    else:
        raise SystemExit(f"unknown variant {args.variant}")

    total = sum(v["trace_s"] + v["xla_compile_s"] for v in timings.values())
    print(json.dumps({
        "variant": args.variant, "hw": list(args.hw), "V": args.vehicles,
        "T": args.steps, "programs": timings, "total_compile_s": round(total, 2),
        "backend": jax.default_backend(),
    }), flush=True)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--hw", type=int, nargs=2, default=[720, 1280])
    ap.add_argument("--vehicles", type=int, default=4)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--variants", nargs="+", default=["monolith", "staged"])
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (mechanics test; timings are "
                    "NOT the remote-TPU compile figures)")
    ap.add_argument("--repeat-warm", type=int, default=1,
                    help="number of warm (same-cache) phases per variant — "
                    ">1 separates remote-compile variance from real cache "
                    "misses")
    ap.add_argument("--child-variant", default=None, help=argparse.SUPPRESS)
    ap.add_argument("--cache-dir", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.child_variant is not None:
        args.variant = args.child_variant
        return _child(args)

    results = []
    for variant in args.variants:
        cache_dir = tempfile.mkdtemp(prefix=f"fusg_probe_{variant}_")
        phases = ["cold"] + ["warm"] * args.repeat_warm
        for i, phase in enumerate(phases):
            phase = phase if i < 2 else f"warm{i}"
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--child-variant", variant, "--cache-dir", cache_dir,
                   "--hw", str(args.hw[0]), str(args.hw[1]),
                   "--vehicles", str(args.vehicles), "--steps", str(args.steps)]
            if args.cpu:
                cmd.append("--cpu")
            t0 = time.time()
            proc = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO,
                env={**os.environ, "PYTHONPATH":
                     REPO + os.pathsep + os.environ.get("PYTHONPATH", "")},
            )
            wall = time.time() - t0
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(proc.stdout[-2000:], file=sys.stderr)
                print(proc.stderr[-2000:], file=sys.stderr)
                raise SystemExit(f"{variant}/{phase} child failed rc={proc.returncode}")
            rec = json.loads(line[-1])
            rec["phase"] = phase
            rec["child_wall_s"] = round(wall, 1)
            rec["cache_dir"] = cache_dir
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": [
        {"variant": r["variant"], "phase": r["phase"],
         "total_compile_s": r["total_compile_s"],
         "child_wall_s": r["child_wall_s"]} for r in results
    ]}, indent=None), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
