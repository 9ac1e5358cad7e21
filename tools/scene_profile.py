"""Stage-level device-time breakdown of the headline scene program.

Runs bench.setup_scene, warms the full-path scene jit, traces ONE execution
with jax.profiler, and aggregates XLA-op device time per `fusg.*` named scope
(the runner annotates every stage — see pipeline/runner.py). Prints a JSON
summary plus the top individual fusions.

Trace-reading rules that earlier rounds learned the hard way (also in
.claude/skills/verify/SKILL.md): parse the Chrome-format vm.trace.json.gz
(the xplane proto module is not importable here); op display names are named
by their EPILOGUE, so always read args.hlo_category; `while` ops include their
body time, so scopes are attributed by the innermost fusg label in
args.long_name / args.scope.

Usage: python tools/scene_profile.py [--vehicles 4] [--out /tmp/trace_dir]
"""
import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(trace_dir):
    """Aggregate XLA-op events: per-fusg-scope totals + top ops. Returns
    (scope_totals_us, op_totals, scope_cost) where op_totals maps name ->
    [dur_us, category, scope] and scope_cost maps scope -> [model_flops,
    bytes_accessed] summed from the per-op cost annotations the TPU trace
    carries (the roofline inputs: achieved FLOP/s and HBM GB/s per stage)."""
    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    ) or glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    # A reused --out dir accumulates one plugins/profile/<timestamp>/ per run
    # (and the profiler may emit one trace file per host): keep every file of
    # the NEWEST run only — glob order is arbitrary, so sort by mtime.
    newest_dir = os.path.dirname(max(paths, key=os.path.getmtime))
    events = []
    for p in sorted(paths):
        if os.path.dirname(p) != newest_dir:
            continue
        with gzip.open(p, "rt") as fh:
            events.extend(json.load(fh).get("traceEvents", []))

    # Map (pid, tid) -> thread name to keep only XLA op lanes.
    tnames = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tnames[(ev.get("pid"), ev.get("tid"))] = ev["args"].get("name", "")

    scope_totals = {}
    op_totals = {}
    scope_cost = {}
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        args = ev.get("args", {}) or {}
        # TPU traces put per-op events on "XLA Ops" lanes; CPU traces (the
        # --platform cpu functional check) lack that lane but tag op events
        # with hlo_category.
        if "XLA Ops" not in tnames.get(
            (ev.get("pid"), ev.get("tid")), ""
        ) and "hlo_category" not in args:
            continue
        long_name = " ".join(
            str(args.get(k, "")) for k in ("long_name", "tf_op", "scope", "name")
        )
        dur = float(ev.get("dur", 0.0))
        total += dur
        scope = "unattributed"
        if "fusg." in long_name:
            frag = long_name.split("fusg.")[-1]
            scope = "fusg." + frag.split("/")[0].split(" ")[0].split(":")[0]
        scope_totals[scope] = scope_totals.get(scope, 0.0) + dur
        cost = scope_cost.setdefault(scope, [0.0, 0.0])
        try:
            cost[0] += float(args.get("model_flops", 0) or 0)
        except (TypeError, ValueError):
            pass
        try:
            cost[1] += float(args.get("bytes_accessed", 0) or 0)
        except (TypeError, ValueError):
            pass
        name = ev.get("name", "?")
        rec = op_totals.setdefault(
            name, [0.0, str(args.get("hlo_category", "")), scope]
        )
        rec[0] += dur
    scope_totals["TOTAL"] = total
    scope_cost["TOTAL"] = [
        sum(c[0] for s, c in scope_cost.items()),
        sum(c[1] for s, c in scope_cost.items()),
    ]
    return scope_totals, op_totals, scope_cost


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vehicles", type=int, default=4)
    ap.add_argument("--out", default=None, help="trace dir (default: temp)")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--quantized", action="store_true",
                    help="profile the int8 serving tier (bench --quantized)")
    ap.add_argument(
        "--platform", default=None, choices=("cpu",),
        help="force the CPU backend — plumbing check only: CPU traces carry "
             "no op-level events, so the per-scope table will be empty",
    )
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    import bench

    models, cad_bank, frame, background, bboxes, meters, K, H, W, T = (
        bench.setup_scene(args.vehicles, quantized=args.quantized)
    )
    from future_urban_scene_generation_tpu.pipeline import runner

    run = lambda f: runner.run_scene(  # noqa: E731
        models, cad_bank, f, background, bboxes, meters, jnp.asarray(K)
    )
    # Warm compile + the readback program.
    _ = float(jnp.sum(run(frame).frames_icn[0, ::64, ::64, 0]))

    trace_dir = args.out or tempfile.mkdtemp(prefix="fusg_trace_")
    import numpy as np

    f2 = jnp.asarray(np.random.RandomState(7).rand(H, W, 3).astype(np.float32))
    jax.block_until_ready(f2)
    # Only the scene program inside the trace: reading the checksum through
    # the separate slice+sum jit would land that program's device time in the
    # 'unattributed' bucket.
    jax.profiler.start_trace(trace_dir)
    result = run(f2)
    jax.block_until_ready(result)
    jax.profiler.stop_trace()
    _ = float(jnp.sum(result.frames_icn[0, ::64, ::64, 0]))

    scopes, ops, cost = parse_trace(trace_dir)
    ms = {k: round(v / 1000.0, 2) for k, v in sorted(
        scopes.items(), key=lambda kv: -kv[1]
    )}
    # Roofline per stage (VERDICT r4 #4): achieved TFLOP/s vs the v5e bf16
    # MXU peak (197 TFLOP/s) and achieved GB/s vs the HBM peak (819 GB/s),
    # from the trace's own per-op model_flops / bytes_accessed. A stage near
    # its FLOP ceiling is MXU-bound; one near the BW ceiling is HBM-bound;
    # near neither = latency/issue-bound (the PnP while_loop, small gathers).
    PEAK_TFLOPS, PEAK_GBPS = 197.0, 819.0
    roofline = {}
    for k, dur_us in scopes.items():
        if dur_us <= 0:
            continue
        fl, by = cost.get(k, [0.0, 0.0])
        sec = dur_us / 1e6
        roofline[k] = {
            "ms": round(dur_us / 1000.0, 2),
            "gflops": round(fl / 1e9, 2),
            "tflops_per_s": round(fl / sec / 1e12, 2),
            "pct_mxu_peak": round(100.0 * fl / sec / 1e12 / PEAK_TFLOPS, 1),
            "gb": round(by / 1e9, 3),
            "gbps": round(by / sec / 1e9, 1),
            "pct_hbm_peak": round(100.0 * by / sec / 1e9 / PEAK_GBPS, 1),
        }
    print(json.dumps({"per_scope_device_ms": ms, "trace_dir": trace_dir}))
    print(json.dumps({"roofline_per_scope": {
        k: roofline[k] for k, _ in sorted(scopes.items(), key=lambda kv: -kv[1])
        if k in roofline
    }}))
    print("\nper-stage roofline (ms | TFLOP/s %MXU | GB/s %HBM):")
    for k, _ in sorted(scopes.items(), key=lambda kv: -kv[1]):
        r = roofline.get(k)
        if r:
            print(f"  {k:24s} {r['ms']:8.2f}  {r['tflops_per_s']:7.2f} "
                  f"{r['pct_mxu_peak']:5.1f}%  {r['gbps']:7.1f} "
                  f"{r['pct_hbm_peak']:5.1f}%")
    print("\ntop ops (device ms, category, scope):")
    for name, (dur, cat, scope) in sorted(ops.items(), key=lambda kv: -kv[1][0])[
        : args.top
    ]:
        print(f"  {dur / 1000.0:8.2f}  {cat:28s} {scope:24s} {name[:70]}")


if __name__ == "__main__":
    main()
