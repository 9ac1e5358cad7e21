"""Ahead-of-time compile warmer for production shapes.

A cold full-scene compile costs 64-121 s of trace+XLA per bucket, inside a
process wall of 2.6-17 min set by the remote compile server's queue
(tools/compile_probe.py, docs/SERVING.md table); the persistent cache
(--cache-dir) cuts every later process start to a ~15-20 s retrace. Run this
once per deploy (or per config change) so serving never eats a cold compile:

  python -m future_urban_scene_generation_tpu.cli.warmup \
      --frame-hw 1080 1920 --vehicles 4 8 --steps 6 \
      [--generator-dtype bfloat16 --warp-plane-res 128] \
      [--cache-dir /path/.jax_cache]

Compiles synthesize_scene (and run_scene's perception wrapper) for every
requested vehicle bucket. The service pads requests to buckets of 4, so warming
--vehicles 4 8 covers 1..8 selected vehicles.
"""
from __future__ import annotations

import argparse
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frame-hw", type=int, nargs=2, default=[1080, 1920])
    p.add_argument("--vehicles", type=int, nargs="+", default=[4])
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--vis-res", type=int, default=192)
    p.add_argument("--generator-dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--warp-plane-res", type=int, default=128)
    p.add_argument("--cache-dir", default=None,
                   help="jax persistent compilation cache directory")
    p.add_argument("--perception", action="store_true",
                   help="also warm run_scene (hourglass+VGG perception path)")
    p.add_argument("--export-aot", metavar="DIR", default=None,
                   help="additionally write jax.export artifacts of the warmed "
                        "run_scene programs to DIR and pre-warm their compile "
                        "cache entries; point the service's runtime.aot_dir "
                        "(cli.run_test --aot-dir) here so restarts skip the "
                        "scene retrace entirely (pipeline/aot.py). Implies "
                        "--perception for the exported shapes.")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from future_urban_scene_generation_tpu.utils.cache import enable_persistent_cache

    # Warming exists to FILL the cache, so it is always on here (the default
    # directory matches what cli.run_test / cli.train read back).
    enable_persistent_cache(args.cache_dir, min_compile_secs=2.0)

    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.ops import crop as cr
    from future_urban_scene_generation_tpu.pipeline import runner, stages
    from future_urban_scene_generation_tpu.utils import mesh as mu

    stages.configure_models(
        generator_dtype=args.generator_dtype, warp_plane_res=args.warp_plane_res
    )

    h, w = args.frame_hw
    t_steps = args.steps
    k_mat = np.array(
        [[1400.0, 0, w / 2], [0, 1400.0, h / 2], [0, 0, 1]], np.float32
    )
    mesh, kp3d = mu.make_test_car(subdiv=3)
    cad_bank = runner.build_cad_bank([mesh] * 2, [kp3d] * 2, scale=5.0)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    background = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))

    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init(
                {"params": k}, jnp.zeros((1, 256, 256, 3)),
                jnp.zeros((1, 256, 256, 6)), cov=0.0,
            )
        )(key),
    )

    for v in args.vehicles:
        kp2ds, bboxes = [], []
        for i in range(v):
            ext = np.eye(4, dtype=np.float32)
            ext[:3, :3] = np.asarray(
                x_rot(jnp.float32(-np.pi / 2.4)) @ z_rot(jnp.float32(0.4 + 0.2 * i))
            )
            ext[:3, 3] = [(-6 + 3 * (i % 5)), 2.0, 25.0 + 3 * i]
            kp2d = np.asarray(
                project_points_extrinsic(
                    cad_bank.keypoints3d[0], jnp.asarray(k_mat), jnp.asarray(ext)
                )
            )
            kp2ds.append(kp2d)
            x0, y0 = kp2d.min(0)
            x1, y1 = kp2d.max(0)
            bboxes.append([x0 - 5, y0 - 5, x1 + 5, y1 + 5])
        bboxes = jnp.asarray(np.float32(bboxes))
        kp2ds = jnp.asarray(np.float32(np.stack(kp2ds)))
        t = np.linspace(0, 6.0, t_steps)
        meters = jnp.asarray(
            np.float32(np.stack([np.stack([t, np.zeros_like(t)], -1)] * v))
        )

        t0 = time.time()
        if args.perception or args.export_aot:
            out = runner.run_scene(
                models, cad_bank, frame, background, bboxes, meters,
                jnp.asarray(k_mat), vis_res=args.vis_res,
            )
        else:
            window = jax.vmap(cr.square_window_from_bbox)(bboxes)
            crops = jax.vmap(lambda wd: cr.crop_resize(frame, wd, 256))(window)
            perception = stages.Perception(
                cad_idx=jnp.zeros(v, jnp.int32), kp_frame=kp2ds,
                window=window, crop=crops,
            )
            out = runner.synthesize_scene(
                models, cad_bank, frame, background, perception, meters,
                jnp.asarray(k_mat), vis_res=args.vis_res,
            )
        _ = float(jnp.sum(out.frames_icn[0, ::64, ::64, 0]))
        print(f"warmed V={v} ({h}x{w}, steps={t_steps}, "
              f"{args.generator_dtype}, warp={args.warp_plane_res}) "
              f"in {time.time() - t0:.1f}s")

        if args.export_aot:
            from future_urban_scene_generation_tpu.pipeline import aot

            t0 = time.time()
            path = aot.export_run_scene(
                models, cad_bank, frame, background, bboxes, meters,
                jnp.asarray(k_mat), vis_res=args.vis_res,
                directory=args.export_aot,
            )
            # Pre-warm the deserialized module's compile-cache entry (its HLO
            # hash differs from the jit path's) so the FIRST restart is warm.
            # load_program directly: this is the in-process restore, valid on
            # every backend (lookup_run_scene gates CPU's fresh-process path).
            run = aot.load_program(
                path, out_unflatten=lambda outs: runner.SceneResult(*outs)
            )
            if run is None:  # just-written artifact failed to restore
                print(f"WARNING: exported artifact {path.name} did not "
                      "restore; restarts will use the jit path")
            else:
                res = run(models, cad_bank, frame, background, bboxes, meters,
                          jnp.asarray(k_mat))
                _ = float(jnp.sum(res.frames_icn[0, ::64, ::64, 0]))
                print(f"exported V={v} AOT artifact {path.name} "
                      f"({path.stat().st_size / 1e6:.1f} MB) in {time.time() - t0:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
