#!/usr/bin/env python
"""Vehicle-count scaling: scenes/s vs V, single device and 8-device mesh.

The headline bench (bench.py --vehicles N) records the on-chip V-scaling; this
tool exercises the MULTI-CHIP serving program at scale on the virtual 8-device
CPU mesh (the same xla_force_host_platform_device_count trick the test suite
uses): for each V it times `runner.synthesize_scene` on one device and
`runner.synthesize_scene_sharded` with the vehicle axis over all 8, and prints
one JSON line per V.

HONESTY NOTE: this container has ONE physical core, so the 8 virtual devices
execute serially — the sharded/unsharded ratio measures PARTITION + COLLECTIVE
OVERHEAD under serialized execution, never a speedup. A ratio near 1.0 means
the multi-chip program adds little overhead beyond the compute it partitions;
real-speedup evidence requires real chips (equivalence of the two paths is
pinned by tests/test_sharded_inference.py, numerics to 2e-3).

    python tools/vscale_bench.py [--vehicles 8 16] [--iters 3]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax.numpy as jnp  # noqa: E402


def build_scene(V, T, h, w):
    from future_urban_scene_generation_tpu.geometry import projection as proj
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.ops import crop as cr
    from future_urban_scene_generation_tpu.pipeline import runner, stages
    from future_urban_scene_generation_tpu.utils import mesh as mu

    rng = np.random.RandomState(0)
    k_cam = np.array([[240.0, 0, w / 2], [0, 240.0, h / 2], [0, 0, 1]], np.float32)
    mesh_obj, kp3d = mu.make_test_car(subdiv=1)
    cad_bank = runner.build_cad_bank([mesh_obj], [kp3d], scale=5.0)
    frame = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    background = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    kp2ds, bboxes = [], []
    for v in range(V):
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.asarray(
            x_rot(jnp.float32(-1.2)) @ z_rot(jnp.float32(0.4 + 0.2 * (v % 4)))
        )
        ext[:3, 3] = [(-3 + 2 * (v % 4)), 1.5, 20.0 + 2 * (v % 4) + 0.5 * (v // 4)]
        kp2d = np.asarray(
            proj.project_points_extrinsic(
                cad_bank.keypoints3d[0], jnp.asarray(k_cam), jnp.asarray(ext)
            )
        )
        kp2ds.append(kp2d)
        x0, y0 = kp2d.min(0)
        x1, y1 = kp2d.max(0)
        bboxes.append([x0 - 3, y0 - 3, x1 + 3, y1 + 3])
    bboxes = jnp.asarray(np.float32(bboxes))
    kp2ds = jnp.asarray(np.float32(np.stack(kp2ds)))
    window = jax.vmap(cr.square_window_from_bbox)(bboxes)
    crops = jax.vmap(lambda wd: cr.crop_resize(frame, wd, 256))(window)
    perception = stages.Perception(
        cad_idx=jnp.zeros(V, jnp.int32), kp_frame=kp2ds, window=window, crop=crops
    )
    t = np.linspace(0, 1.2, T)
    meters = jnp.asarray(
        np.float32(np.stack([np.stack([t, np.zeros_like(t)], -1)] * V))
    )

    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=cadm.init(key, dummy),
        hourglass_params=hgm.init(key, dummy),
        icn_params=icnm.init(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=vunm.init(
            {"params": key}, jnp.zeros((1, 256, 256, 3)),
            jnp.zeros((1, 256, 256, 6)), cov=0.0,
        ),
    )
    return (models, cad_bank, frame, background, perception, meters,
            jnp.asarray(k_cam))


def time_call(fn, args, frame_idx, h, w, iters):
    """Median wall-clock over iters calls, fresh frame input each call."""
    rng = np.random.RandomState(1)
    times = []
    fn(*args)  # warm/compile
    for _ in range(iters):
        fresh = list(args)
        fresh[frame_idx] = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
        t0 = time.perf_counter()
        out = fn(*fresh)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vehicles", type=int, nargs="+", default=[8, 16])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    from future_urban_scene_generation_tpu.parallel import mesh as pmesh
    from future_urban_scene_generation_tpu.pipeline import runner

    h, w = 192, 256
    device_mesh = pmesh.make_mesh(data=8, model=1, devices=jax.devices()[:8])
    for V in args.vehicles:
        scene = build_scene(V, args.steps, h, w)
        dt1 = time_call(runner.synthesize_scene, scene, 2, h, w, args.iters)
        dt8 = time_call(
            lambda *a: runner.synthesize_scene_sharded(*a, mesh=device_mesh),
            scene, 2, h, w, args.iters,
        )
        print(json.dumps({
            "metric": "vehicle_scaling_cpu_mesh",
            "vehicles": V, "steps": args.steps,
            "scenes_per_sec_1dev": round(1.0 / dt1, 3),
            "scenes_per_sec_8dev": round(1.0 / dt8, 3),
            # Serialized single-core host: ratio < 1 is partition/collective
            # overhead, NOT a (non-)speedup — see module docstring.
            "sharded_over_unsharded_cost": round(dt8 / dt1, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
