"""Generate a visual demo of the pipeline on a synthetic scene (no external data).

Renders a test car into a synthetic frame, injects oracle keypoints, runs the full
synthesize path and writes a horizontal strip of the composited future frames for
both generator branches to docs/demo_strip.png. With random-weight generators the
synthesized texture is noise-like, but the strip demonstrates the geometric pipeline:
pose recovery, trajectory rollout, sketch rendering and masked compositing.

Usage: PYTHONPATH=. python examples/demo_synthetic.py [out.png]
"""
import sys

import numpy as np


def main(out_path="docs/demo_strip.png"):
    import jax
    import jax.numpy as jnp

    from future_urban_scene_generation_tpu.geometry.projection import (
        project_points_extrinsic,
    )
    from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
    from future_urban_scene_generation_tpu.ops import crop as cr
    from future_urban_scene_generation_tpu.pipeline import runner, stages
    from future_urban_scene_generation_tpu.render import rasterizer as rz
    from future_urban_scene_generation_tpu.utils import mesh as mu
    from future_urban_scene_generation_tpu.utils.native import write_png

    H, W = 360, 640
    K = np.array([[450.0, 0, W / 2], [0, 450.0, H / 2], [0, 0, 1]], np.float32)

    mesh, kp3d = mu.make_test_car(subdiv=2)
    cad_bank = runner.build_cad_bank([mesh], [kp3d], scale=5.0)

    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = np.asarray(x_rot(jnp.float32(-np.pi / 2.4)) @ z_rot(jnp.float32(0.5)))
    ext[:3, 3] = [0.0, 2.0, 20.0]

    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    background = np.stack(
        [0.35 + 0.2 * yy / H, 0.4 + 0.15 * yy / H, 0.45 + 0.1 * xx / W], -1
    )
    cam = rz.Camera.from_intrinsic(jnp.asarray(K))
    sketch, bg_mask = rz.render_normal_sketch(
        cad_bank.vertices[0], cad_bank.triangles[0], cad_bank.normals[0],
        jnp.asarray(ext), cam, (H, W),
    )
    frame = np.where(np.asarray(bg_mask)[..., None], background, np.asarray(sketch))

    kp2d = np.asarray(
        project_points_extrinsic(cad_bank.keypoints3d[0], jnp.asarray(K), jnp.asarray(ext))
    )
    ys, xs = np.nonzero(~np.asarray(bg_mask))
    bbox = jnp.asarray(np.float32([xs.min(), ys.min(), xs.max(), ys.max()]))[None]
    window = jax.vmap(cr.square_window_from_bbox)(bbox)
    crops = jax.vmap(lambda w: cr.crop_resize(jnp.asarray(frame), w, 256))(window)
    perception = stages.Perception(
        jnp.zeros(1, jnp.int32), jnp.asarray(kp2d)[None], window, crops
    )

    t = np.linspace(0, 5.0, 6)
    meters = jnp.asarray(np.float32(np.stack([t, 0.15 * t**1.5], -1))[None])

    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init({"params": k}, dummy, jnp.zeros((1, 256, 256, 6)), cov=0.0)
        )(key),
    )

    result = runner.synthesize_scene(
        models, cad_bank, jnp.asarray(frame), jnp.asarray(background), perception,
        meters, jnp.asarray(K),
    )
    print(f"PnP reprojection mse: {float(result.pnp_error[0]):.4f}")

    rows = []
    for frames in (np.asarray(result.frames_icn), np.asarray(result.frames_vunet)):
        rows.append(np.concatenate(list(frames), axis=1))
    strip = np.concatenate(rows, axis=0)
    strip_u8 = np.clip(strip * 255, 0, 255).astype(np.uint8)
    write_png(out_path, strip_u8)
    print(f"wrote {out_path} ({strip_u8.shape[1]}x{strip_u8.shape[0]})")


if __name__ == "__main__":
    main(*sys.argv[1:])
