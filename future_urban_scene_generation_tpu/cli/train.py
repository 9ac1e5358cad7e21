"""Training driver CLI.

The reference ships GAN training machinery with no driver script (SURVEY §2.1); this
driver closes the loop: pick a model family, feed it the synthetic on-device data
generator (pipeline/datagen.py) or adapt a real loader to the same sample pytrees,
checkpoint with Orbax, log metrics as JSONL.

  python -m future_urban_scene_generation_tpu.cli.train \
      --model icn --steps 200 --batch 8 --out /tmp/icn_run \
      [--resume] [--save-interval 100] [--log-interval 10] [--mesh-model 1]

Models: icn | vunet | edge | inpaint | hourglass | cad

The inpaint trainer's perceptual/style losses tap VGG19 features
(edgeconnect/loss.py:45-99); pass --vgg-weights a torch .pth (torchvision vgg19
state dict or the CAD checkpoint — both carry the trunk) or training optimizes
those losses against RANDOM features, which the driver warns about loudly.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["icn", "vunet", "edge", "inpaint", "hourglass", "cad"])
    p.add_argument("--vgg-weights", type=Path, default=None,
                   help="torch .pth with a VGG19 trunk (features.N.*) for the "
                        "inpaint perceptual/style losses")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", type=Path, default=Path("./train_run"))
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save-interval", type=int, default=100)  # config.py:61
    p.add_argument("--log-interval", type=int, default=10)  # config.py:65
    p.add_argument("--seed", type=int, default=10)  # config.py:36
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--jax-cache-dir", default=None,
                   help="persistent XLA compile cache dir (default: "
                        "$FUSG_JAX_CACHE or package-adjacent .jax_cache)")
    p.add_argument("--no-jax-cache", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if not args.no_jax_cache:
        from future_urban_scene_generation_tpu.utils.cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache(args.jax_cache_dir)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from future_urban_scene_generation_tpu.pipeline import checkpoint, datagen, training
    from future_urban_scene_generation_tpu.pipeline.runner import build_cad_bank
    from future_urban_scene_generation_tpu.utils.mesh import make_test_car
    from future_urban_scene_generation_tpu.utils.profiling import MetricsLogger

    args.out.mkdir(parents=True, exist_ok=True)
    logger = MetricsLogger(args.out / "metrics.jsonl")
    key = jax.random.PRNGKey(args.seed)

    mesh, kp3d = make_test_car(subdiv=2)
    cad_bank = build_cad_bank([mesh] * 2, [kp3d] * 2, scale=5.0)
    frame_hw = (360, 640)
    intrinsic = jnp.asarray(
        np.array([[450.0, 0, 320], [0, 450.0, 180], [0, 0, 1]], np.float32)
    )
    frame = jax.random.uniform(key, frame_hw + (3,))

    ckpt_path = args.out / "checkpoint"
    s = args.image_size

    if args.model == "icn":
        trainer = training.ICNTrainer(lr=args.lr)
        state = trainer.init(key, jnp.zeros((1, s, s, 21)), jnp.zeros((1, s, s, 3)))
        if args.resume and ckpt_path.exists():
            state = checkpoint.restore(ckpt_path, template=state)
        step_fn = jax.jit(trainer.train_step)
        for i in range(int(state.iteration), args.steps):
            key, sub = jax.random.split(key)
            sample = datagen.icn_batch(
                sub, cad_bank, frame, intrinsic, batch=args.batch,
                frame_hw=frame_hw, vis_res=192,
            )
            state, metrics = step_fn(state, sample.inputs, sample.targets)
            _maybe_log_save(args, logger, checkpoint, ckpt_path, state, i, metrics)
    elif args.model == "vunet":
        from future_urban_scene_generation_tpu.models.vunet import Vunet

        trainer = training.VunetTrainer(vunet=Vunet(vunet_256=s == 256), lr=args.lr)
        params, opt_state = trainer.init(
            key, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 6))
        )
        if args.resume and ckpt_path.exists():
            params, opt_state = checkpoint.restore(ckpt_path, template=(params, opt_state))
        step_fn = jax.jit(trainer.train_step)
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            sample = datagen.vunet_batch(
                sub, cad_bank, frame, intrinsic, batch=args.batch,
                frame_hw=frame_hw, vis_res=192,
            )
            params, opt_state, metrics = step_fn(
                params, opt_state, sub, sample.y_tilde, sample.x_app, sample.target
            )
            _maybe_log_save(args, logger, checkpoint, ckpt_path, (params, opt_state), i, metrics)
    elif args.model == "edge":
        trainer = training.EdgeModelTrainer(lr=args.lr)
        state = trainer.init(key, hw=(s, s))
        if args.resume and ckpt_path.exists():
            state = checkpoint.restore(ckpt_path, template=state)
        step_fn = jax.jit(trainer.train_step)
        for i in range(int(state.iteration), args.steps):
            key, sub = jax.random.split(key)
            imgs = jax.random.uniform(sub, (args.batch, s, s, 3))
            gray, edges, masks = datagen.edgeconnect_batch(sub, imgs)
            state, metrics = step_fn(state, gray, edges, masks)
            _maybe_log_save(args, logger, checkpoint, ckpt_path, state, i, metrics)
    elif args.model == "inpaint":
        trainer = training.InpaintingModelTrainer(lr=args.lr)
        vgg_params = _load_vgg_features(args.vgg_weights, key, s)
        state = trainer.init(key, vgg_params, hw=(s, s))
        if args.resume and ckpt_path.exists():
            state = checkpoint.restore(ckpt_path, template=state)
        step_fn = jax.jit(trainer.train_step)
        for i in range(int(state.iteration), args.steps):
            key, sub = jax.random.split(key)
            images = jax.random.uniform(sub, (args.batch, s, s, 3))
            _, edges, masks = datagen.edgeconnect_batch(sub, images)
            state, metrics = step_fn(state, vgg_params, images, edges, masks)
            _maybe_log_save(args, logger, checkpoint, ckpt_path, state, i, metrics)
    elif args.model == "hourglass":
        from future_urban_scene_generation_tpu.ops.heatmap import heatmaps_from_kpoints

        # Learnable localization data: sketch renders of a 10-variant CAD bank
        # with the projected CAD keypoints as targets (datagen.hourglass_batch;
        # replaces the earlier random-image/random-keypoint mechanics demo).
        class_bank = _variant_cad_bank(build_cad_bank)
        trainer = training.HourglassTrainer(lr=args.lr)
        params, opt_state = trainer.init(key, hw=(s, s))
        if args.resume and ckpt_path.exists():
            params, opt_state = checkpoint.restore(ckpt_path, template=(params, opt_state))
        step_fn = jax.jit(trainer.train_step)
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            sample = datagen.hourglass_batch(sub, class_bank, intrinsic, batch=args.batch)
            images = sample.images
            if s != 256:
                images = jax.image.resize(images, (args.batch, s, s, 3), "linear")
            targets = jax.vmap(
                lambda k: heatmaps_from_kpoints(k, (s // 4, s // 4), sigma=2.0)
            )(sample.kp_norm)
            params, opt_state, metrics = step_fn(params, opt_state, images, targets)
            _maybe_log_save(args, logger, checkpoint, ckpt_path, (params, opt_state), i, metrics)
    elif args.model == "cad":
        # Real discrimination task: classify which of 10 distinct CAD variants
        # produced the sketch (datagen.cad_batch; the earlier random labels
        # pinned the loss at ln(10) by construction).
        class_bank = _variant_cad_bank(build_cad_bank)
        trainer = training.CadClassifierTrainer(lr=args.lr)
        params, opt_state = trainer.init(key, hw=(s, s))
        if args.resume and ckpt_path.exists():
            params, opt_state = checkpoint.restore(ckpt_path, template=(params, opt_state))
        step_fn = jax.jit(trainer.train_step)
        for i in range(args.steps):
            key, sub = jax.random.split(key)
            sample = datagen.cad_batch(sub, class_bank, intrinsic, batch=args.batch)
            images = sample.images
            if s != 256:
                images = jax.image.resize(images, (args.batch, s, s, 3), "linear")
            params, opt_state, metrics = step_fn(params, opt_state, images, sample.labels)
            _maybe_log_save(args, logger, checkpoint, ckpt_path, (params, opt_state), i, metrics)

    print(f"trained {args.model} for {args.steps} steps; artifacts in {args.out}")
    return 0


def _variant_cad_bank(build_cad_bank):
    """10 geometrically distinct test-car variants — the classification/keypoint
    data bank, mirroring the reference's 10-CAD zoo (run_test.py:146-153) and
    bench.py's asset profile (same dimension staggering)."""
    from future_urban_scene_generation_tpu.utils.mesh import make_test_car

    meshes_kps = [
        make_test_car(
            length=1.0 + 0.05 * i, width=0.42 + 0.015 * (i % 3),
            height=0.30 + 0.01 * (i % 4), subdiv=2,
        )
        for i in range(10)
    ]
    return build_cad_bank(
        [m for m, _ in meshes_kps], [k for _, k in meshes_kps], scale=5.0
    )


def _load_vgg_features(path, key, image_size: int):
    """Pretrained VGG19 trunk for the inpaint losses, or random with a loud warning."""
    import jax
    import jax.numpy as jnp

    from future_urban_scene_generation_tpu.models.vgg import (
        VGG19Features,
        convert_vgg19_features,
    )

    if path is not None:
        import torch

        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = convert_vgg19_features(sd)
        print(f"loaded pretrained VGG19 features from {path}")
        return params
    print(
        "=" * 72
        + "\nWARNING: no --vgg-weights given — the inpaint perceptual/style losses"
        "\nwill be computed against RANDOMLY INITIALIZED VGG19 features. Training"
        "\nwill 'converge' but the losses are meaningless as fidelity signals."
        "\nPass --vgg-weights path/to/vgg19.pth (torchvision state dict) for real"
        "\ntraining (ref: edgeconnect/loss.py:102-224).\n" + "=" * 72
    )
    return VGG19Features().init(key, jnp.zeros((1, image_size, image_size, 3)))


def _maybe_log_save(args, logger, checkpoint, ckpt_path, state, i, metrics):
    if args.log_interval and i % args.log_interval == 0:
        rec = logger.log(i, **{k: float(v) for k, v in metrics.items()})
        print(rec)
    if args.save_interval and (i + 1) % args.save_interval == 0:
        checkpoint.save(ckpt_path, state)


if __name__ == "__main__":
    raise SystemExit(main())
