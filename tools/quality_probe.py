"""End-to-end serving-knob quality probe.

Measures the composited-frame PSNR of a MODEL_SPEC knob setting against the
exact/default path, over the bench scene (tools for the numbers cited in
README/PARITY: warp_plane_res 128/112/96 read 31.62/31.56/31.47 dB vs the
exact r=256 path with f32 generators — flat, i.e. the generators set the
quality floor; r=80 is where it moves, 31.28).

Runs on CPU by default (the resampling/knob numerics are platform-independent
and the full-scene CPU trace compiles in ~1 min warm); pass --tpu to run on
the default backend instead.

Usage:
  python tools/quality_probe.py --knob warp_plane_res --values 128 112 96 \
      [--baseline 256] [--tpu]
  python tools/quality_probe.py --knob generator_dtype --values bfloat16 \
      --baseline float32
"""
import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--knob", default="warp_plane_res")
    ap.add_argument("--values", nargs="+", default=["128", "112", "96"])
    ap.add_argument("--baseline", default="256")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend instead of forcing CPU")
    ap.add_argument("--vehicles", type=int, default=4)
    args = ap.parse_args(argv)

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    import bench
    from future_urban_scene_generation_tpu.pipeline import runner, stages

    def parse(v):
        try:
            return int(v)
        except ValueError:
            return v

    models, cad_bank, frame, background, bboxes, meters, K, H, W, T = (
        bench.setup_scene(args.vehicles)
    )
    # Isolate the probed knob: everything else at the exact/default path.
    stages.configure_models(generator_dtype="float32")
    if args.knob != "generator_dtype":
        stages.configure_models(**{args.knob: parse(args.baseline)})

    def run_at(value):
        stages.configure_models(**{args.knob: parse(value)})
        res = runner.run_scene(
            models, cad_bank, frame, background, bboxes, meters, jnp.asarray(K)
        )
        return np.asarray(res.frames_icn), np.asarray(res.frames_vunet)

    ref_icn, ref_vun = run_at(parse(args.baseline))

    def psnr(ref, got):
        mse = float(np.mean((ref - got) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    for v in args.values:
        icn, vun = run_at(v)
        print(json.dumps({
            "knob": args.knob, "value": v, "baseline": args.baseline,
            "icn_psnr_db": round(psnr(ref_icn, icn), 2),
            "vunet_psnr_db": round(psnr(ref_vun, vun), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
