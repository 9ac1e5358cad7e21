#!/usr/bin/env python
"""Localize the frame-crossval SSIM deficit (VERDICT r3 weak #3).

The strongest whole-pipeline fidelity evidence is
tests/test_frame_crossval.py: it runs the reference's OWN traj_test
(trajectory_inference.py:39-475, Open3D stubbed with this repo's rasterizer)
and SSIM-compares final composited frames. That test already runs at the
EXACT-parity knob settings (reference_channel_order=True, warp_plane_res=256,
generator_dtype=float32), so its 0.96-1.00 per-frame band is NOT a serving-knob
artifact — it is the remaining structural delta between the two
implementations. This tool answers WHICH structural delta, by region:

  * background — identical composites by construction; any deficit here is a
    stitch-boundary bleed;
  * silhouette ring — a band around the vehicle mask edge: rasterizer tie
    policy, mask-edge resample differences, stitch subpixel placement;
  * vehicle interior — generator-input differences (plane-warp chain:
    single composed gather here vs warpPerspective+crop+resize there; sketch:
    crop-window camera here vs full-frame render + crop there) amplified by
    the generators.

Usage:
  FUSG_CROSSVAL_DUMP=/tmp/xval python -m pytest \
      tests/test_frame_crossval.py -q -s        # writes crossval_frames.npz
  python tools/fidelity_attribution.py /tmp/xval/crossval_frames.npz

Prints one JSON line per branch/frame plus an aggregated attribution table
(the PARITY.md "fidelity attribution" section is generated from this output).
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from future_urban_scene_generation_tpu.ops.metrics import ssim_map  # noqa: E402


def _dilate(mask: np.ndarray, r: int) -> np.ndarray:
    out = mask.copy()
    for _ in range(r):
        grown = out.copy()
        grown[1:] |= out[:-1]
        grown[:-1] |= out[1:]
        grown[:, 1:] |= out[:, :-1]
        grown[:, :-1] |= out[:, 1:]
        out = grown
    return out


def attribute(ref: np.ndarray, ours: np.ndarray, veh: np.ndarray, ring_px: int):
    """Deficit (1 - ssim) mass per region for one frame pair. The SSIM map is
    valid-windowed (5 px border); masks are cropped to match."""
    m = np.asarray(ssim_map(jnp.asarray(ours), jnp.asarray(ref)))
    pad = (veh.shape[0] - m.shape[0]) // 2
    veh_c = veh[pad:pad + m.shape[0], pad:pad + m.shape[1]]
    interior = _dilate(veh_c, 0) & ~(
        _dilate(veh_c, ring_px) & ~_erode(veh_c, ring_px)
    )
    ring = _dilate(veh_c, ring_px) & ~_erode(veh_c, ring_px)
    background = ~_dilate(veh_c, ring_px)
    deficit = 1.0 - m
    total = float(deficit.sum())
    rows = {}
    for name, mask in (("interior", interior), ("silhouette_ring", ring),
                       ("background", background)):
        rows[name] = {
            "deficit_share": float(deficit[mask].sum()) / max(total, 1e-12),
            "area_share": float(mask.mean()),
            "mean_ssim": float(m[mask].mean()) if mask.any() else 1.0,
        }
    rows["frame_ssim"] = float(m.mean())
    return rows


def _erode(mask: np.ndarray, r: int) -> np.ndarray:
    return ~_dilate(~mask, r)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("npz", help="crossval_frames.npz from FUSG_CROSSVAL_DUMP")
    ap.add_argument("--ring-px", type=int, default=4)
    args = ap.parse_args(argv)

    d = np.load(args.npz)
    # bg and the dumped frames share one channel convention (the test stores
    # everything cv2-style BGR) — compare directly.
    bg = d["bg"].astype(np.float32) / 255.0
    agg = {}
    for branch in ("icn", "vun"):
        ref, ours = d[f"ref_{branch}"], d[f"ours_{branch}"]
        for i in range(ref.shape[0]):
            # The vehicle MOVES across steps: derive its region per frame as
            # "either side differs from the shared background" (the composite
            # is background-identical outside the stitch windows).
            delta = np.maximum(
                np.abs(ref[i] - bg).max(-1), np.abs(ours[i] - bg).max(-1)
            )
            veh_i = _dilate(delta > 0.02, 2)
            rows = attribute(ref[i], ours[i], veh_i, args.ring_px)
            rows.update(branch=branch, frame=i)
            print(json.dumps(rows))
            for k in ("interior", "silhouette_ring", "background"):
                a = agg.setdefault((branch, k), [])
                a.append(rows[k]["deficit_share"])
    print()
    print("aggregate deficit share (mean over 6 frames):")
    for (branch, region), vals in sorted(agg.items()):
        print(f"  {branch:4s} {region:16s} {np.mean(vals):6.1%}")


if __name__ == "__main__":
    main()
