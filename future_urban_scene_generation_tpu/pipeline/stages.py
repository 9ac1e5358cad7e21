"""The end-to-end synthesis pipeline as jitted, vmapped stage functions.

Re-architects the reference's per-vehicle Python loop (trajectory_inference.py:39-475)
into fixed-shape batched stages over (V vehicles, S steps):

  perceive   crop -> CAD classify + keypoints           (batched over V)
  pose       LM-PnP with 4 vmapped restarts             (batched over V)
  rollout    trajectory -> per-step rigid motions       (host f64 GPS + jnp)
  synthesize render dst sketch + warp planes + ICN/VUNet (batched over V x S)
  composite  sequential masked stitch into background    (scan over V)

Departures from the reference, by design (TPU-first):
* sketches are rendered ONCE at crop resolution with a crop-window camera instead of
  full-frame GL renders that are immediately cropped (trajectory_inference.py:205-220);
  the crop window comes from the projected-vertex bbox (== the silhouette bbox);
* warped plane textures are produced by ONE composed gather per plane
  (frame -> H^-1 -> dst-crop) with an analytic point-in-polygon mask, instead of
  full-frame fillPoly + warpPerspective + crop + resize (sharper: single resample);
* the VUNet appearance is encoded once per vehicle and the decoder is vmapped over
  future steps (the reference already exploits this sequentially, :230-233).

All images are float32 RGB in [0, 1], NHWC.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry import pnp
from future_urban_scene_generation_tpu.geometry.rotations import z_rot
from future_urban_scene_generation_tpu.geometry.trajectory import rollout_from_meters
from future_urban_scene_generation_tpu.models import layers
from future_urban_scene_generation_tpu.models.hourglass import HourglassNet, decode_heatmaps
from future_urban_scene_generation_tpu.models.icn import GResnet
from future_urban_scene_generation_tpu.models.vgg import VGG19Classifier
from future_urban_scene_generation_tpu.models.vunet import Vunet
from future_urban_scene_generation_tpu.ops import colorspace as cs
from future_urban_scene_generation_tpu.ops import crop as cr
from future_urban_scene_generation_tpu.render import rasterizer as rz
from future_urban_scene_generation_tpu.render import visibility as vis
from future_urban_scene_generation_tpu.geometry.homography import (
    find_homography,
    find_homography_quad,
)
from future_urban_scene_generation_tpu.utils.precision import full_precision

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])
CROP = 256
SKETCH_RES = 256


class CadBank(NamedTuple):
    """The 10 CAD meshes padded to common sizes (vertices x5-scaled like
    run_test.py:148-151). Padding triangles are degenerate (all-zero index).

    corners/corner_normals are the triangle-index expansion of
    vertices/normals, LANE-MAJOR (corner, xyz component, triangle): the
    indices are static per mesh, so expanding once at bank build removes the
    per-render corner gathers from the rasterizer prep (~1.2 ms per render
    for a 2k-triangle mesh — they were the whole render stage's cost)."""

    vertices: jnp.ndarray  # (C, Vmax, 3)
    triangles: jnp.ndarray  # (C, Tmax, 3) int32
    normals: jnp.ndarray  # (C, Vmax, 3)
    keypoints3d: jnp.ndarray  # (C, 12, 3)
    corners: jnp.ndarray = None  # (C, 3 corners, 3 xyz, Tmax)
    corner_normals: jnp.ndarray = None  # (C, 3 corners, 3 xyz, Tmax)
    # (C,) bool: mesh verified closed + outward-oriented at bank build
    # (utils.mesh.orient_for_backface_cull), so the rasterizer may backface-cull
    # it exactly — ~2x fewer live triangles per render.
    cullable: jnp.ndarray = None


# Process-wide architecture knobs (the reference's --stacks/--blocks/--reso flags,
# run_test.py:111-118, plus the fixed zoo hyperparameters). Mutated via
# configure_models(); scene-level jits thread spec_key() as a static argument so
# any change retraces (the knobs are read at trace time and several of them —
# generator_dtype, warp_plane_res, reference_channel_order — don't change avals).
MODEL_SPEC = {
    "num_stacks": 2,
    "num_blocks": 1,
    "num_keypoints": 12,
    "num_cads": 10,
    "icn_input_nc": 21,
    "vunet_256": True,
    # Plane-warp sampling grid: SKETCH_RES (256, exact single-resample path) or a
    # smaller r (e.g. 128): gather an r^2 grid over each plane's dst bbox and paste
    # with scale_and_translate — ~2x faster warps (gathers are per-index latency
    # bound); the extra bilinear resample mirrors the reference's own
    # warp->crop->resize chain.
    "warp_plane_res": 256,
    # Reproduce the reference's channel conventions bit-for-bit when running ITS
    # trained checkpoints (PARITY.md §6): the reference frame is BGR (cv2), its
    # sketch/central LAB conversions apply RGB2LAB to BGR data, and the VUNet
    # sketches are channel-reversed (trajectory_inference.py:225-227) — while the
    # plane textures use BGR2LAB on BGR data (i.e. correct LAB, our default).
    # False (default): clean RGB throughout.
    "reference_channel_order": False,
    # Generator (ICN + VUNet) activation dtype: "float32" | "bfloat16". bf16 runs
    # the conv stacks at full MXU rate; params stay f32 and every normalization
    # statistic is computed in f32 (models/layers.py), so the only quantization is
    # the conv I/O — measured ~40 dB PSNR vs f32 on the generators
    # (tests/test_bf16_inference.py). Perception (hourglass/VGG) stays f32.
    "generator_dtype": "float32",
    # Composite stitch strategy: 0 = full-frame scale_and_translate canvases
    # (one per vehicle-step stitch); N > 0 = patch-local stitches into a
    # static N^2 region around each window with a scene-level scalar-cond
    # fallback to the full path when any window exceeds N - 2 (exactness never
    # depends on the bound). A/B'd on the chip at N=768 on the headline scene:
    # 80.6 fps vs 81.3 with the full path — the dynamic_slice/update_slice
    # machinery and the cond boundary eat the ~3.5x resample saving, so the
    # default stays 0 (probed dead end, kept testable).
    "composite_patch": 0,
    # Opaque Pallas fast paths (stem conv ops/pallas_conv.py, rasterizer
    # ops/pallas_raster.py). pallas_call lowers to a custom call with no SPMD
    # sharding rule, so runner.synthesize_scene_sharded disables these under a
    # NamedSharding mesh (they could fail to partition or silently replicate);
    # single-chip serving keeps them on.
    "pallas_kernels": True,
    # Generator sub-batch size: batches beyond this are lax.scan'd in chunks
    # (runner._generate_core). XLA's layout assignment over a monolithic
    # batch-48 generator region emits ~24 ms/scene of relayout copies +
    # materialized reflect-pad/up-stage DUS that it fuses away at batch 24
    # (V=8 trace); a scan body is layout-assigned separately, so every chunk
    # compiles like the clean batch-24 program. 0 disables chunking.
    "gen_chunk": 24,
    # Homography solver for the effectively-4-point planes (roof/front/back —
    # TEXTURE_PLANES rows padded to 6 by repeated corners):
    # True = closed-form unit-square-to-quad construction
    # (find_homography_quad — f32-floor sliver accuracy, no eigensolve in the
    # scene program); False = the normalized DLT on all planes (the pre-round-4
    # path, kept for A/B attribution — tools/compile_probe.py measures its
    # compile-time cost, and the solutions agree on non-degenerate quads).
    "quad_homography": True,
    # int8 post-training-quantized generator convs (models/layers._int8_conv):
    # symmetric dynamic per-input-channel activation scales folded into
    # per-output-channel weight scales, feeding the MXU's double-rate
    # s8xs8->s32 path. Opt-in serving tier covering the instance-normed trunks
    # (ICN, EdgeConnect); VUNet forwards are wrapped in
    # layers.suppress_quantization() (no renorm between its weight-normed
    # convs — rounding compounds, measured 20 dB). Quality pinned in
    # tests/test_int8_inference.py; speed/quality trade in docs/SERVING.md.
    "quantized_convs": False,
}


def configure_models(**kwargs):
    """Override architecture knobs (call before building params / running stages)."""
    unknown = set(kwargs) - set(MODEL_SPEC)
    if unknown:
        raise ValueError(f"unknown model spec keys: {unknown}")
    dtype = kwargs.get("generator_dtype")
    if dtype is not None and dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"generator_dtype must be 'float32' or 'bfloat16', got {dtype!r}"
        )
    MODEL_SPEC.update(kwargs)


def spec_key() -> tuple:
    """Hashable snapshot of MODEL_SPEC.

    Scene-level jits read MODEL_SPEC at TRACE time; their array avals don't change
    when knobs like generator_dtype/warp_plane_res/reference_channel_order are
    toggled, so without this a configure_models() call after the first compile
    would silently keep running the stale program. Every scene-level jit threads
    spec_key() as a static argument so a spec change is a new cache entry
    (retrace), never a silent no-op.
    """
    return tuple(sorted(MODEL_SPEC.items()))


def _generator_dtype():
    return jnp.bfloat16 if MODEL_SPEC["generator_dtype"] == "bfloat16" else jnp.float32


def _maybe_flip_rgb(img):
    """RGB<->BGR flip of the trailing channel axis under reference_channel_order."""
    if MODEL_SPEC["reference_channel_order"]:
        return img[..., ::-1]
    return img


class Models(NamedTuple):
    cad_params: dict
    hourglass_params: dict
    icn_params: dict
    vunet_params: dict

    @staticmethod
    def modules():
        return (
            VGG19Classifier(num_classes=MODEL_SPEC["num_cads"]),
            HourglassNet(
                num_stacks=MODEL_SPEC["num_stacks"],
                num_blocks=MODEL_SPEC["num_blocks"],
                num_classes=MODEL_SPEC["num_keypoints"],
            ),
            GResnet(input_nc=MODEL_SPEC["icn_input_nc"]),
            Vunet(vunet_256=MODEL_SPEC["vunet_256"]),
        )


class Perception(NamedTuple):
    cad_idx: jnp.ndarray  # (V,)
    kp_frame: jnp.ndarray  # (V, 12, 2)
    window: cr.Window  # batched (V,)
    crop: jnp.ndarray  # (V, 256, 256, 3)


def perceive(models: Models, frame: jnp.ndarray, bboxes: jnp.ndarray) -> Perception:
    """Stage 1 (trajectory_inference.py:56-96): square crop, CAD classification,
    keypoint localization, keypoints mapped back to frame coordinates."""
    cad_model, kp_model, _, _ = Models.modules()

    with jax.named_scope("fusg.perceive"):
        def one(bbox):
            window = cr.square_window_from_bbox(bbox)
            crop = cr.crop_resize(frame, window, CROP)
            return window, crop

        window, crop = jax.vmap(one)(bboxes)
        # One true batch-V forward for both perception nets (same rationale as
        # icn_synthesize_batch: a single conv program over the whole batch).
        norm = (_maybe_flip_rgb(crop) - IMAGENET_MEAN) / IMAGENET_STD
        logits = cad_model.apply(models.cad_params, norm)
        heat = kp_model.apply(models.hourglass_params, norm)["heatmaps"][-1]
        kp_norm = decode_heatmaps(heat)
        kp_frame = jax.vmap(cr.crop_to_frame_coords)(kp_norm, window)
        cad_idx = jnp.argmax(logits, axis=-1)
    return Perception(cad_idx, kp_frame, window, crop)


def solve_poses(
    perception: Perception, cad_bank: CadBank, intrinsic: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Stage 2 (trajectory_inference.py:98-105): vmapped CPC PnP."""
    focals = jnp.stack([intrinsic[0, 0], intrinsic[1, 1]])
    centers = jnp.stack([intrinsic[0, 2], intrinsic[1, 2]])
    kp3d = cad_bank.keypoints3d[perception.cad_idx]  # (V, 12, 3)

    def one(kp3d_v, kp2d_v):
        return pnp.solve_pnp_4restarts(kp3d_v, kp2d_v, focals, centers)

    err, rvec, tvec = jax.vmap(one)(kp3d, perception.kp_frame)
    return err, rvec, tvec


def pose_rollout(meter_coords: jnp.ndarray, kp3d: jnp.ndarray):
    """Stage 3: per-step rigid motions INCLUDING the identity step 0.

    Returns (theta (S+1,), translation (S+1, 3)) for meter_coords (T, 2) with
    S = T - 1 future steps.
    """
    r = rollout_from_meters(meter_coords)
    theta = jnp.concatenate([jnp.zeros(1, r.theta.dtype), r.theta])
    tr = jnp.concatenate([jnp.zeros((1, 3), r.translation.dtype), r.translation])
    return theta, tr


def _sketch_window(verts_screen: jnp.ndarray) -> cr.Window:
    """Square crop window from the projected-vertex bbox (== silhouette bbox)."""
    bbox = jnp.stack(
        [
            jnp.min(verts_screen[:, 0]),
            jnp.min(verts_screen[:, 1]),
            jnp.max(verts_screen[:, 0]),
            jnp.max(verts_screen[:, 1]),
        ]
    )
    return cr.square_window_from_bbox(bbox)


def _rotate_lane_major(xyz, rot):
    """(…, 3 xyz, T) row-vectors times rot — component-explicit FMAs (exact f32;
    a matmul would take bf16 MXU passes and relayout the narrow dims)."""
    x, y, z = xyz[..., 0, :], xyz[..., 1, :], xyz[..., 2, :]
    return jnp.stack(
        [
            x * rot[0, 0] + y * rot[1, 0] + z * rot[2, 0],
            x * rot[0, 1] + y * rot[1, 1] + z * rot[2, 1],
            x * rot[0, 2] + y * rot[1, 2] + z * rot[2, 2],
        ],
        axis=-2,
    )


def render_vehicle(
    vertices, corners, corner_normals, extrinsic, intrinsic, theta, translation,
    cull=False,
):
    """Render the posed vehicle's normal sketch at its own crop window.

    vertices (V, 3) define the crop window (projected-vertex bbox, as the
    reference's windowed GL render does); corners/corner_normals are the
    bank's lane-major (3 corners, 3 xyz, T) triangle expansion the gather-free
    rasterizer consumes; ``cull`` is the mesh's CadBank.cullable flag (bool
    scalar, traced OK) enabling exact backface culling. Returns (sketch
    (S, S, 3), vehicle_mask (S, S) bool, window).
    """
    rot = z_rot(theta)
    verts_w = vertices @ rot + translation
    cam_full = rz.Camera.from_intrinsic(intrinsic)
    screen = rz.project_vertices(verts_w, extrinsic, cam_full)
    window = _sketch_window(screen)
    scale = SKETCH_RES / window.w
    cam_crop = cam_full.crop(window.x_start, window.y_start, scale)
    corners_w = _rotate_lane_major(corners, rot) + translation[:, None]
    normals_w = _rotate_lane_major(corner_normals, rot)
    sketch, bg = rz.render_normal_sketch_corners(
        corners_w, normals_w, extrinsic, cam_crop,
        (SKETCH_RES, SKETCH_RES), allow_pallas=MODEL_SPEC["pallas_kernels"],
        cull=cull,
    )
    return sketch, jnp.logical_not(bg), window


# Resolution of the per-vehicle source-texture table the plane warp gathers from.
# Vehicles occupy a few hundred frame pixels, so a 512^2 window resample is
# effectively lossless while keeping the gather table VMEM-sized (the same gathers
# against the full 1080p frame in HBM measured ~10x slower).
SRC_TABLE = 512


@full_precision
def warp_planes_to_crop(
    src_packed: jnp.ndarray,
    src_window: cr.Window,
    src_polys: jnp.ndarray,
    dst_polys: jnp.ndarray,
    src_vis: jnp.ndarray,
    dst_vis: jnp.ndarray,
    dst_window: cr.Window,
) -> jnp.ndarray:
    """Warped texture planes directly in dst-crop coordinates: one gather per plane.

    For dst-crop pixel q: frame point p = window(q); src frame point s = H_f^{-1}(p);
    value = src texture(s mapped into the source window) * [s inside src polygon].
    Skip/symmetry rules as warp_unwarp_planes (warp_learn/planes_utils.py:46-68).

    src_packed is the pack_bilinear_table of the source-pose window resampled to
    SRC_TABLE^2 (built once per vehicle, shared by all steps/planes): TPU gathers
    cost per index, so the packed table's single 12-channel gather per pixel is 4x
    faster than 4-tap bilinear.

    The table holds SIGNED-LAB values (converted once per vehicle — converting the
    24 warped outputs per scene measured ~40 ms of pure colorspace math; warping in
    LAB vs converting after warping differs only in the interpolation blend space,
    below quantization). Masked-out pixels get LAB_BLACK_SIGNED, matching the
    reference's post-conversion black. Returns (5, S, S, 3) signed LAB.

    Contract: ``src_polys``/``dst_polys`` follow the TEXTURE_PLANES topology —
    the roof/front/back rows are 4-point quads padded to 6 by repeated
    corners. Their homographies use the closed-form 4-point solve on the first
    4 vertices (MODEL_SPEC["quad_homography"]), which equals the 6-row least
    squares ONLY under that padding; arbitrary 6-distinct-point polygons in
    those slots would get a 4-point fit.
    """
    from future_urban_scene_generation_tpu.ops.warp import bilinear_sample_packed

    s_res = SKETCH_RES
    left, right = vis.SYMMETRY_PAIR
    table = src_packed.shape[0] - 1  # packed table is (T+1, T+1, 12)

    # dst-crop pixel centers -> frame coords (resize convention).
    qs = (jnp.arange(s_res, dtype=jnp.float32) + 0.5) / s_res
    px = dst_window.x_start + qs[None, :] * dst_window.w - 0.5
    py = dst_window.y_start + qs[:, None] * dst_window.h - 0.5
    px = jnp.broadcast_to(px, (s_res, s_res))
    py = jnp.broadcast_to(py, (s_res, s_res))

    def inside_poly(pts_x, pts_y, poly):
        inside = jnp.zeros(pts_x.shape, bool)
        k = poly.shape[0]
        for e in range(k):
            x1, y1 = poly[e, 0], poly[e, 1]
            x2, y2 = poly[(e + 1) % k, 0], poly[(e + 1) % k, 1]
            straddle = (y1 > pts_y) != (y2 > pts_y)
            denom = jnp.where(y2 == y1, 1.0, y2 - y1)
            x_cross = x1 + (pts_y - y1) * (x2 - x1) / denom
            inside = inside ^ (straddle & (pts_x < x_cross))
        return inside

    out = jnp.broadcast_to(
        LAB_BLACK_SIGNED,
        (vis.NUM_TEXTURE_PLANES, s_res, s_res, src_packed.shape[-1] // 4),
    )

    r = int(MODEL_SPEC["warp_plane_res"])

    def warp_one(src_idx, dst_idx, extra_skip, quad=False):
        """One homography + one packed gather; returns (tex, slot one-hot weight).

        ``quad=True`` (static) marks the effectively-4-point planes: their
        TEXTURE_PLANES rows pad to 6 by repeating the last corner, so the
        closed-form exact-interpolation solve (find_homography_quad) equals
        the 6-row least squares while skipping the DLT eigensolve — which on
        sliver quads carried multi-pixel f32 transfer error and on TPU is a
        latency-bound while_loop. The 6-distinct-point side planes keep the
        DLT (+ its analytic GN polish; refine=False skips the jacfwd sampson
        pass whose 50 subgraphs bottlenecked the remote compile)."""
        if quad and not MODEL_SPEC["quad_homography"]:
            quad = False  # A/B attribution knob: force the DLT on all planes
        if quad:
            h12, valid = find_homography_quad(
                src_polys[src_idx][:4], dst_polys[dst_idx][:4]
            )
        else:
            h12, valid = find_homography(
                src_polys[src_idx], dst_polys[dst_idx], refine=False
            )
        h_inv = jnp.linalg.inv(h12)

        def sample(gx, gy):
            denom = h_inv[2, 0] * gx + h_inv[2, 1] * gy + h_inv[2, 2]
            denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            sx = (h_inv[0, 0] * gx + h_inv[0, 1] * gy + h_inv[0, 2]) / denom
            sy = (h_inv[1, 0] * gx + h_inv[1, 1] * gy + h_inv[1, 2]) / denom
            # Frame coords -> src-table coords (inverse of the crop_resize map).
            tx = (sx - src_window.x_start + 0.5) * (table / src_window.w) - 0.5
            ty = (sy - src_window.y_start + 0.5) * (table / src_window.h) - 0.5
            tex = bilinear_sample_packed(src_packed, tx, ty).astype(jnp.float32)
            mask = inside_poly(sx, sy, src_polys[src_idx])
            return jnp.where(mask[..., None], tex, LAB_BLACK_SIGNED)

        if r == s_res:
            tex = sample(px, py)
        else:
            # Reduced-resolution warp: the gather is HBM-latency bound (cost per
            # INDEX), so sample an r^2 grid over the DST POLYGON'S BBOX only and
            # paste it into the crop with one scale_and_translate (MXU). Planes
            # cover a fraction of the crop, so the bbox grid often matches or
            # exceeds the output's effective resolution; the extra bilinear
            # resample mirrors the reference's own warp->crop->resize chain
            # (PARITY.md §3). 128 vs exact-256 measured ~2x faster warps.
            poly_d = dst_polys[dst_idx]
            pad = 1.0
            bx0 = jnp.min(poly_d[:, 0]) - pad
            bx1 = jnp.max(poly_d[:, 0]) + pad
            by0 = jnp.min(poly_d[:, 1]) - pad
            by1 = jnp.max(poly_d[:, 1]) + pad
            bw = jnp.maximum(bx1 - bx0, 1e-3)
            bh = jnp.maximum(by1 - by0, 1e-3)
            qs_r = (jnp.arange(r, dtype=jnp.float32) + 0.5) / r
            gx = jnp.broadcast_to(bx0 + qs_r[None, :] * bw, (r, r))
            gy = jnp.broadcast_to(by0 + qs_r[:, None] * bh, (r, r))
            rel = sample(gx, gy) - LAB_BLACK_SIGNED  # masked pixels -> exactly 0
            # Paste into crop coordinates: crop c = a*x + b per axis.
            ax = s_res / dst_window.w
            ay = s_res / dst_window.h
            b_x = -ax * dst_window.x_start + 0.5 * ax - 0.5
            b_y = -ay * dst_window.y_start + 0.5 * ay - 0.5
            scale = jnp.stack([ay * bh / r, ax * bw / r])
            translation = jnp.stack([ay * by0 + b_y, ax * bx0 + b_x])
            pasted = jax.image.scale_and_translate(
                rel, (s_res, s_res, rel.shape[-1]), (0, 1), scale, translation,
                method="linear",
            )
            tex = pasted + LAB_BLACK_SIGNED  # zero-fill outside bbox -> black

        ok = valid & jnp.logical_not(extra_skip)
        write = (
            jax.nn.one_hot(dst_idx, vis.NUM_TEXTURE_PLANES, dtype=jnp.float32)
            * ok.astype(jnp.float32)
        )[:, None, None, None]
        return tex, write

    # The left/right side planes are opposite faces — a physical camera never sees
    # both, so they share ONE gather (20% of the warp's gather cost): the source
    # side is whichever is src-visible, the destination slot whichever is
    # dst-visible (the reference's symmetry substitution, planes_utils.py:46-68,
    # produces the same single write for every physically realizable visibility
    # combination).
    side_src = jnp.where(src_vis[left], left, right)
    side_dst = jnp.where(dst_vis[left], left, right)
    side_skip = jnp.logical_not(
        (src_vis[left] | src_vis[right]) & (dst_vis[left] | dst_vis[right])
    )
    tex, write = warp_one(side_src, side_dst, side_skip)
    out = out * (1.0 - write) + tex[None] * write

    # Front/back are opposite faces too, so they also share ONE gather. Unlike
    # the sides there is no cross-substitution (planes_utils.py:58-60: a
    # non-symmetry plane warps only src slot i -> dst slot i), so the pair's
    # single active warp is front->front or back->back — never both: opposite
    # faces are never co-visible BY CONSTRUCTION
    # (visibility._demote_covisible_pairs keeps the larger face when the bare
    # 0.9 rule would pass both in degenerate sliver poses; pose-sweep evidence
    # in test_warp_planes.py::test_front_back_never_covisible).
    front, back = vis.OPPOSITE_PAIR
    fb_front = src_vis[front] & dst_vis[front]
    fb_back = src_vis[back] & dst_vis[back]
    fb_idx = jnp.where(fb_front, front, back)
    tex, write = warp_one(
        fb_idx, fb_idx, jnp.logical_not(fb_front | fb_back), quad=True
    )
    out = out * (1.0 - write) + tex[None] * write

    for i in range(vis.NUM_TEXTURE_PLANES):
        if i in (left, right, front, back):
            continue
        skip = jnp.logical_not(src_vis[i]) | jnp.logical_not(dst_vis[i])
        tex, write = warp_one(jnp.asarray(i), jnp.asarray(i), skip, quad=True)
        out = out * (1.0 - write) + tex[None] * write
    return out


def central_crop_patch(frame: jnp.ndarray, bbox_window: cr.Window) -> jnp.ndarray:
    """The 20%-side central patch of the bbox crop, resized to 256^2 — the ICN
    appearance prior (warp_learn/vehicle_utils.py:35-53)."""
    crop = cr.crop_resize(frame, bbox_window, CROP)
    offset = int(CROP * 0.1)
    patch_win = cr.Window(
        jnp.float32(CROP // 2 - offset),
        jnp.float32(CROP // 2 - offset),
        jnp.float32(2 * offset),
        jnp.float32(2 * offset),
    )
    return cr.crop_resize(crop, patch_win, CROP)


def _to_signed_lab(rgb01):
    return cs.rgb_to_lab(rgb01) * 2.0 - 1.0


# Signed-LAB value of RGB black — what the reference's masked-out plane pixels become
# after cvtColor + ToTensor + Normalize (L=0, a=b=128/255 -> (-1, ~0.004, ~0.004)).
LAB_BLACK_SIGNED = jnp.asarray([-1.0, 2.0 * 128.0 / 255.0 - 1.0, 2.0 * 128.0 / 255.0 - 1.0])


def icn_synthesize(
    models: Models,
    dst_sketch: jnp.ndarray,
    central_patch_lab: jnp.ndarray,
    planes_warped_lab: jnp.ndarray,
):
    """Assemble the 21-channel LAB input (warp_learn/models.py:323-366) and run ICN.
    ``planes_warped_lab`` arrives already in signed LAB (see warp_planes_to_crop).
    Returns RGB [0, 1] (256, 256, 3)."""
    return icn_synthesize_batch(
        models, dst_sketch[None], central_patch_lab[None], planes_warped_lab[None]
    )[0]


def _icn_stem_kernel_bias(icn_params):
    """The stem Conv2dBlock's (kernel, bias) — enc_content/model_0/conv."""
    p = icn_params["params"]["enc_content"]["model_0"]["conv"]
    return p["kernel"], p["bias"]


def _icn_fused_stem_eligible(icn_params) -> bool:
    """Gate for the three-piece fused Pallas stem (icn_stem_conv_fused):
    same conditions as layers._dispatch_conv's Pallas path (TPU + bf16 +
    pallas_kernels on), plus the stock 7x7/21ch stem architecture."""
    kernel, _ = _icn_stem_kernel_bias(icn_params)
    return (
        _generator_dtype() == jnp.bfloat16
        and jax.default_backend() == "tpu"
        and layers._pallas_kernels_enabled()
        and kernel.shape[0] == 7
        and kernel.shape[2] == 21
    )


def _icn_fused_forward(models: Models, icn_model, dst_sketches, central_lab,
                       planes_lab, s_repeat: int, interpret: bool = False):
    """ICN forward with the stem computed by the fused three-piece Pallas
    kernel: the 21-channel input concat, its stem-layout transpose and the
    central-patch jnp.repeat never materialize (at batch 48 XLA emitted them
    as ~16 ms of dynamic-update-slices + copies — the V=8 scaling cliff,
    docs/SERVING.md). Bit-identical to the concat path: same 147-row dot
    operands, same kernel matrix (ops/pallas_conv._conv_kernel_v2_fused)."""
    from future_urban_scene_generation_tpu.ops.pallas_conv import (
        icn_stem_conv_fused,
    )

    kernel, bias = _icn_stem_kernel_bias(models.icn_params)
    dtype = _generator_dtype()
    stem = icn_stem_conv_fused(
        _to_signed_lab(dst_sketches).astype(dtype),
        central_lab.astype(dtype),
        planes_lab.astype(dtype),
        kernel.astype(dtype),
        s_repeat=s_repeat,
        interpret=interpret,
    )
    stem = stem + bias.astype(stem.dtype)
    # The stem Conv2dBlock's epilogue (norm="inst", activ="relu").
    stem = jax.nn.relu(layers.instance_norm(stem))
    return icn_model.apply(models.icn_params, stem, from_stem=True)


def icn_synthesize_batch(
    models: Models,
    dst_sketches: jnp.ndarray,  # (N, 256, 256, 3)
    central_lab: jnp.ndarray,  # (N // s_repeat, 256, 256, 3) signed LAB
    planes_lab: jnp.ndarray,  # (N, 5, 256, 256, 3) signed LAB
    s_repeat: int = 1,
) -> jnp.ndarray:
    """One true batch-N ICN forward. The scene runner flattens its (V, S) axes
    into N here instead of nesting vmaps of batch-1 applies: one conv program at
    batch N gives XLA the full batch for MXU tiling and amortizes the
    lane-starved stem/head convolutions (measured ~15% over vmapped batch-1 at
    N=24 on v5e). ``central_lab`` may carry only the per-vehicle axis with
    ``s_repeat`` = steps-per-vehicle; the fused stem path reads it via an
    i // s_repeat block index (no repeat copy), the fallback repeats it."""
    _, _, icn_model, _ = Models.modules()
    with jax.named_scope("fusg.icn"):
        if _icn_fused_stem_eligible(models.icn_params):
            out = _icn_fused_forward(
                models, icn_model, dst_sketches, central_lab, planes_lab,
                s_repeat,
            )
        else:
            sketch_lab = _to_signed_lab(dst_sketches)
            if s_repeat != 1:
                central_lab = jnp.repeat(central_lab, s_repeat, axis=0)
            planes_cat = jnp.moveaxis(planes_lab, 1, 3).reshape(
                planes_lab.shape[:1] + planes_lab.shape[2:4] + (-1,)
            )  # (N, 256, 256, 15) — channel order [plane0 | ... | plane4]
            inp = jnp.concatenate([sketch_lab, central_lab, planes_cat], axis=-1)
            inp = inp.astype(_generator_dtype())
            out = icn_model.apply(models.icn_params, inp)  # (N, .., 3) [-1, 1]
        out = out.astype(jnp.float32)
        return cs.lab_to_rgb((out + 1.0) / 2.0)


def vunet_encode_appearance(models: Models, frame, src_sketch, src_mask, src_window):
    """Appearance encoding, once per vehicle (trajectory_inference.py:205-231).

    x = [masked vehicle RGB (white background), src sketch], both [-1, 1].
    """
    windows = jax.tree.map(lambda f: f[None], src_window)
    return vunet_encode_appearance_batch(
        models, frame, src_sketch[None], src_mask[None], windows
    )


def vunet_encode_appearance_batch(models: Models, frame, src_sketches, src_masks,
                                  src_windows):
    """Batch-V appearance encoding: one encoder apply over all vehicles."""
    _, _, _, vunet_model = Models.modules()
    with jax.named_scope("fusg.vunet_encode"):
        veh = jax.vmap(lambda w: cr.crop_resize(frame, w, CROP))(src_windows)
        veh = _maybe_flip_rgb(veh)
        masked = jnp.where(src_masks[..., None], veh, 1.0)  # white background
        sketches = _maybe_flip_rgb(src_sketches)  # trajectory_inference.py:225-227
        x = jnp.concatenate([masked * 2.0 - 1.0, sketches * 2.0 - 1.0], axis=-1)
        x = x.astype(_generator_dtype())
        # int8 tier: VUNet stays float — its weight-normed stack compounds
        # per-conv rounding (layers.suppress_quantization docstring).
        with layers.suppress_quantization():
            return vunet_model.apply(
                models.vunet_params, x, cov=0.0, method=Vunet.encode_appearance
            )


def vunet_synthesize(models: Models, dst_sketch, mu_app):
    """Per-step VUNet decode (trajectory_inference.py:232-234, 424-426).
    ``mu_app`` carries the encoder's leading batch dim (1 from
    vunet_encode_appearance)."""
    return vunet_decode_batch(models, dst_sketch[None], mu_app)[0]


def vunet_decode_batch(models: Models, dst_sketches, mu_app):
    """One batch-N VUNet shape-decode; ``mu_app`` leaves must have leading N."""
    _, _, _, vunet_model = Models.modules()
    with jax.named_scope("fusg.vunet_decode"):
        dtype = _generator_dtype()
        y_tilde = (_maybe_flip_rgb(dst_sketches) * 2.0 - 1.0).astype(dtype)
        mu_app = jax.tree_util.tree_map(lambda a: a.astype(dtype), mu_app)
        with layers.suppress_quantization():
            out = vunet_model.apply(
                models.vunet_params, y_tilde, mu_app, cov=0.0, method=Vunet.decode_shape
            )
        out = out.astype(jnp.float32)
        return jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)


def composite_step_patch(background, crops, windows, masks, patch: int):
    """:func:`composite_step` via patch-local stitches (static patch^2 regions
    around each window instead of full-frame canvases). Only exact when every
    window fits patch - 2 per axis (see composite_frames' guard)."""

    def body(frame, inp):
        crop_img, win_fields, mask = inp
        return cr.stitch_packed_patch(
            frame, crop_img, cr.Window(*win_fields), mask, (patch, patch)
        ), None

    with jax.named_scope("fusg.composite"):
        win_tuple = (windows.x_start, windows.y_start, windows.w, windows.h)
        out, _ = jax.lax.scan(
            body, background, (crops, win_tuple, masks), unroll=True
        )
    return out


def composite_frames(backgrounds, crops, win_fields, masks):
    """Composite S frames of V vehicles each: vmapped :func:`composite_step`,
    with a patch-local fast path when MODEL_SPEC["composite_patch"] > 0.

    backgrounds (S, H, W, 3); crops (S, V, 256, 256, 3); win_fields tuple of
    4 (S, V) arrays; masks (S, V, 256, 256) bool. The patch/full decision is
    ONE scalar over the whole scene (any window too big -> full-frame path),
    so the cond stays a real branch (a vmapped per-step predicate would lower
    to select and run BOTH paths).
    """
    h, w = backgrounds.shape[1], backgrounds.shape[2]
    patch = int(MODEL_SPEC["composite_patch"])

    def run(step_fn, args):
        bgs, crops_, wins_, masks_ = args

        def per_step(bg_s, crops_s, win_s, masks_s):
            return step_fn(bg_s, crops_s, cr.Window(*win_s), masks_s)

        return jax.vmap(per_step)(bgs, crops_, wins_, masks_)

    args = (backgrounds, crops, win_fields, masks)
    if patch <= 0 or (h <= patch and w <= patch):
        # Patch off, or the patch IS the frame — plain full-frame path.
        return run(composite_step, args)
    fits = jnp.all((win_fields[2] <= patch - 2) & (win_fields[3] <= patch - 2))
    return jax.lax.cond(
        fits,
        lambda a: run(lambda *x: composite_step_patch(*x, patch), a),
        lambda a: run(composite_step, a),
        args,
    )


def composite_step(background, crops, windows, masks):
    """Composite V vehicles into one frame, in vehicle order (sequential overwrite as
    the reference's accumulation into result_frames, trajectory_inference.py:197-198).

    crops: (V, 256, 256, 3); windows: batched Window (V,); masks: (V, 256, 256) bool.
    """

    # bf16 canvases under the bf16 serving config: the full-frame resample
    # canvas is the composite's dominant HBM traffic, and its quantization
    # (~4e-3 on stitched pixels only) matches the generator-dtype quality
    # budget (tests/test_bf16_inference.py). f32 configs stay exact.
    resample_dtype = (
        jnp.bfloat16 if MODEL_SPEC["generator_dtype"] == "bfloat16" else None
    )

    def body(frame, inp):
        crop_img, win_fields, mask = inp
        # Packed stitch: color + crop-resolution mask in ONE full-frame
        # scale_and_translate (the composite is HBM-bound; see
        # ops/crop.stitch_packed for the equivalence argument).
        return cr.stitch_packed(
            frame, crop_img, cr.Window(*win_fields), mask,
            resample_dtype=resample_dtype,
        ), None

    with jax.named_scope("fusg.composite"):
        win_tuple = (windows.x_start, windows.y_start, windows.w, windows.h)
        # Full unroll: V is small and static; the rolled scan's while-loop
        # machinery showed up as unattributed wrapper time in traces.
        out, _ = jax.lax.scan(
            body, background, (crops, win_tuple, masks), unroll=True
        )
    return out


def _mask_to_frame(mask_crop, window: cr.Window, hw) -> jnp.ndarray:
    """Sample a crop-resolution mask at frame pixels inside the window (separable
    scale_and_translate of the float mask, thresholded — gather-free)."""
    h, w = hw
    s = mask_crop.shape[0]
    canvas = jax.image.scale_and_translate(
        mask_crop.astype(jnp.float32)[..., None],
        (h, w, 1),
        (0, 1),
        jnp.stack([window.h / s, window.w / s]),
        jnp.stack([window.y_start, window.x_start]),
        method="linear",
        antialias=False,
    )[..., 0]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    inside = (
        (xs >= window.x_start)
        & (xs < window.x_start + window.w)
        & (ys >= window.y_start)
        & (ys < window.y_start + window.h)
    )
    return (canvas > 0.5) & inside
