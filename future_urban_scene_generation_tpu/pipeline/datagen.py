"""Synthetic training-pair generation for the ICN / VUNet / EdgeConnect trainers.

The reference ships training machinery but no data pipeline at all (SURVEY §2.1
"vestigial"; its generators were trained on Pascal3D+/CityFlow crops offline). This
module closes that gap framework-natively: it reuses the pipeline's own geometry —
CAD rendering, visibility, plane warping — to synthesize aligned (input, target)
pairs on device, so the trainers are runnable end-to-end without external datasets
and real-data loaders only need to match the same sample pytrees.

Samples (all NHWC float32):
* ICN:   x = 21ch LAB [-1,1] (dst sketch + central prior + 5 warped planes),
         y = dst-view vehicle RGB in LAB [-1,1];
* VUNet: y_tilde = dst sketch, x_app = [masked vehicle | src sketch], target = dst view;
* EdgeConnect: (image, gray, canny edges, random box mask) from composited scenes.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.geometry.projection import project_points_extrinsic
from future_urban_scene_generation_tpu.geometry.rotations import x_rot, z_rot
from future_urban_scene_generation_tpu.ops import colorspace as cs
from future_urban_scene_generation_tpu.ops import crop as cr
from future_urban_scene_generation_tpu.ops.canny import canny
from future_urban_scene_generation_tpu.ops.warp import pack_bilinear_table
from future_urban_scene_generation_tpu.pipeline import stages
from future_urban_scene_generation_tpu.render import visibility as vis


class ICNSample(NamedTuple):
    inputs: jnp.ndarray  # (B, 256, 256, 21) LAB [-1, 1]
    targets: jnp.ndarray  # (B, 256, 256, 3) LAB [-1, 1]


class CadSample(NamedTuple):
    images: jnp.ndarray  # (B, 256, 256, 3) [0, 1] sketch renders
    labels: jnp.ndarray  # (B,) int32 CAD-bank index


class HourglassSample(NamedTuple):
    images: jnp.ndarray  # (B, 256, 256, 3) [0, 1] sketch renders
    kp_norm: jnp.ndarray  # (B, 12, 2) keypoints in crop coords, [0, 1]


class VunetSample(NamedTuple):
    y_tilde: jnp.ndarray  # (B, 256, 256, 3) [-1, 1]
    x_app: jnp.ndarray  # (B, 256, 256, 6) [-1, 1]
    target: jnp.ndarray  # (B, 256, 256, 3) [-1, 1]


def _random_pose(key, intrinsic):
    k1, k2, k3 = jax.random.split(key, 3)
    yaw = jax.random.uniform(k1, (), minval=0.0, maxval=2.0 * jnp.pi)
    tilt = jax.random.uniform(k2, (), minval=-1.45, maxval=-1.1)
    dist = jax.random.uniform(k3, (), minval=12.0, maxval=28.0)
    r = x_rot(tilt) @ z_rot(yaw)
    ext = jnp.eye(4).at[:3, :3].set(r).at[:3, 3].set(jnp.stack([0.0, 1.0, dist]))
    return ext


def _vehicle_views(key, cad_bank, intrinsic, frame_hw, vis_res):
    """Render src + dst views of a random CAD at a random pose and heading delta."""
    kc, kp_, kd = jax.random.split(key, 3)
    cad_idx = jax.random.randint(kc, (), 0, cad_bank.vertices.shape[0])
    verts = cad_bank.vertices[cad_idx]
    corners = cad_bank.corners[cad_idx]
    corner_normals = cad_bank.corner_normals[cad_idx]
    kp3d = cad_bank.keypoints3d[cad_idx]
    ext = _random_pose(kp_, intrinsic)
    dtheta = jax.random.uniform(kd, (), minval=-0.6, maxval=0.6)

    def view(theta):
        sketch, mask, window = stages.render_vehicle(
            verts, corners, corner_normals, ext, intrinsic, theta, jnp.zeros(3)
        )
        kp3d_s = kp3d @ z_rot(theta)
        kp2d_s = project_points_extrinsic(kp3d_s, intrinsic, ext)
        visibility = vis.compute_visibility_local(ext, kp2d_s, kp3d_s, res=vis_res)
        polys = jnp.trunc(kp2d_s)[jnp.asarray(vis.TEXTURE_PLANES)]
        return sketch, mask, window, visibility[:5], polys

    src = view(jnp.float32(0.0))
    dst = view(dtheta)
    return src, dst, cad_idx


def icn_batch(
    key, cad_bank, frame: jnp.ndarray, intrinsic, batch: int = 4,
    frame_hw=(720, 1280), vis_res: int = 192,
) -> ICNSample:
    """Self-supervised ICN pairs: the 'texture' comes from pasting the src sketch
    onto the provided frame (a stand-in for real video appearance), and the target
    is the dst-view rendering of the same textured vehicle."""
    return _icn_batch_impl(
        key, cad_bank, frame, intrinsic, batch=batch, frame_hw=frame_hw,
        vis_res=vis_res, spec=stages.spec_key(),
    )


# spec: MODEL_SPEC (warp_plane_res) is read at trace time via warp_planes_to_crop —
# see stages.spec_key().
@partial(jax.jit, static_argnames=("batch", "frame_hw", "vis_res", "spec"))
def _icn_batch_impl(
    key, cad_bank, frame: jnp.ndarray, intrinsic, batch, frame_hw, vis_res, spec,
) -> ICNSample:

    def one(k):
        src, dst, _ = _vehicle_views(k, cad_bank, intrinsic, frame_hw, vis_res)
        (s_sk, s_mask, s_win, s_vis, s_polys) = src
        (d_sk, d_mask, d_win, d_vis, d_polys) = dst
        # Textured frame: paste the src sketch into the frame at its window.
        textured = cr.stitch(
            frame, s_sk, s_win, stages._mask_to_frame(s_mask, s_win, frame.shape[:2])
        )
        src_packed = pack_bilinear_table(
            stages._to_signed_lab(cr.crop_resize(textured, s_win, stages.SRC_TABLE))
        )
        planes = stages.warp_planes_to_crop(
            src_packed, s_win, s_polys, d_polys, s_vis, d_vis, d_win
        )
        central = stages._to_signed_lab(stages.central_crop_patch(textured, s_win))
        sketch_lab = stages._to_signed_lab(d_sk)
        planes_lab = jnp.concatenate(list(planes), axis=-1)
        x = jnp.concatenate([sketch_lab, central, planes_lab], axis=-1)
        y = stages._to_signed_lab(d_sk * d_mask[..., None])
        return x, y

    keys = jax.random.split(key, batch)
    xs, ys = jax.vmap(one)(keys)
    return ICNSample(xs, ys)


def vunet_batch(
    key, cad_bank, frame: jnp.ndarray, intrinsic, batch: int = 4,
    frame_hw=(720, 1280), vis_res: int = 192,
) -> VunetSample:
    return _vunet_batch_impl(
        key, cad_bank, frame, intrinsic, batch=batch, frame_hw=frame_hw,
        vis_res=vis_res, spec=stages.spec_key(),
    )


# spec: threaded like _icn_batch_impl so any MODEL_SPEC read this trace picks up
# (today the rasterizer's pallas_kernels gate via _vehicle_views; tomorrow e.g.
# _maybe_flip_rgb) retraces after configure_models() instead of silently
# serving a stale program.
@partial(jax.jit, static_argnames=("batch", "frame_hw", "vis_res", "spec"))
def _vunet_batch_impl(
    key, cad_bank, frame: jnp.ndarray, intrinsic, batch, frame_hw, vis_res, spec,
) -> VunetSample:
    def one(k):
        src, dst, _ = _vehicle_views(k, cad_bank, intrinsic, frame_hw, vis_res)
        (s_sk, s_mask, s_win, _, _) = src
        (d_sk, d_mask, _, _, _) = dst
        veh = cr.crop_resize(frame, s_win, stages.CROP)
        masked = jnp.where(s_mask[..., None], veh, 1.0)
        x_app = jnp.concatenate([masked * 2 - 1, s_sk * 2 - 1], axis=-1)
        y_tilde = d_sk * 2.0 - 1.0
        target = (d_sk * d_mask[..., None]) * 2.0 - 1.0
        return y_tilde, x_app, target

    keys = jax.random.split(key, batch)
    y, x, t = jax.vmap(one)(keys)
    return VunetSample(y, x, t)


def cad_batch(key, cad_bank, intrinsic, batch: int = 8) -> CadSample:
    """Classification pairs for the CAD-classifier trainer: a random bank entry
    rendered at a random pose, labeled by its bank index. The reference's
    classifier picks which of 10 Pascal3D+ CADs matches a real crop
    (run_test.py:45-58); this synthetic stand-in makes the discrimination task
    REAL (shape-dependent sketches) rather than the earlier random-label
    mechanics demo whose loss sat at ln(10) by construction."""
    return _cad_batch_impl(key, cad_bank, intrinsic, batch=batch,
                           spec=stages.spec_key())


@partial(jax.jit, static_argnames=("batch", "spec"))
def _cad_batch_impl(key, cad_bank, intrinsic, batch, spec) -> CadSample:
    def one(k):
        kc, kp_ = jax.random.split(k)
        cad_idx = jax.random.randint(kc, (), 0, cad_bank.vertices.shape[0])
        ext = _random_pose(kp_, intrinsic)
        sketch, _mask, _win = stages.render_vehicle(
            cad_bank.vertices[cad_idx], cad_bank.corners[cad_idx],
            cad_bank.corner_normals[cad_idx], ext, intrinsic,
            jnp.float32(0.0), jnp.zeros(3),
        )
        return sketch, cad_idx

    keys = jax.random.split(key, batch)
    images, labels = jax.vmap(one)(keys)
    return CadSample(images, labels.astype(jnp.int32))


def hourglass_batch(key, cad_bank, intrinsic, batch: int = 4) -> HourglassSample:
    """Keypoint pairs for the hourglass trainer: sketch renders + the 12 CAD
    keypoints projected into the crop window, normalized to [0, 1] (the
    coordinate frame get_maxima decodes to, utils/keypoint_utils.py:66-92).
    Replaces the earlier random-image/random-keypoint mechanics demo with a
    learnable localization task."""
    return _hourglass_batch_impl(key, cad_bank, intrinsic, batch=batch,
                                 spec=stages.spec_key())


@partial(jax.jit, static_argnames=("batch", "spec"))
def _hourglass_batch_impl(key, cad_bank, intrinsic, batch, spec) -> HourglassSample:
    def one(k):
        kc, kp_ = jax.random.split(k)
        cad_idx = jax.random.randint(kc, (), 0, cad_bank.vertices.shape[0])
        ext = _random_pose(kp_, intrinsic)
        sketch, _mask, win = stages.render_vehicle(
            cad_bank.vertices[cad_idx], cad_bank.corners[cad_idx],
            cad_bank.corner_normals[cad_idx], ext, intrinsic,
            jnp.float32(0.0), jnp.zeros(3),
        )
        kp2d = project_points_extrinsic(
            cad_bank.keypoints3d[cad_idx], intrinsic, ext
        )
        kp_norm = (kp2d - jnp.stack([win.x_start, win.y_start])) / win.w
        return sketch, jnp.clip(kp_norm, 0.0, 1.0)

    keys = jax.random.split(key, batch)
    images, kps = jax.vmap(one)(keys)
    return HourglassSample(images, kps)


@partial(jax.jit, static_argnames=("sigma",))
def edgeconnect_batch(key, images: jnp.ndarray, sigma: float = 2.0):
    """(gray, edges, random box masks) from a batch of RGB images — the inputs the
    EdgeConnect trainers consume (edgeconnect masks are 'external' boxes here)."""
    b, h, w, _ = images.shape
    gray = cs.rgb_to_gray(images)

    def edges_one(g):
        return canny(g[..., 0], sigma=sigma).astype(jnp.float32)[..., None]

    edges = jax.vmap(edges_one)(gray)

    def mask_one(k):
        k1, k2 = jax.random.split(k)
        y0 = jax.random.randint(k1, (), 0, h // 2)
        x0 = jax.random.randint(k2, (), 0, w // 2)
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        box = ((ys >= y0) & (ys < y0 + h // 3) & (xs >= x0) & (xs < x0 + w // 3))
        return box.astype(jnp.float32)[..., None]

    masks = jax.vmap(mask_one)(jax.random.split(key, b))
    return gray, edges, masks
