"""Background vehicle erasure: segmentation -> EdgeConnect two-stage inpainting.

Parity target: the inpaint branch of traj_test (trajectory_inference.py:107-145) +
utils/inpaint_utils.py:22-58. Per vehicle: a 1.3x context box around the bbox, the
segmentation mask dilated with the 8x8 elliptical SE, the masked region painted white,
Canny edges outside the mask (sigma = config.SIGMA), the edge generator then the
inpaint generator, and the merged crop pasted back.

The segmenter is pluggable (models/detector.py); everything else is jittable with
fixed shapes (256^2 context crops via one fused gather).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.models.edgeconnect import (
    EdgeGenerator,
    InpaintGenerator,
    edge_model_forward,
    inpaint_model_forward,
)
from future_urban_scene_generation_tpu.ops import colorspace as cs
from future_urban_scene_generation_tpu.ops import crop as cr
from future_urban_scene_generation_tpu.ops.canny import canny
from future_urban_scene_generation_tpu.ops.morphology import dilate, elliptical_kernel

_DILATE_SE = elliptical_kernel(8)  # utils/inpaint_utils.py:42
RES = 256


def context_window(bbox_xyxy, frame_hw, scale: float = 1.3) -> cr.Window:
    """The reference's 1.3x context box: int-truncated rescale about center, clipped
    to frame bounds (utils/inpaint_utils.py:23 + utils/bounding_box.py:29-51)."""
    h, w = frame_hw
    x_min = jnp.trunc(bbox_xyxy[0])
    y_min = jnp.trunc(bbox_xyxy[1])
    x_max = x_min + jnp.trunc(bbox_xyxy[2] - bbox_xyxy[0])
    y_max = y_min + jnp.trunc(bbox_xyxy[3] - bbox_xyxy[1])
    bw = x_max - x_min
    bh = y_max - y_min
    dw = jnp.floor(jnp.trunc(bw * scale - bw) / 2.0)
    dh = jnp.floor(jnp.trunc(bh * scale - bh) / 2.0)
    x0 = jnp.maximum(x_min - dw, 0.0)
    y0 = jnp.maximum(y_min - dh, 0.0)
    x1 = jnp.minimum(x_max + dw, w - 1.0)
    y1 = jnp.minimum(y_max + dh, h - 1.0)
    return cr.Window(x0, y0, x1 - x0, y1 - y0)


def _mask_crop_nearest(mask: jnp.ndarray, window: cr.Window, out: int) -> jnp.ndarray:
    """Nearest-sample an (H, W) bool mask into the window at out^2."""
    h, w = mask.shape
    coords = (jnp.arange(out, dtype=jnp.float32) + 0.5) / out
    xs = jnp.clip(window.x_start + coords[None, :] * window.w - 0.5, 0, w - 1)
    ys = jnp.clip(window.y_start + coords[:, None] * window.h - 0.5, 0, h - 1)
    xi = jnp.round(jnp.broadcast_to(xs, (out, out))).astype(jnp.int32)
    yi = jnp.round(jnp.broadcast_to(ys, (out, out))).astype(jnp.int32)
    return mask[yi, xi]


@partial(jax.jit, static_argnames=("sigma",))
def erase_vehicle(
    edge_params,
    inpaint_params,
    frame: jnp.ndarray,
    bbox_xyxy: jnp.ndarray,
    mask_frame: jnp.ndarray,
    sigma: float = 2.0,
) -> jnp.ndarray:
    """Remove one vehicle from the frame. mask_frame: (H, W) bool segmentation."""
    h, w = frame.shape[0], frame.shape[1]
    window = context_window(bbox_xyxy, (h, w))

    mask_d = dilate(mask_frame, _DILATE_SE)
    frame_white = jnp.where(mask_d[..., None], 1.0, frame)

    img = cr.crop_resize(frame_white, window, RES)  # (256, 256, 3)
    mask_c = _mask_crop_nearest(mask_d, window, RES)
    mask_f = mask_c.astype(frame.dtype)[..., None]
    gray = cs.rgb_to_gray(img)

    edge = canny(gray[..., 0], sigma=sigma, mask=jnp.logical_not(mask_c))
    edge = edge.astype(frame.dtype)[..., None]

    edge_out = edge_model_forward(
        edge_params, gray[None], edge[None], mask_f[None], generator=EdgeGenerator()
    )
    inpainted = inpaint_model_forward(
        inpaint_params, img[None], edge_out, mask_f[None], generator=InpaintGenerator()
    )[0]
    merged = inpainted * mask_f + img * (1.0 - mask_f)

    all_inside = jnp.ones((h, w), bool)
    return cr.stitch(frame, merged, window, all_inside)


def erase_vehicles(edge_params, inpaint_params, frame, bboxes, masks, sigma=2.0):
    """Erase V vehicles sequentially (each erase sees the previous result, as the
    reference accumulates into inpainted_frame, trajectory_inference.py:134-145)."""

    def body(f, inp):
        bbox, mask = inp
        return erase_vehicle(edge_params, inpaint_params, f, bbox, mask, sigma=sigma), None

    out, _ = jax.lax.scan(body, frame, (bboxes, masks))
    return out
