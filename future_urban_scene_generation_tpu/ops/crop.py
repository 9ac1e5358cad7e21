"""Square-crop windows with the reference's exact integer semantics, as fixed-shape
resampling ops.

The reference crops dynamically-sized windows then resizes (utils/crop_utils.py:4-52 +
cv2.resize) — shapes depend on the bbox, which breaks jit. Here a crop is described by
a `Window` (x_start, y_start, w, h in frame coords, computed with the reference's
int-truncation arithmetic) and the pixels move through a single fused gather:
frame -> out_size^2 directly, zero filled outside the frame (the reference zero-pads).

The inverse direction (`stitch`) resamples a synthesized out_size^2 crop back onto the
frame through the window — replacing the reference's resize + unpad + paste chain
(trajectory_inference.py:185-198) with one gather selected by a mask.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops.warp import _bilinear_sample


class Window(NamedTuple):
    """A crop window in frame coordinates. All fields are integer-valued floats."""

    x_start: jnp.ndarray  # may be negative (window hangs off the frame)
    y_start: jnp.ndarray
    w: jnp.ndarray
    h: jnp.ndarray

    @property
    def scale(self):
        """The 'scale' metadata = major_side / 200 (crop_utils.py:25)."""
        return jnp.maximum(self.w, self.h) / 200.0


def square_window_from_bbox(bbox_xyxy) -> Window:
    """Reference square crop window: side = 1.1 * max(w, h) about the bbox center,
    with int truncation exactly as utils/crop_utils.py:20-47.

    Works on traced values; bbox floats in frame coords.
    """
    x_min, y_min, x_max, y_max = (
        bbox_xyxy[..., 0], bbox_xyxy[..., 1], bbox_xyxy[..., 2], bbox_xyxy[..., 3]
    )
    side_x = x_max - x_min
    side_y = y_max - y_min
    major = 1.1 * jnp.maximum(side_x, side_y)
    cx = x_min + side_x / 2.0
    cy = y_min + side_y / 2.0
    # int() truncates toward zero.
    x0 = jnp.trunc(cx - major / 2.0)
    y0 = jnp.trunc(cy - major / 2.0)
    x1 = jnp.trunc(cx + major / 2.0)
    y1 = jnp.trunc(cy + major / 2.0)
    return Window(x0, y0, x1 - x0, y1 - y0)


def crop_resize(frame: jnp.ndarray, window: Window, out_size: int) -> jnp.ndarray:
    """Resample the window to (out_size, out_size, C), zero outside the frame,
    replicating at the window edge (cv2.resize on a zero-padded crop).

    Implemented with jax.image.scale_and_translate: a separable weighted reduction
    (dense row/col mixing matrices -> MXU work) instead of a 2M-point gather, which
    is an order of magnitude faster on TPU. Convention: s&t maps output pixel o to
    input coordinate (o + 0.5 - t)/s - 0.5, zero outside the input support and
    edge-renormalized inside — matching the reference's zero-padded crop except for
    a half-texel blend at window borders that lie inside the frame.
    """
    sx = out_size / window.w
    sy = out_size / window.h
    # A 1-pixel zero ring reproduces cv2's zero-pad blend at the frame border for
    # windows that hang off the frame (s&t alone would edge-replicate there).
    padded = jnp.pad(frame, ((1, 1), (1, 1), (0, 0)))
    return jax.image.scale_and_translate(
        padded,
        (out_size, out_size, frame.shape[-1]),
        (0, 1),
        jnp.stack([sy, sx]),
        jnp.stack([-(window.y_start + 1.0) * sy, -(window.x_start + 1.0) * sx]),
        method="linear",
        antialias=False,
    )


def crop_resize_gather(frame: jnp.ndarray, window: Window, out_size: int) -> jnp.ndarray:
    """Gather-based reference implementation of :func:`crop_resize` (exact cv2
    window-edge clamping; used by tests as the semantics oracle)."""
    sx = window.w / out_size
    sy = window.h / out_size
    cols = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * sx - 0.5
    rows = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * sy - 0.5
    cols = jnp.clip(cols, 0.0, window.w - 1.0) + window.x_start
    rows = jnp.clip(rows, 0.0, window.h - 1.0) + window.y_start
    xs = jnp.broadcast_to(cols[None, :], (out_size, out_size))
    ys = jnp.broadcast_to(rows[:, None], (out_size, out_size))
    return _bilinear_sample(frame, xs, ys)


def crop_to_frame_coords(kp_norm: jnp.ndarray, window: Window) -> jnp.ndarray:
    """Map [0,1]-normalized crop keypoints into frame pixels
    (trajectory_inference.py:94-96: kp * crop_side + x_start)."""
    x = kp_norm[..., 0] * window.w + window.x_start
    y = kp_norm[..., 1] * window.h + window.y_start
    return jnp.stack([x, y], axis=-1)


def frame_to_crop_coords(kp_frame: jnp.ndarray, window: Window, out_size: int) -> jnp.ndarray:
    """Map frame-pixel keypoints into out_size^2 crop pixel coordinates."""
    x = (kp_frame[..., 0] - window.x_start) * (out_size / window.w)
    y = (kp_frame[..., 1] - window.y_start) * (out_size / window.h)
    return jnp.stack([x, y], axis=-1)


def stitch(
    frame: jnp.ndarray,
    crop_img: jnp.ndarray,
    window: Window,
    mask_frame: jnp.ndarray,
) -> jnp.ndarray:
    """Paste a synthesized out_size^2 crop back onto the frame.

    Equivalent to the reference's resize-to-window + masked assignment
    (trajectory_inference.py:185-198), expressed as a separable
    scale_and_translate onto the frame canvas (MXU-friendly, gather-free) and a
    masked select where ``mask_frame`` (H, W bool) is set.
    """
    h, w = frame.shape[0], frame.shape[1]
    out_size = crop_img.shape[0]
    sy = window.h / out_size
    sx = window.w / out_size
    canvas = jax.image.scale_and_translate(
        crop_img,
        (h, w, frame.shape[-1]),
        (0, 1),
        jnp.stack([sy, sx]),
        jnp.stack([window.y_start, window.x_start]),
        method="linear",
        antialias=False,
    )
    xs_f = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys_f = jnp.arange(h, dtype=jnp.float32)[:, None]
    inside = (
        (xs_f >= window.x_start)
        & (xs_f < window.x_start + window.w)
        & (ys_f >= window.y_start)
        & (ys_f < window.y_start + window.h)
    )
    write = (inside & mask_frame)[..., None]
    return jnp.where(write, canvas, frame)


def stitch_packed(
    frame: jnp.ndarray,
    crop_img: jnp.ndarray,
    window: Window,
    mask_crop: jnp.ndarray,
    resample_dtype=None,
) -> jnp.ndarray:
    """:func:`stitch` with the mask given at CROP resolution, resampled to the
    frame inside the same scale_and_translate as the color (4th channel).

    Color and mask use identical (scale, translate, linear) parameters, so
    packing them halves the full-frame resample traffic of the HBM-bound
    composite while producing the same result as resampling the mask
    separately and calling :func:`stitch` (pipeline/stages._mask_to_frame).

    ``resample_dtype`` (e.g. bfloat16): dtype of the full-frame canvas the
    resample materializes — the composite's dominant HBM traffic. The frame
    and the merged output stay f32; only the stitched pixels quantize (~4e-3,
    the order of the reference's own uint8 rounding). The mask channel is
    exact at bf16 where it matters: interpolated mask values near the 0.5
    threshold are short convex combinations of {0, 1} whose bf16 rounding
    moves them ~1e-3 — flips are confined to pixels where the f32 value is
    within that distance of 0.5, i.e. the same boundary pixels the linear
    resample already makes convention-sensitive.
    """
    h, w = frame.shape[0], frame.shape[1]
    out_size = crop_img.shape[0]
    rgbm = jnp.concatenate(
        [crop_img, mask_crop.astype(crop_img.dtype)[..., None]], axis=-1
    )
    if resample_dtype is not None:
        rgbm = rgbm.astype(resample_dtype)
    canvas = jax.image.scale_and_translate(
        rgbm,
        (h, w, rgbm.shape[-1]),
        (0, 1),
        jnp.stack([window.h / out_size, window.w / out_size]),
        jnp.stack([window.y_start, window.x_start]),
        method="linear",
        antialias=False,
    )
    canvas = canvas.astype(jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    inside = (
        (xs >= window.x_start)
        & (xs < window.x_start + window.w)
        & (ys >= window.y_start)
        & (ys < window.y_start + window.h)
    )
    write = (inside & (canvas[..., 3] > 0.5))[..., None]
    return jnp.where(write, canvas[..., :3], frame)


def stitch_packed_patch(
    frame: jnp.ndarray,
    crop_img: jnp.ndarray,
    window: Window,
    mask_crop: jnp.ndarray,
    patch_hw,
) -> jnp.ndarray:
    """:func:`stitch_packed` restricted to a patch_hw region around the window.

    The composite is HBM-bound and a vehicle window covers a small fraction of
    a 1080p frame, yet scale_and_translate always materializes a full-frame
    canvas. This resamples into a static (Ph, Pw) patch anchored at the
    integer origin clamp(floor(start) - 1, 0, frame - patch) per axis, merges
    with a dynamic_slice of the frame, and writes it back with
    dynamic_update_slice — identical output (the resample weights depend on
    output_coord - translation, and the origin shift is integer) whenever the
    window fits: REQUIRES window.w <= Pw - 2 and window.h <= Ph - 2 (callers
    guard with a scene-level fallback to :func:`stitch_packed`, see
    stages.composite_frames).
    """
    h, w = frame.shape[0], frame.shape[1]
    ph, pw = min(patch_hw[0], h), min(patch_hw[1], w)
    out_size = crop_img.shape[0]
    oy = jnp.clip(jnp.floor(window.y_start) - 1.0, 0.0, float(h - ph))
    ox = jnp.clip(jnp.floor(window.x_start) - 1.0, 0.0, float(w - pw))
    rgbm = jnp.concatenate(
        [crop_img, mask_crop.astype(crop_img.dtype)[..., None]], axis=-1
    )
    canvas = jax.image.scale_and_translate(
        rgbm,
        (ph, pw, rgbm.shape[-1]),
        (0, 1),
        jnp.stack([window.h / out_size, window.w / out_size]),
        jnp.stack([window.y_start - oy, window.x_start - ox]),
        method="linear",
        antialias=False,
    )
    xs = ox + jnp.arange(pw, dtype=jnp.float32)[None, :]
    ys = oy + jnp.arange(ph, dtype=jnp.float32)[:, None]
    inside = (
        (xs >= window.x_start)
        & (xs < window.x_start + window.w)
        & (ys >= window.y_start)
        & (ys < window.y_start + window.h)
    )
    write = (inside & (canvas[..., 3] > 0.5))[..., None]
    oyi, oxi = oy.astype(jnp.int32), ox.astype(jnp.int32)
    region = jax.lax.dynamic_slice(frame, (oyi, oxi, 0), (ph, pw, frame.shape[-1]))
    merged = jnp.where(write, canvas[..., : frame.shape[-1]], region)
    return jax.lax.dynamic_update_slice(frame, merged, (oyi, oxi, 0))


def stitch_gather(
    frame: jnp.ndarray,
    crop_img: jnp.ndarray,
    window: Window,
    mask_frame: jnp.ndarray,
) -> jnp.ndarray:
    """Gather-based reference implementation of :func:`stitch` (semantics oracle)."""
    h, w = frame.shape[0], frame.shape[1]
    out_size = crop_img.shape[0]
    xs_f = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys_f = jnp.arange(h, dtype=jnp.float32)[:, None]
    cx = (xs_f - window.x_start + 0.5) * (out_size / window.w) - 0.5
    cy = (ys_f - window.y_start + 0.5) * (out_size / window.h) - 0.5
    cx = jnp.broadcast_to(cx, (h, w))
    cy = jnp.broadcast_to(cy, (h, w))
    sampled = _bilinear_sample(crop_img, cx, cy)
    inside = (
        (xs_f >= window.x_start)
        & (xs_f < window.x_start + window.w)
        & (ys_f >= window.y_start)
        & (ys_f < window.y_start + window.h)
    )
    write = (inside & mask_frame)[..., None]
    return jnp.where(write, sampled, frame)


def image_ref_to_crop_ref(
    kpoints: "np.ndarray", crop_tl, crop_pad, crop_shape, normalize: bool
):
    """Host-side keypoint remap image->crop with out-of-crop invalidation
    (utils/crop_utils.py:55-88). kpoints: (K, 2), -1 marks missing."""
    import numpy as np

    x_min, y_min = crop_tl
    x_pad, y_pad = crop_pad
    crop_h, crop_w = crop_shape[0], crop_shape[1]
    out = np.array(kpoints, dtype=np.float64, copy=True)
    for i in range(len(out)):
        if np.all(out[i] != -1):
            kx = out[i, 0] - x_min + x_pad
            ky = out[i, 1] - y_min + y_pad
            if kx < 0 or ky < 0 or kx >= crop_w or ky >= crop_h:
                out[i] = (-1.0, -1.0)
            elif normalize:
                out[i] = (kx / crop_w, ky / crop_h)
            else:
                out[i] = (kx, ky)
    return out


def window_from_mask_bbox(mask: jnp.ndarray, window: Window, out_size: int) -> Window:
    """Square window (reference semantics) around the bbox of a crop-resolution mask,
    expressed back in frame coordinates.

    mask: (S, S) bool in the coordinate system of ``window`` sampled at out_size.
    Replaces the reference's np.nonzero bbox of the full-frame sketch mask
    (warp_learn/models.py:330-335) with a fixed-shape reduction.
    """
    s = mask.shape[0]
    cols = jnp.any(mask, axis=0)
    rows = jnp.any(mask, axis=1)
    idx = jnp.arange(s)
    x_min = jnp.min(jnp.where(cols, idx, s))
    x_max = jnp.max(jnp.where(cols, idx, -1))
    y_min = jnp.min(jnp.where(rows, idx, s))
    y_max = jnp.max(jnp.where(rows, idx, -1))
    # Crop pixel c corresponds to frame coordinate x_start + c * w / out_size (the
    # mask is nearest-sampled); use the pixel-center map for bbox corners.
    fx = lambda c: window.x_start + (c + 0.5) * window.w / s - 0.5  # noqa: E731
    fy = lambda c: window.y_start + (c + 0.5) * window.h / s - 0.5  # noqa: E731
    bbox = jnp.stack([fx(x_min), fy(y_min), fx(x_max), fy(y_max)])
    return square_window_from_bbox(bbox)
