"""Crop windows (reference int semantics), morphology vs cv2, Canny behavior."""
import cv2
import numpy as np
import jax.numpy as jnp

from future_urban_scene_generation_tpu.ops import canny as cn
from future_urban_scene_generation_tpu.ops import crop as cr
from future_urban_scene_generation_tpu.ops import morphology as mo

rng = np.random.RandomState(16)


def _reference_square_crop(image, bbox):
    """The reference's crop (utils/crop_utils.py:4-52), reimplemented as test oracle."""
    image_h, image_w, _ = image.shape
    x_min, y_min, x_max, y_max = bbox
    side_x, side_y = x_max - x_min, y_max - y_min
    major = 1.1 * max(side_x, side_y)
    cx, cy = x_min + side_x / 2, y_min + side_y / 2
    pxb = pxa = pyb = pya = 0
    nxm = int(cx - major / 2)
    if nxm < 0:
        pxb = int(np.ceil(abs(nxm)))
        nxm = 0
    nxM = int(cx + major / 2) + pxb
    if nxM > image_w:
        pxa = int(np.ceil(abs(nxM - image_w)))
        nxM = image_w + pxa
    nym = int(cy - major / 2)
    if nym < 0:
        pyb = int(np.ceil(abs(nym)))
        nym = 0
    nyM = int(cy + major / 2) + pyb
    if nyM > image_h:
        pya = int(np.ceil(abs(nyM - image_h)))
        nyM = image_h + pya
    padded = np.pad(image, [(pyb, pya), (pxb, pxa), (0, 0)])
    crop = padded[nym:nyM, nxm:nxM]
    return crop, (nxm, nym), (pxb, pyb), (pxa, pya)


def test_crop_resize_matches_reference_crop_plus_cv2_resize():
    frame = rng.rand(120, 160, 3).astype(np.float32)
    for bbox in ([30, 40, 90, 100], [5, 10, 40, 70], [100, 60, 158, 118], [-2, -3, 50, 52]):
        win = cr.square_window_from_bbox(jnp.asarray(np.float32(bbox)))
        ours = np.asarray(cr.crop_resize(jnp.asarray(frame), win, 256))
        crop_ref, _, _, _ = _reference_square_crop(frame, bbox)
        ref = cv2.resize(crop_ref, (256, 256), interpolation=cv2.INTER_LINEAR)
        err = np.abs(ours - ref)
        assert err.mean() < 5e-3, (bbox, err.mean())


def test_keypoint_round_trip():
    bbox = np.float32([30, 40, 90, 100])
    win = cr.square_window_from_bbox(jnp.asarray(bbox))
    kp_frame = rng.rand(12, 2).astype(np.float32) * [50, 50] + [35, 45]
    kp_norm = np.stack(
        [
            (kp_frame[:, 0] - float(win.x_start)) / float(win.w),
            (kp_frame[:, 1] - float(win.y_start)) / float(win.h),
        ],
        -1,
    )
    back = np.asarray(cr.crop_to_frame_coords(jnp.asarray(kp_norm), win))
    assert np.abs(back - kp_frame).max() < 1e-4


def test_stitch_round_trip():
    # Smooth content: the up-then-down resample chain (matching the reference's
    # cv2.resize semantics at half-pixel offsets) is only lossless for band-limited
    # images; per-pixel noise is legitimately smoothed by both implementations.
    yy, xx = np.mgrid[:100, :140].astype(np.float32)
    frame = jnp.asarray(
        np.stack([np.sin(xx / 15) * 0.5 + 0.5, np.cos(yy / 12) * 0.5 + 0.5, xx / 140], -1)
    )
    win = cr.Window(jnp.float32(20), jnp.float32(10), jnp.float32(64), jnp.float32(64))
    crop = cr.crop_resize(frame, win, 256)
    mask = jnp.ones((100, 140), bool)
    out = np.asarray(cr.stitch(frame, crop, win, mask))
    # Inside the window, stitching the crop back reproduces the frame.
    inner = np.s_[12:72, 22:82]
    assert np.abs(out[inner] - np.asarray(frame)[inner]).max() < 0.02
    # Outside: untouched.
    assert np.array_equal(out[:10], np.asarray(frame)[:10])


def test_window_from_mask_bbox():
    win = cr.Window(jnp.float32(50), jnp.float32(30), jnp.float32(100), jnp.float32(100))
    mask = np.zeros((256, 256), bool)
    mask[64:192, 96:160] = True  # crop coords
    w2 = cr.window_from_mask_bbox(jnp.asarray(mask), win, 256)
    # Mask bbox in frame coords: x ~ [50+96/2.56 .. 50+159/2.56], y ~ [30+64/2.56 ..]
    assert 80 < float(w2.x_start) + float(w2.w) / 2 < 105  # centered near x~100
    assert float(w2.w) == float(w2.h) or abs(float(w2.w) - float(w2.h)) <= 1


def test_elliptical_kernel_matches_cv2():
    for k in (3, 5, 8, 11):
        ours = mo.elliptical_kernel(k)
        ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k)).astype(bool)
        assert np.array_equal(ours, ref), k


def test_dilate_matches_cv2():
    mask = (rng.rand(64, 64) > 0.92).astype(np.uint8) * 255
    for k in (3, 8):
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        ref = cv2.dilate(mask, kernel, iterations=1) > 0
        ours = np.asarray(mo.dilate(jnp.asarray(mask > 0), kernel.astype(bool)))
        assert np.array_equal(ours, ref), k


def test_canny_square_edges():
    img = np.zeros((96, 96), np.float32)
    img[30:66, 30:66] = 1.0
    edges = np.asarray(cn.canny(jnp.asarray(img), sigma=2.0))
    ys, xs = np.nonzero(edges)
    assert len(xs) > 0
    # Edges hug the square boundary (within the gaussian blur radius).
    assert 25 < xs.min() < 33 and 63 < xs.max() < 71
    assert 25 < ys.min() < 33 and 63 < ys.max() < 71
    # Interior is edge-free.
    assert not edges[40:56, 40:56].any()


def test_canny_hysteresis_drops_weak_isolated():
    img = np.zeros((64, 64), np.float32)
    img[20:44, 20:44] = 1.0  # strong square
    img[50:60, 50:60] = 0.12  # faint square: gradients < high threshold
    edges = np.asarray(cn.canny(jnp.asarray(img), sigma=1.0))
    assert edges[18:24, 18:24].any() or edges[18:46, 18:46].any()
    assert not edges[48:62, 48:62].any()


def test_canny_respects_mask():
    img = rng.rand(64, 64).astype(np.float32)
    mask = np.zeros((64, 64), bool)
    mask[:, :32] = True
    edges = np.asarray(cn.canny(jnp.asarray(img), sigma=1.0, mask=jnp.asarray(mask)))
    assert not edges[:, 36:].any()
