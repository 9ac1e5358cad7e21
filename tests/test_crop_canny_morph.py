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
    img[50:60, 50:60] = 0.05  # faint square: sobel magnitude ~0.13, between
    # the low (0.1) and high (0.2) thresholds — weak and isolated
    edges = np.asarray(cn.canny(jnp.asarray(img), sigma=1.0))
    assert edges[18:24, 18:24].any() or edges[18:46, 18:46].any()
    assert not edges[48:62, 48:62].any()


def test_canny_respects_mask():
    img = rng.rand(64, 64).astype(np.float32)
    mask = np.zeros((64, 64), bool)
    mask[:, :32] = True
    edges = np.asarray(cn.canny(jnp.asarray(img), sigma=1.0, mask=jnp.asarray(mask)))
    assert not edges[:, 36:].any()


# --- golden tests vs the independent scipy transcription of skimage's canny ---
# (skimage itself is not installable here; tests/canny_oracle.py re-derives the
# published algorithm on scipy.ndimage primitives — see its docstring.)

def _photo(h=96, w=128, seed=3):
    """Realistic-ish gray image: smooth ramp + disk + rectangle + mild noise."""
    r = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 0.3 + 0.3 * xx / w + 0.1 * np.sin(yy / 9.0)
    img[(yy - h * 0.4) ** 2 + (xx - w * 0.3) ** 2 < 14 ** 2] = 0.85
    img[int(h * 0.55):int(h * 0.8), int(w * 0.55):int(w * 0.85)] = 0.1
    img += r.randn(h, w).astype(np.float32) * 0.01
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def test_canny_matches_skimage_oracle():
    from canny_oracle import canny_oracle

    img = _photo()
    for sigma in (1.0, 2.0):
        ours = np.asarray(cn.canny(jnp.asarray(img), sigma=sigma))
        ref = canny_oracle(img, sigma=sigma)
        # f32 FMA ordering can flip boundary-of-threshold pixels; budget 0.2%.
        disagree = (ours != ref).mean()
        assert disagree < 0.002, (sigma, disagree, ours.sum(), ref.sum())
        assert ref.any() and ours.any()


def test_canny_masked_matches_skimage_oracle():
    from canny_oracle import canny_oracle

    img = _photo(seed=5)
    mask = np.ones(img.shape, bool)
    mask[20:60, 40:90] = False  # the inpaint hole (inpaint_utils.py:51 shape)
    ours = np.asarray(cn.canny(jnp.asarray(img), sigma=2.0, mask=jnp.asarray(mask)))
    ref = canny_oracle(img, sigma=2.0, mask=mask)
    assert (ours != ref).mean() < 0.002, (ours.sum(), ref.sum())
    assert not ours[22:58, 42:88].any()


def test_canny_vendored_golden():
    """Frozen fixture (generated once from the oracle) guards BOTH
    implementations against silent drift."""
    import pathlib

    fix = pathlib.Path(__file__).parent / "fixtures" / "canny_golden.npz"
    data = np.load(fix)
    ours = np.asarray(
        cn.canny(jnp.asarray(data["image"]), sigma=float(data["sigma"]),
                 mask=jnp.asarray(data["mask"]))
    )
    assert (ours != data["edges"]).mean() < 0.002


def test_composite_step_matches_separate_mask_and_stitch():
    """stages.composite_step's single 4-channel resample (color+mask in one
    scale_and_translate) composites identically to the separate
    _mask_to_frame + crop.stitch passes it replaced (reference chain:
    trajectory_inference.py:185-198)."""
    import jax.numpy as jnp

    from future_urban_scene_generation_tpu.ops import crop as cr
    from future_urban_scene_generation_tpu.pipeline import stages

    rng = np.random.RandomState(3)
    H, W, V, S = 96, 128, 3, 64
    background = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    crops = jnp.asarray(rng.rand(V, S, S, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(V, S, S) > 0.6)
    # Windows: in-frame, hanging off the edge, and overlapping each other.
    wins = cr.Window(
        x_start=jnp.asarray([10.0, -8.0, 60.0]),
        y_start=jnp.asarray([12.0, 40.0, -5.0]),
        w=jnp.asarray([40.0, 52.0, 80.0]),
        h=jnp.asarray([36.0, 52.0, 70.0]),
    )

    got = stages.composite_step(background, crops, wins, masks)

    want = background
    knife_edge = np.zeros((H, W), bool)
    for v in range(V):
        win = cr.Window(wins.x_start[v], wins.y_start[v], wins.w[v], wins.h[v])
        mask_frame = stages._mask_to_frame(masks[v], win, (H, W))
        want = cr.stitch(want, crops[v], win, mask_frame)
        # The >0.5 mask threshold is a knife edge wherever the linearly
        # resampled mask lands EXACTLY on 0.5: a few-ulp difference between
        # execution contexts (eager here vs scan inside composite_step) flips
        # the write decision either way. That knife edge predates the fused
        # composite (same threshold on the same resampled values); exclude
        # those pixels from the comparison.
        import jax.image

        canvas_m = jax.image.scale_and_translate(
            masks[v].astype(jnp.float32)[..., None], (H, W, 1), (0, 1),
            jnp.stack([win.h / S, win.w / S]),
            jnp.stack([win.y_start, win.x_start]),
            method="linear", antialias=False,
        )[..., 0]
        knife_edge |= np.abs(np.asarray(canvas_m) - 0.5) <= 1e-4

    diff = np.abs(np.asarray(got) - np.asarray(want)).max(-1)
    assert knife_edge.mean() < 0.06  # the exclusion must stay small
    np.testing.assert_array_less(diff[~knife_edge], 1e-4)


def test_stitch_packed_patch_matches_full():
    """Patch-local stitch == full-frame stitch_packed whenever the window fits
    (including edge-clipped and origin-clamped windows)."""
    import jax.numpy as jnp

    from future_urban_scene_generation_tpu.ops import crop as cr

    rng = np.random.RandomState(5)
    H, W, S = 200, 320, 64
    frame = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    crop = jnp.asarray(rng.rand(S, S, 3).astype(np.float32))
    mask = jnp.asarray(rng.rand(S, S) > 0.5)
    cases = [
        (20.3, 30.7, 50.0, 44.0),   # interior, fractional start
        (-12.0, 15.0, 40.0, 40.0),  # off the left edge
        (290.0, 170.0, 60.0, 50.0), # off the bottom-right corner
        (0.2, 0.4, 61.5, 61.5),     # near origin, fractional size
    ]
    for (x0, y0, w, h) in cases:
        win = cr.Window(jnp.float32(x0), jnp.float32(y0), jnp.float32(w), jnp.float32(h))
        full = cr.stitch_packed(frame, crop, win, mask)
        patch = cr.stitch_packed_patch(frame, crop, win, mask, (64, 64))
        d = np.abs(np.asarray(full) - np.asarray(patch))
        # The patch translation (t - origin) rounds at ~1e-7, shifting sample
        # positions by a few ulp: values drift ~1e-5 (far below the 1/255
        # output quantization), and the 0.5 mask knife edge can flip on
        # isolated pixels.
        assert (d.max(-1) > 1e-4).mean() < 2e-3, (x0, y0, w, h, d.max())


def test_composite_frames_patch_and_fallback():
    """composite_frames == per-step composite_step for fitting windows, and
    takes the full path (same result) when a window exceeds the patch."""
    import jax
    import jax.numpy as jnp

    from future_urban_scene_generation_tpu.ops import crop as cr
    from future_urban_scene_generation_tpu.pipeline import stages

    rng = np.random.RandomState(11)
    H, W, V, S, n_steps = 900, 1600, 2, 64, 2  # frame larger than the patch
    stages.configure_models(composite_patch=768)
    backgrounds = jnp.asarray(rng.rand(n_steps, H, W, 3).astype(np.float32))
    crops = jnp.asarray(rng.rand(n_steps, V, S, S, 3).astype(np.float32))
    masks = jnp.asarray(rng.rand(n_steps, V, S, S) > 0.4)

    def fields(sizes):
        xs = jnp.asarray(rng.rand(n_steps, V).astype(np.float32) * 800)
        ys = jnp.asarray(rng.rand(n_steps, V).astype(np.float32) * 500)
        ws = jnp.asarray(np.float32(sizes))
        return (xs, ys, ws, ws)

    for sizes in (
        np.full((n_steps, V), 120.0),                 # all fit -> patch path
        [[120.0, 768.0], [90.0, 100.0]],  # oversize -> full-path fallback
    ):
        win_fields = fields(sizes)
        got = stages.composite_frames(backgrounds, crops, win_fields, masks)
        want = jax.vmap(
            lambda b, c, wf, m: stages.composite_step(b, c, cr.Window(*wf), m)
        )(backgrounds, crops, win_fields, masks)
        d = np.abs(np.asarray(got) - np.asarray(want))
        assert (d.max(-1) > 1e-4).mean() < 2e-3, d.max()
    stages.configure_models(composite_patch=0)
