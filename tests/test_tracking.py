"""Detect -> track -> predict front-end (pipeline/tracking.py) and the full
no-caller-boxes streaming loop (TrackingStreamRunner)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from future_urban_scene_generation_tpu.pipeline import tracking as trk


def _frame_with_boxes(h, w, boxes, value=1.0):
    f = np.zeros((h, w, 3), np.float32)
    for x0, y0, x1, y1 in boxes:
        f[int(y0):int(y1), int(x0):int(x1)] = value
    return f


# ---------------------------------------------------------------------------
# Connected components / detector
# ---------------------------------------------------------------------------


def test_connected_components_boxes():
    grid = np.zeros((12, 16), bool)
    grid[2:5, 3:7] = True            # component A: 12 cells
    grid[8:11, 10:14] = True         # component B: 12 cells
    grid[0, 15] = True               # 1-cell noise
    out = trk._connected_component_boxes(grid, min_cells=4)
    assert len(out) == 2
    boxes = sorted((x0, y0, x1, y1) for x0, y0, x1, y1, _ in out)
    assert boxes[0] == (3, 2, 6, 4)
    assert boxes[1] == (10, 8, 13, 10)


def test_connected_components_diagonal_8conn():
    grid = np.zeros((6, 6), bool)
    grid[1, 1] = True
    grid[2, 2] = True  # touches only diagonally
    out = trk._connected_component_boxes(grid, min_cells=2)
    assert len(out) == 1


def test_background_diff_detector():
    h, w = 160, 240
    bg = np.zeros((h, w, 3), np.float32)
    frame = _frame_with_boxes(h, w, [(40, 60, 90, 100), (150, 30, 200, 70)])
    det = trk.BackgroundDiffDetector(jnp.asarray(bg), scale=8, min_area_px=100)
    boxes, scores = det(jnp.asarray(frame))
    assert boxes.shape[0] == 2
    # Each detection overlaps its ground-truth box (grid-resolution slack).
    gt = np.asarray([[40, 60, 90, 100], [150, 30, 200, 70]], np.float32)
    iou = trk.iou_xyxy(boxes, gt)
    assert (iou.max(axis=1) > 0.5).all()


# ---------------------------------------------------------------------------
# Tracker
# ---------------------------------------------------------------------------


def test_iou_tracker_stable_ids_and_confirmation():
    tracker = trk.IouTracker(min_hits=3, max_misses=2)
    ids_seen = []
    for t in range(6):
        boxes = np.asarray(
            [[10 + 5 * t, 20, 50 + 5 * t, 60], [200, 100 + 4 * t, 260, 160 + 4 * t]],
            np.float32,
        )
        confirmed = tracker.update(boxes)
        if t < 2:
            assert confirmed == []  # not yet confirmed
        else:
            assert len(confirmed) == 2
            ids_seen.append(tuple(sorted(c.track_id for c in confirmed)))
    # IDs are stable across the whole sequence.
    assert len(set(ids_seen)) == 1
    # Histories accumulated one mid-bottom point per frame.
    assert all(len(c.history) == 6 for c in tracker.confirmed())


def test_iou_tracker_coasts_and_dies():
    tracker = trk.IouTracker(min_hits=2, max_misses=2)
    box = np.asarray([[10, 10, 50, 50]], np.float32)
    tracker.update(box)
    confirmed = tracker.update(box + 4)
    assert len(confirmed) == 1
    tid = confirmed[0].track_id
    # Detector drops out: the track coasts on its velocity, then dies.
    out1 = tracker.update(np.zeros((0, 4), np.float32))
    assert [t.track_id for t in out1] == [tid]
    tracker.update(np.zeros((0, 4), np.float32))
    tracker.update(np.zeros((0, 4), np.float32))
    assert tracker.tracks == []


def test_iou_tracker_velocity_assists_matching():
    tracker = trk.IouTracker(min_hits=2, max_misses=1, min_iou=0.3)
    # An accelerating mover: by the end it shifts 30 px/frame on a 40 px box —
    # raw IoU at that speed is 10/70 = 0.14 < min_iou, so only the learned
    # velocity prediction keeps the association alive.
    x = 100.0
    for speed in (5, 10, 15, 20, 25, 30, 30):
        x += speed
        tracker.update(np.asarray([[x, 50, x + 40, 90]], np.float32))
    assert len(tracker.tracks) == 1
    assert tracker.tracks[0].hits == 7


# ---------------------------------------------------------------------------
# Future prediction
# ---------------------------------------------------------------------------


def test_predict_future_meters_linear_no_homography():
    history = [np.asarray([10.0 + 3 * i, 5.0 + 1 * i]) for i in range(8)]
    out = trk.predict_future_meters(history, None, n_points=4, stride=2)
    assert out.shape == (4, 2)
    np.testing.assert_allclose(out[0], [31.0, 12.0], atol=1e-5)
    np.testing.assert_allclose(out[1], [37.0, 14.0], atol=1e-5)  # 2 frames * (3, 1)
    np.testing.assert_allclose(out[3], [49.0, 18.0], atol=1e-5)


def test_predict_future_meters_needs_history():
    assert trk.predict_future_meters([np.zeros(2)], None, 3) is None


def test_predict_future_meters_through_homography():
    # Identity-ish homography: pixel == GPS; meters come out of gps_to_meters'
    # bounding-rect interpolation — just pin shape/finiteness + monotone motion.
    hist = [np.asarray([100.0 + 5 * i, 200.0 + 2 * i]) for i in range(6)]
    h = np.eye(3) * 1e-4  # plausible GPS magnitudes
    out = trk.predict_future_meters(hist, h, n_points=5, stride=2)
    assert out.shape == (5, 2)
    assert np.isfinite(out).all()
    d = np.diff(out, axis=0)
    assert (np.linalg.norm(d, axis=1) > 0).all()


# ---------------------------------------------------------------------------
# Full loop: detect -> track -> keypoint -> NVS -> composite
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_tracking_stream_runner_end_to_end():
    from future_urban_scene_generation_tpu.pipeline import runner, stages, streaming
    from future_urban_scene_generation_tpu.utils import mesh as mu

    H, W = 240, 320
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    mesh, kp3d = mu.make_test_car(subdiv=1)
    cad_bank = runner.build_cad_bank([mesh], [kp3d], scale=5.0)
    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init(
                {"params": k}, dummy, jnp.zeros((1, 256, 256, 6)), cov=0.0
            )
        )(key),
    )

    bg = np.zeros((H, W, 3), np.float32) + 0.1
    detector = trk.BackgroundDiffDetector(jnp.asarray(bg), scale=8, min_area_px=100)
    stream = streaming.TrackingStreamRunner(
        models, cad_bank, K, (H, W), n_vehicles=1, n_steps=3,
        depth=1, detector=detector, inv_homography=None, min_track_frames=2,
    )

    results, n_tracked = [], 0
    for t in range(6):
        x0 = 60 + 12 * t
        frame = bg.copy()
        frame[120:170, x0:x0 + 70] = 0.9
        out, tracks = stream.submit_frame(frame)
        n_tracked = max(n_tracked, len(tracks))
        if out is not None:
            results.append(out)
    results.extend(stream.flush())

    assert n_tracked == 1  # one stable track, no duplicates
    assert len(results) >= 3  # synthesized once confirmed + history >= 2
    for r in results:
        assert r.frames_icn.shape == (3, H, W, 3)
        assert np.isfinite(np.asarray(r.frames_icn)).all()


@pytest.mark.slow
@pytest.mark.parametrize("threaded", [False, True])
def test_multi_stream_runner_two_cameras(threaded):
    """MultiStreamRunner (BASELINE config 4): two camera streams with separate
    backgrounds/trackers multiplex onto one shared warm program set; each
    stream's tracks and synthesized scenes stay isolated, and the final
    detections fold in at flush. threaded=True runs each stream's host
    bookkeeping on its own worker (fire-and-forget submit, results via
    flush) and must produce the same per-stream scene counts."""
    from future_urban_scene_generation_tpu.pipeline import runner, stages, streaming
    from future_urban_scene_generation_tpu.utils import mesh as mu

    H, W = 240, 320
    K = np.array([[300.0, 0, W / 2], [0, 300.0, H / 2], [0, 0, 1]], np.float32)
    mesh, kp3d = mu.make_test_car(subdiv=1)
    cad_bank = runner.build_cad_bank([mesh], [kp3d], scale=5.0)
    key = jax.random.PRNGKey(0)
    cadm, hgm, icnm, vunm = stages.Models.modules()
    dummy = jnp.zeros((1, 256, 256, 3))
    models = stages.Models(
        cad_params=jax.jit(cadm.init)(key, dummy),
        hourglass_params=jax.jit(hgm.init)(key, dummy),
        icn_params=jax.jit(icnm.init)(key, jnp.zeros((1, 256, 256, 21))),
        vunet_params=jax.jit(
            lambda k: vunm.init(
                {"params": k}, dummy, jnp.zeros((1, 256, 256, 6)), cov=0.0
            )
        )(key),
    )

    bgs = [np.zeros((H, W, 3), np.float32) + 0.1,
           np.zeros((H, W, 3), np.float32) + 0.2]

    def make_detector(i):
        return trk.BackgroundDiffDetector(
            jnp.asarray(bgs[i]), scale=8, min_area_px=100
        )

    # Threaded mode uses the production consumption contract: on_result is
    # called from the worker threads as scenes drain (retaining results
    # instead pins their HBM buffers — MultiStreamRunner docstring).
    consumed = [[], []]
    multi = streaming.MultiStreamRunner(
        models, cad_bank, K, (H, W), n_vehicles=1, n_streams=2,
        make_detector=make_detector, n_steps=3, depth=1, min_track_frames=2,
        overlap_detect=False, threaded=threaded,
        on_result=(lambda i, r: consumed[i].append(r)) if threaded else None,
    )

    results = [[], []]
    tracked = [0, 0]
    for t in range(6):
        for i in range(2):
            # Camera 0's vehicle moves right, camera 1's moves down.
            frame = bgs[i].copy()
            if i == 0:
                x0 = 60 + 12 * t
                frame[120:170, x0:x0 + 70] = 0.9
            else:
                y0 = 60 + 10 * t
                frame[y0:y0 + 50, 120:190] = 0.9
            out, tracks = multi.submit_frame(i, frame)
            if not threaded:
                tracked[i] = max(tracked[i], len(tracks))
            if out is not None:
                results[i].append(out)
    for i, extra in enumerate(multi.flush()):
        results[i].extend(extra)
    if threaded:
        for i in range(2):  # worker + flush-tail results arrive via on_result
            results[i].extend(consumed[i])
        tracked = [len(s.tracker.confirmed()) for s in multi.streams]
        multi.close()

    assert tracked == [1, 1]  # per-camera trackers stay isolated
    for i in range(2):
        assert len(results[i]) >= 3
        for r in results[i]:
            assert r.frames_icn.shape == (3, H, W, 3)
            assert np.isfinite(np.asarray(r.frames_icn)).all()
