"""Streaming scene synthesis: persistent compiled state + overlapped host->device IO.

The reference is strictly request-per-click through the GUI. For production serving
(BASELINE.md: interactive streaming at 30 FPS) this runner keeps the compiled scene
program warm and overlaps the host->device transfer of frame t+1 with the device
computation of frame t (JAX dispatch is async; transfers are issued eagerly with
device_put and only the PNG readback blocks).

Usage:
    stream = StreamRunner(models, cad_bank, intrinsic, frame_hw, n_vehicles=4)
    for frame, bboxes, meters in source:
        result = stream.submit(frame, bboxes, meters)  # returns previous step result
"""
from __future__ import annotations

import collections
import time
from typing import Deque, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from future_urban_scene_generation_tpu.pipeline import runner as _runner


@jax.jit
def _u8_to_f32(img):
    return img.astype(jnp.float32) / 255.0


class StreamRunner:
    def __init__(
        self,
        models,
        cad_bank,
        intrinsic,
        frame_hw: Tuple[int, int],
        n_vehicles: int,
        n_steps: int = 6,
        vis_res: int = 192,
        depth: int = 2,
        mesh=None,
        inflight_gate=None,
    ):
        self.models = models
        self.cad_bank = cad_bank
        self.intrinsic = jnp.asarray(intrinsic)
        self.frame_hw = frame_hw
        self.n_vehicles = n_vehicles
        self.n_steps = n_steps
        self.vis_res = vis_res
        self.mesh = mesh  # None = single device; else vehicle axis shards over it
        # Optional shared threading.BoundedSemaphore: each in-flight scene
        # holds one permit from dispatch to drain, bounding TOTAL device-side
        # in-flight scenes across streams (MultiStreamRunner threaded mode —
        # per-stream depth alone cannot bound the sum; see its HBM comment).
        self._gate = inflight_gate
        self._inflight: Deque = collections.deque()
        self.depth = depth
        self.latencies: list = []
        self._t_first_submit: Optional[float] = None
        self._t_last_drain: Optional[float] = None
        self._drained = 0

    def _pad(self, bboxes, meters):
        """Pad/truncate to the fixed vehicle count (fixed shapes keep the program warm).
        Padding vehicles get degenerate boxes; the fault barrier masks them out."""
        v = self.n_vehicles
        b = np.zeros((v, 4), np.float32)
        m = np.zeros((v, self.n_steps, 2), np.float32)
        n = min(len(bboxes), v)
        b[:n] = np.asarray(bboxes, np.float32)[:n]
        m[:n] = np.asarray(meters, np.float32)[:n, : self.n_steps]
        return b, m

    @staticmethod
    def _upload(img: np.ndarray):
        """Host->device image upload. uint8 inputs ship 4x fewer bytes over
        PCIe/tunnel and convert to f32 [0,1] on device — with a remote device the
        frame upload, not compute, bounds sustained streaming throughput."""
        img = np.asarray(img)
        if img.dtype == np.uint8:
            dev = jax.device_put(img)
            return _u8_to_f32(dev)
        return jax.device_put(jnp.asarray(img, jnp.float32))

    def _run_scene(self, frame_d, bg_d, b, m):
        if self._gate is not None:
            self._gate.acquire()  # released by _drain_one after readback
        if self.mesh is not None:
            return _runner.run_scene_sharded(
                self.models, self.cad_bank, frame_d, bg_d,
                jnp.asarray(b), jnp.asarray(m), self.intrinsic,
                mesh=self.mesh, vis_res=self.vis_res,
            )
        return _runner.run_scene(
            self.models, self.cad_bank, frame_d, bg_d,
            jnp.asarray(b), jnp.asarray(m), self.intrinsic,
            vis_res=self.vis_res,
        )

    def _submit_scene(self, t0, frame_d, bg_d, b, m):
        """Dispatch one scene into the pipeline; returns a drained result or
        None while the pipeline fills. GATED mode drains (releasing a permit)
        BEFORE dispatching (acquiring) when the pipeline is full: a worker
        must never block in acquire while sitting on a full depth's permits,
        or N workers can mutually starve — release-before-acquire plus
        depth <= gate/n_streams (MultiStreamRunner) makes the gate
        deadlock-free. Ungated callers keep the original
        dispatch-then-drain order (steady state depth-1 in flight)."""
        out = None
        if self._gate is not None and len(self._inflight) >= self.depth:
            out = self._drain_one()
        result = self._run_scene(frame_d, bg_d, b, m)
        self._inflight.append((t0, result))
        if out is None and self._gate is None and len(self._inflight) >= self.depth:
            out = self._drain_one()
        return out

    def submit(self, frame: np.ndarray, bboxes, meters, background: Optional[np.ndarray] = None):
        """Enqueue one scene; returns the OLDEST completed result once the pipeline
        depth is reached (None while filling). ``frame``/``background`` may be
        uint8 (preferred: 4x cheaper upload) or float [0, 1]."""
        t0 = time.perf_counter()
        frame_d = self._upload(frame)
        bg_d = self._upload(background) if background is not None else frame_d
        b, m = self._pad(bboxes, meters)
        return self._submit_scene(t0, frame_d, bg_d, b, m)

    def _drain_one(self):
        t0, result = self._inflight.popleft()
        if self._t_first_submit is None:
            self._t_first_submit = t0
        self._t_first_submit = min(self._t_first_submit, t0)
        jax.block_until_ready(result.frames_icn)
        if self._gate is not None:
            self._gate.release()
        now = time.perf_counter()
        self.latencies.append(now - t0)
        self._t_last_drain = now
        self._drained += 1
        return result

    def flush(self):
        """Drain all in-flight scenes."""
        out = []
        while self._inflight:
            out.append(self._drain_one())
        return out

    @property
    def throughput_fps(self) -> float:
        """Composited frames/s over the drained scenes (both branches),
        measured by WALL CLOCK from the first submission to the last drain.
        (An earlier revision multiplied by pipeline depth assuming perfect
        overlap, which could overstate sustained throughput; this matches what
        tools/stream_bench.py measures, within noise.)"""
        if not self._drained or self._t_last_drain is None:
            return 0.0
        frames = self._drained * 2 * self.n_steps
        wall = max(self._t_last_drain - (self._t_first_submit or 0.0), 1e-9)
        return frames / wall


class TrackingStreamRunner(StreamRunner):
    """The full interactive loop with NO caller-supplied boxes or trajectories:
    detect -> track -> predict future -> (keypoint -> PnP -> NVS -> composite).

    The reference assumes precomputed tracking files + GUI selection
    (utils/video_info_utils.py:7-21); this runner replaces that front-end with a
    frame-level detector (pipeline/tracking.py) and a greedy-IoU
    constant-velocity tracker, predicting each confirmed track's future
    ground-plane trajectory from its own history. Detection of frame t+1 overlaps
    synthesis of frame t: the detector's device work is dispatched first, the
    scene program is enqueued behind it, and only the mask/box readback blocks.

    detector: callable frame -> (boxes (N, 4) xyxy, scores (N,)) — e.g.
        tracking.BackgroundDiffDetector / tracking.MaskRCNNDetector. When the
        detector exposes split ``dispatch(frame)`` / ``finalize(handle)``
        methods (both built-ins do) and ``overlap_detect`` is on, the runner
        enqueues frame t's detection and reads frame t-1's instead: a
        synchronous read would sit BEHIND the previous scene program on the
        FIFO device queue, serializing detection with synthesis and idling
        the chip a host round trip per frame. Tracks then update one frame
        late and the scene uses each track's constant-velocity PREDICTED box
        — the same prediction the tracker already coasts with on a missed
        detection, i.e. a one-frame coast, not a new approximation.
    inv_homography: pixel -> GPS matrix (utils/video.py calibration), or None to
        treat the pixel plane as the ground plane (synthetic scenes).
    """

    def __init__(self, models, cad_bank, intrinsic, frame_hw, n_vehicles,
                 detector=None, inv_homography=None, stride: int = 2,
                 min_track_frames: int = 3, tracker=None,
                 overlap_detect: bool = True, **kwargs):
        super().__init__(models, cad_bank, intrinsic, frame_hw, n_vehicles, **kwargs)
        from future_urban_scene_generation_tpu.pipeline.tracking import IouTracker

        self.detector = detector
        self.tracker = tracker or IouTracker(min_hits=min_track_frames)
        self.inv_homography = inv_homography
        self.stride = stride
        self.overlap_detect = bool(overlap_detect)
        self._pending_detect = None

    def _confirmed(self):
        conf = getattr(self.tracker, "confirmed", None)
        return conf() if callable(conf) else []

    def flush(self):
        # Finalize the in-flight detection into the tracker (its frame was
        # never synthesized — that's inherent to overlap mode — but callers
        # that inspect tracks after flush should see every submitted frame's
        # detections, ADVICE r3).
        if self._pending_detect is not None:
            boxes, _ = self.detector.finalize(self._pending_detect)
            self._pending_detect = None
            self.tracker.update(boxes)
        return super().flush()

    def submit_frame(self, frame: np.ndarray, background: Optional[np.ndarray] = None):
        """One streaming step from a raw frame. Returns (result-or-None, tracks).

        With ``overlap_detect=True`` (the default, +43% throughput — see the
        class docstring) detection is PIPELINED one frame deep: the first call
        always returns ``(None, [])``, every synthesis consumes the PREVIOUS
        frame's detections with tracks coasted one frame forward, and the last
        submitted frame's detections are only folded into the tracker by
        ``flush()``. Callers needing frame-aligned detections (single-frame
        probes, detection-accuracy evals) should construct the runner with
        ``overlap_detect=False``."""
        from future_urban_scene_generation_tpu.pipeline import tracking as trk

        frame_d = self._upload(frame)  # device work for detect + scene, uploaded once
        overlapped = self.overlap_detect and hasattr(self.detector, "dispatch")
        if overlapped:
            handle = self.detector.dispatch(frame_d)
            prev = self._pending_detect
            self._pending_detect = handle
            if prev is None:  # first frame: nothing to finalize yet
                return None, self._confirmed()
            boxes, _scores = self.detector.finalize(prev)
        else:
            boxes, _scores = self.detector(frame_d)
        confirmed = self.tracker.update(boxes)

        sel_boxes, sel_meters = [], []
        for t in confirmed:
            meters = trk.predict_future_meters(
                t.history, self.inv_homography, self.n_steps, stride=self.stride
            )
            if meters is None:
                continue
            # Overlapped mode: tracks are current through frame t-1; coast one
            # frame forward so the crop follows the vehicle in frame t.
            sel_boxes.append(t.predicted_bbox() if overlapped else t.bbox)
            sel_meters.append(meters)
            if len(sel_boxes) == self.n_vehicles:
                break
        if not sel_boxes:
            return None, confirmed

        bg_d = self._upload(background) if background is not None else frame_d
        b, m = self._pad(np.stack(sel_boxes), np.stack(sel_meters))
        t0 = time.perf_counter()
        return self._submit_scene(t0, frame_d, bg_d, b, m), confirmed


class MultiStreamRunner:
    """N camera streams through ONE warm program set (BASELINE config 4:
    "Multi-camera Cityflow streams at 1080p").

    The reference is single-camera by contract (one ``vdo.avi`` per run,
    run_test.py:125-128); production serving multiplexes several cameras onto
    one chip. Per-stream STATE is isolated — each stream owns its tracker,
    detector (and its background model), pending-detection handle and latency
    stats — while the scene PROGRAMS are shared: every stream submits the same
    fixed (frame_hw, n_vehicles, n_steps) shapes, so all streams hit one jit
    cache entry and one warm compile. Submissions interleave on the device's
    FIFO queue; with round-robin submission each stream's depth-D pipeline
    gives the chip N x D scenes of lookahead, so a single stream's readback
    never idles the device while other streams have work.

    make_detector: stream_idx -> detector (each stream needs its own — e.g. a
    BackgroundDiffDetector holds that camera's background model).

    ``threaded=True`` moves each stream's HOST bookkeeping (tracker update,
    detector finalize readback, box/trajectory prep) onto its own worker
    thread. Measured motivation (docs/SERVING.md multi-stream table): with one
    host thread, aggregate throughput DROPS with stream count — the chip
    serves back-to-back but every stream's finalize readbacks and numpy
    bookkeeping interleave serially on the submit path. The blocking calls
    (`jax.block_until_ready`, device transfers) release the GIL, so worker
    threads overlap stream A's readback wait with stream B's bookkeeping and
    the submit path becomes a queue put. Per-stream state stays single-owner
    (each worker owns exactly its stream — no locks); the device serializes
    programs on its FIFO queue exactly as before. In threaded mode
    ``submit_frame`` is fire-and-forget (returns (None, [])); drained results
    go to ``on_result(stream_idx, result)`` in the worker thread if given,
    else accumulate in ``results[stream_idx]`` until ``flush()``. PASS
    ``on_result`` (consume-and-release) FOR LONG RUNS: each retained
    SceneResult pins both (S, H, W, 3) output stacks in device HBM (~130 MB
    at 720p, ~300 MB at 1080p) — accumulating a 30-frame benchmark's results
    across 4 streams measured RESOURCE_EXHAUSTED on the 16 GB chip before
    this was understood (the in-flight pipeline was never the problem; the
    result backlog was).

    ``meshes`` (optional, one per stream): run each stream's scene program
    with its vehicle axis sharded over that stream's mesh
    (runner.run_scene_sharded). Disjoint per-stream submeshes place streams
    on disjoint devices — the embarrassingly-parallel stream-sharding axis of
    BASELINE config 4 (certified by __graft_entry__.dryrun_multichip's
    multi-stream case).
    """

    def __init__(self, models, cad_bank, intrinsic, frame_hw, n_vehicles,
                 n_streams: int, make_detector, inv_homographies=None,
                 threaded: bool = False, meshes=None, max_inflight=None,
                 on_result=None, **kwargs):
        if inv_homographies is None:
            inv_homographies = [None] * n_streams
        if meshes is None:
            meshes = [None] * n_streams
        gate = None
        if threaded:
            # Bound TOTAL in-flight scenes across streams with one shared
            # semaphore (each scene holds a permit from dispatch to drain):
            # every in-flight scene pins its input frames + both (S, H, W, 3)
            # output stacks in HBM, and with per-stream workers the submit
            # side no longer self-throttles the way the round-robin host
            # loop did. Default budget 6, measured best of {2, 6, 8} on the
            # chip: 8 (4 streams x depth 2) measured SLOWER than 6 (depth 1
            # + cross-stream lookahead) at 4x720p — permit contention at
            # gate == demand thrashes — and the area-scaled 2 measured 19%
            # slower at 2x1080p by serializing each stream; 6 keeps depth 2
            # for <=3 streams and 4-deep cross-stream lookahead at 4. Workers
            # holding a full depth's permits release one (drain) BEFORE
            # acquiring the next; with depth <= gate/n_streams that is
            # deadlock-free — a blocked depth-1 worker holds no permit, and
            # the permit-holders can always reach their own drain
            # (StreamRunner._submit_scene).
            import threading

            if max_inflight is None:
                max_inflight = 6
            max_inflight = int(max_inflight)
            gate = threading.BoundedSemaphore(max_inflight)
            kwargs["depth"] = max(1, min(int(kwargs.pop("depth", 2)),
                                         max_inflight // max(n_streams, 1)))
        self.streams = [
            TrackingStreamRunner(
                models, cad_bank, intrinsic, frame_hw, n_vehicles,
                detector=make_detector(i), inv_homography=inv_homographies[i],
                mesh=meshes[i], inflight_gate=gate, **kwargs,
            )
            for i in range(n_streams)
        ]
        self.threaded = bool(threaded)
        self.on_result = on_result  # see class docstring: consume-and-release
        self.results = [[] for _ in range(n_streams)]
        if self.threaded:
            import queue
            import threading

            self._queues = [queue.Queue(maxsize=8) for _ in range(n_streams)]
            self._errors: list = [None] * n_streams
            self._workers = []
            for i in range(n_streams):
                w = threading.Thread(
                    target=self._worker, args=(i,), daemon=True,
                    name=f"fusg-stream-{i}",
                )
                w.start()
                self._workers.append(w)

    def _worker(self, i: int):
        q = self._queues[i]
        while True:
            item = q.get()
            if item is None:
                q.task_done()
                return
            try:
                if self._errors[i] is None:  # fail-fast: skip after first error
                    out, _tracks = self.streams[i].submit_frame(*item)
                    if out is not None:
                        if self.on_result is not None:
                            self.on_result(i, out)  # consumed; buffers free
                        else:
                            self.results[i].append(out)
            except Exception as e:  # surfaced on the next submit/flush
                self._errors[i] = e
            finally:
                q.task_done()

    def submit_frame(self, stream_idx: int, frame, background=None):
        """One streaming step for camera ``stream_idx``; same contract as
        TrackingStreamRunner.submit_frame. Threaded mode: enqueue-and-return
        (results land in ``results[stream_idx]``; see class docstring)."""
        if not self.threaded:
            return self.streams[stream_idx].submit_frame(frame, background)
        if self._errors[stream_idx] is not None:
            raise self._errors[stream_idx]
        self._queues[stream_idx].put((frame, background))
        return None, []

    def flush(self):
        """Drain every stream; returns a list of per-stream result lists
        (threaded mode: results accumulated by the workers + the final
        pipeline drain; the workers stay alive for further submissions)."""
        if not self.threaded:
            return [s.flush() for s in self.streams]
        for q in self._queues:
            q.join()  # barrier: all enqueued frames fully submitted
        for err in self._errors:
            if err is not None:
                raise err
        out = []
        for i, s in enumerate(self.streams):
            drained, self.results[i] = self.results[i], []
            tail = s.flush()
            if self.on_result is not None:
                for r in tail:
                    self.on_result(i, r)
                out.append(drained)  # worker results already consumed
            else:
                out.append(drained + tail)
        return out

    def close(self):
        """Stop the worker threads (threaded mode; idempotent)."""
        if not self.threaded:
            return
        for q in self._queues:
            q.put(None)
        for w in self._workers:
            w.join(timeout=30)
        self.threaded = False

    @property
    def aggregate_fps(self) -> float:
        """Composited frames/s summed over streams, each measured by its own
        first-submit -> last-drain wall clock (streams run interleaved on one
        host thread, so the windows almost fully overlap; tools/stream_bench.py
        reports the stricter single-wall-clock aggregate)."""
        return sum(s.throughput_fps for s in self.streams)
