"""Host-side video/tracking/calibration I/O (CityFlow demo data layout).

Parity targets: utils/video_info_utils.py:7-43 and run_test.py:125-141. Stays host
Python by design (I/O is not device work); the device boundary is one
jax.device_put of decoded frames per request.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np
import yaml


def parse_tracking_file(video_dir, track_type: str, det_mode: str) -> np.ndarray:
    """Parse mtsc/mtsc_{track}_{det}.txt: 10-column CSV, keep the first 6
    (frame, id, x, y, w, h) (utils/video_info_utils.py:7-21)."""
    path = Path(video_dir) / "mtsc" / f"mtsc_{track_type}_{det_mode}.txt"
    if not path.is_file():
        raise FileNotFoundError(path)
    try:
        from future_urban_scene_generation_tpu.utils.native import parse_tracking_native

        parsed = parse_tracking_native(path)
        if parsed is not None and len(parsed):
            return parsed
    except Exception:
        pass  # fall through to the numpy parser
    content = np.loadtxt(path, delimiter=",")
    if content.ndim == 1:
        content = content[None]
    if content.shape[1] != 10:
        raise ValueError(f"{path}: expected 10 columns, got {content.shape[1]}")
    return content[:, :6]


def parse_calibration_file(calibration_file) -> np.ndarray:
    """Parse the CityFlow homography yaml: 'Homography matrix' with ';'-separated rows
    (utils/video_info_utils.py:24-43)."""
    path = Path(calibration_file)
    if not path.is_file():
        raise FileNotFoundError(path)
    with path.open() as f:
        content = yaml.safe_load(f)
    rows = [
        [float(c) for c in row.split(" ") if c]
        for row in content["Homography matrix"].split(";")
    ]
    return np.asarray(rows, np.float64)


def inverse_homography(homography: np.ndarray, scale_calib: bool = False) -> np.ndarray:
    """Invert the pixel->GPS homography, optionally pre-scaled for 1920->1280 frames
    (run_test.py:134-141)."""
    inv = np.linalg.inv(homography)
    if scale_calib:
        s = 1280.0 / 1920.0
        inv = np.diag([s, s, s]) @ inv
    return inv


def resize_bilinear_np(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """Host-side bilinear resize with cv2's half-pixel/replicate-border
    convention (INTER_LINEAR) in pure numpy — the no-OpenCV counterpart of the
    reference's cv2.resize at the video-ingest edge (run_test.py:125-128 feeds
    1280x720 frames, GUI/app_interface.py:181). Matches cv2 to ~1e-7 away from
    borders (pinned in tests/test_metrics_native.py)."""
    out_h, out_w = out_hw
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    x = img.astype(np.float32, copy=False)

    def axis_weights(n_in, n_out):
        c = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
        lo = np.floor(c)
        f = (c - lo).astype(np.float32)
        i0 = np.clip(lo, 0, n_in - 1).astype(np.int64)
        i1 = np.clip(lo + 1, 0, n_in - 1).astype(np.int64)
        return i0, i1, f

    y0, y1, fy = axis_weights(h, out_h)
    x0, x1, fx = axis_weights(w, out_w)
    top = x[y0][:, x0] * (1 - fx)[None, :, None] + x[y0][:, x1] * fx[None, :, None]
    bot = x[y1][:, x0] * (1 - fx)[None, :, None] + x[y1][:, x1] * fx[None, :, None]
    out = top * (1 - fy)[:, None, None] + bot * fy[:, None, None]
    return out.astype(img.dtype) if img.dtype == np.float32 else out


class _FfmpegReader:
    """Video-file frame reader over an ffmpeg subprocess — the documented
    no-OpenCV fallback for the reference's vdo.avi contract
    (run_test.py:125-128).

    Seek model: one PERSISTENT sequential decode pipe plus a decoded-frame
    LRU. The GUI's navigation pattern (seek-heavy: arrow keys + click-to-jump,
    GUI/app_interface.py:298-341) is dominated by small forward/backward
    deltas, so a read costs O(delta) forward decode work — frames between the
    stream position and the target are decoded once and cached — and recent
    backward targets are LRU hits costing zero decode. Only a backward jump
    past the cache window restarts the pipe (O(frame_id), paid once, then
    sequential again). This replaces the original per-read
    decode-from-stream-start select filter, which made EVERY read O(frame_id);
    `stream_starts`/`decoded_frames` counters pin the bound in
    tests/test_metrics_native.py."""

    _CACHE_FRAMES = 32  # ~16 arrow-key steps of 720p RGB ≈ 88 MB at 1280x720

    def __init__(self, path):
        import shutil
        import subprocess

        self._ffmpeg = shutil.which("ffmpeg")
        if self._ffmpeg is None:
            raise RuntimeError(
                "cv2 unavailable and no ffmpeg on PATH: video files need one "
                "of them (frame DIRECTORIES decode natively, no dependency)"
            )
        self._path = str(path)
        # Probe dimensions from ffmpeg's stream banner.
        proc = subprocess.run(
            [self._ffmpeg, "-hide_banner", "-i", self._path],
            capture_output=True, text=True,
        )
        import re

        m = re.search(r"Video:.* (\d{2,5})x(\d{2,5})", proc.stderr)
        if not m:
            raise IOError(f'Error opening video "{path}" (no video stream)')
        self.width, self.height = int(m.group(1)), int(m.group(2))
        from collections import OrderedDict

        self._proc = None
        self._next_idx = 0  # stream position: index the pipe will yield next
        self._eof_at: Optional[int] = None
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self.stream_starts = 0  # instrumentation (see docstring)
        self.decoded_frames = 0

    def _start_stream(self) -> None:
        import subprocess

        self.close()
        self._proc = subprocess.Popen(
            [
                self._ffmpeg, "-hide_banner", "-loglevel", "error",
                "-i", self._path, "-vsync", "0",
                "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
            ],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )
        self._next_idx = 0
        self._eof_at = None
        self.stream_starts += 1

    def _decode_next(self) -> Optional[np.ndarray]:
        """Read exactly one frame from the pipe; None at end of stream."""
        expected = self.height * self.width * 3
        chunks, got = [], 0
        while got < expected:
            data = self._proc.stdout.read(expected - got)
            if not data:
                return None
            chunks.append(data)
            got += len(data)
        return np.frombuffer(b"".join(chunks), np.uint8).reshape(
            self.height, self.width, 3
        )

    def read_rgb(self, idx: int) -> Optional[np.ndarray]:
        cached = self._cache.get(idx)
        if cached is not None:
            self._cache.move_to_end(idx)
            return cached
        if self._eof_at is not None and idx >= self._eof_at:
            return None  # known past-the-end: no decode work at all
        if self._proc is None or idx < self._next_idx:
            self._start_stream()
        while self._next_idx <= idx:
            frame = self._decode_next()
            if frame is None:
                self._eof_at = self._next_idx
                return None
            self.decoded_frames += 1
            self._cache[self._next_idx] = frame
            self._cache.move_to_end(self._next_idx)
            while len(self._cache) > self._CACHE_FRAMES:
                self._cache.popitem(last=False)
            self._next_idx += 1
        return self._cache[idx]

    def close(self) -> None:
        if self._proc is not None:
            self._proc.stdout.close()
            self._proc.terminate()
            self._proc.wait()
            self._proc = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class VideoReader:
    """Frame reader for the demo's input contract (run_test.py:125-128).

    Sources, in order of preference:
      * a DIRECTORY of numbered .npy/.png frames — fully dependency-free:
        PNGs decode through the native zlib decoder (native/fusg_io.cc,
        utils.native.read_png) with cv2 as fallback only if the native
        library cannot build;
      * a video file (vdo.avi) via cv2.VideoCapture when OpenCV is present,
        else an ffmpeg subprocess (_FfmpegReader) when ffmpeg is on PATH.
    Resizing never silently no-ops: without cv2 it runs the numpy bilinear
    resize (cv2 INTER_LINEAR convention)."""

    def __init__(self, source, resize_hw: Optional[Tuple[int, int]] = (720, 1280)):
        self.resize_hw = resize_hw
        self._cap = None
        self._ffmpeg = None
        self._frames_dir = None
        source = Path(source)
        if source.is_dir():
            self._frames_dir = sorted(source.glob("*.npy")) or sorted(source.glob("*.png"))
            if not self._frames_dir:
                raise FileNotFoundError(f"no frames in {source}")
        else:
            try:
                import cv2

                self._cap = cv2.VideoCapture(str(source))
                if not self._cap.isOpened():
                    raise IOError(f'Error opening video "{source}"')
            except ImportError:
                self._ffmpeg = _FfmpegReader(source)

    def _resize(self, frame: np.ndarray) -> np.ndarray:
        if self.resize_hw is None or frame.shape[:2] == tuple(self.resize_hw):
            return frame
        try:
            import cv2

            return cv2.resize(frame, (self.resize_hw[1], self.resize_hw[0]))
        except ImportError:
            return resize_bilinear_np(frame, self.resize_hw)

    def _decode_image(self, path) -> np.ndarray:
        if path.suffix == ".npy":
            return np.load(path)
        try:
            from future_urban_scene_generation_tpu.utils.native import read_png

            frame = read_png(path)
            if frame is not None:
                return frame
        except IOError:
            raise
        except Exception:
            pass  # native library unavailable -> cv2 fallback below
        import cv2

        return cv2.imread(str(path))[..., ::-1]

    def read(self, frame_id: int) -> Optional[np.ndarray]:
        """Frame by 1-based id, resized, RGB float32 [0,1]. None past the end."""
        if self._cap is not None:
            import cv2

            self._cap.set(cv2.CAP_PROP_POS_FRAMES, frame_id - 1)
            ret, frame = self._cap.read()
            if not ret:
                return None
            frame = self._resize(frame)
            return frame[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
        if self._ffmpeg is not None:
            frame = self._ffmpeg.read_rgb(frame_id - 1)
            if frame is None:
                return None
            return self._resize(frame.astype(np.float32) / 255.0)
        idx = frame_id - 1
        if idx < 0 or idx >= len(self._frames_dir):
            return None
        frame = self._decode_image(self._frames_dir[idx])
        if frame.dtype == np.uint8:
            frame = frame.astype(np.float32) / 255.0
        return self._resize(frame)


def select_future_track(
    trajectories: np.ndarray, vehicle_id: int, frame_id: int, stride: int = 2, steps: int = 6
) -> np.ndarray:
    """The GUI's future-track subsampling (GUI/app_interface.py:225-234): rows of the
    vehicle from the current frame on, taking indices 0, stride, ..., (steps-1)*stride."""
    rows = trajectories[
        (trajectories[:, 1] == vehicle_id) & (trajectories[:, 0] >= frame_id)
    ]
    idx = np.arange(0, stride * steps, stride)
    idx = idx[idx < len(rows)]
    return rows[idx]
