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


class VideoReader:
    """Thin frame reader over cv2.VideoCapture when available; falls back to a
    directory of numbered .npy/.png frames for environments without OpenCV."""

    def __init__(self, source, resize_hw: Optional[Tuple[int, int]] = (720, 1280)):
        self.resize_hw = resize_hw
        self._cap = None
        self._frames_dir = None
        source = Path(source)
        if source.is_dir():
            self._frames_dir = sorted(source.glob("*.npy")) or sorted(source.glob("*.png"))
            if not self._frames_dir:
                raise FileNotFoundError(f"no frames in {source}")
        else:
            try:
                import cv2
            except ImportError as exc:
                raise RuntimeError("cv2 unavailable and source is not a frame dir") from exc
            self._cap = cv2.VideoCapture(str(source))
            if not self._cap.isOpened():
                raise IOError(f'Error opening video "{source}"')

    def read(self, frame_id: int) -> Optional[np.ndarray]:
        """Frame by 1-based id, resized, RGB float32 [0,1]. None past the end."""
        if self._cap is not None:
            import cv2

            self._cap.set(cv2.CAP_PROP_POS_FRAMES, frame_id - 1)
            ret, frame = self._cap.read()
            if not ret:
                return None
            if self.resize_hw is not None:
                frame = cv2.resize(frame, (self.resize_hw[1], self.resize_hw[0]))
            return frame[..., ::-1].astype(np.float32) / 255.0  # BGR -> RGB
        idx = frame_id - 1
        if idx < 0 or idx >= len(self._frames_dir):
            return None
        path = self._frames_dir[idx]
        if path.suffix == ".npy":
            frame = np.load(path)
        else:
            import cv2

            frame = cv2.imread(str(path))[..., ::-1]
        if frame.dtype == np.uint8:
            frame = frame.astype(np.float32) / 255.0
        if self.resize_hw is not None and frame.shape[:2] != tuple(self.resize_hw):
            try:
                import cv2

                frame = cv2.resize(frame, (self.resize_hw[1], self.resize_hw[0]))
            except ImportError:
                pass  # keep native resolution when cv2 is unavailable
        return frame


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
