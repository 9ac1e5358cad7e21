"""ctypes bindings for the native host-I/O runtime (native/fusg_io.cc).

The library is built on demand (make -C native) and everything degrades gracefully
to pure-Python fallbacks when a compiler isn't available — callers use
:func:`get_native` and check for None.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libfusg_io.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_native():
    """The loaded ctypes library, building it on first use; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _NATIVE_DIR / "fusg_io.cc"
    if not _LIB_PATH.exists() or (
        src.exists() and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.fusg_writer_create.restype = ctypes.c_void_p
    lib.fusg_writer_create.argtypes = [ctypes.c_int]
    lib.fusg_writer_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
    ]
    lib.fusg_writer_flush.argtypes = [ctypes.c_void_p]
    lib.fusg_writer_errors.restype = ctypes.c_int
    lib.fusg_writer_errors.argtypes = [ctypes.c_void_p]
    lib.fusg_writer_destroy.argtypes = [ctypes.c_void_p]
    lib.fusg_write_png.restype = ctypes.c_int
    lib.fusg_write_png.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
    ]
    lib.fusg_png_info.restype = ctypes.c_int
    lib.fusg_png_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
    ]
    lib.fusg_read_png.restype = ctypes.c_int
    lib.fusg_read_png.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int
    ]
    lib.fusg_tracking_count.restype = ctypes.c_long
    lib.fusg_tracking_count.argtypes = [ctypes.c_char_p]
    lib.fusg_tracking_parse.restype = ctypes.c_long
    lib.fusg_tracking_parse.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_double), ctypes.c_long
    ]
    _lib = lib
    return _lib


class AsyncPngWriter:
    """Background-thread PNG writer; falls back to synchronous PIL/cv2 writes."""

    def __init__(self, n_threads: int = 2):
        self._lib = get_native()
        self._pool = (
            self._lib.fusg_writer_create(n_threads) if self._lib is not None else None
        )

    def submit(self, path, rgb_u8: np.ndarray):
        rgb_u8 = np.ascontiguousarray(rgb_u8, dtype=np.uint8)
        h, w = rgb_u8.shape[:2]
        if self._pool is not None:
            self._lib.fusg_writer_submit(
                self._pool,
                str(path).encode(),
                rgb_u8.ctypes.data_as(ctypes.c_char_p),
                h,
                w,
            )
        else:
            _write_png_fallback(path, rgb_u8)

    def flush(self) -> int:
        """Wait for all pending writes; returns the error count."""
        if self._pool is not None:
            self._lib.fusg_writer_flush(self._pool)
            return self._lib.fusg_writer_errors(self._pool)
        return 0

    def close(self):
        if self._pool is not None:
            self._lib.fusg_writer_destroy(self._pool)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def _write_png_fallback(path, rgb_u8):
    try:
        import cv2

        cv2.imwrite(str(path), rgb_u8[..., ::-1])
    except ImportError:
        from PIL import Image

        Image.fromarray(rgb_u8).save(path)


def write_png(path, rgb_u8: np.ndarray) -> None:
    lib = get_native()
    rgb_u8 = np.ascontiguousarray(rgb_u8, dtype=np.uint8)
    if lib is not None:
        rc = lib.fusg_write_png(
            str(path).encode(),
            rgb_u8.ctypes.data_as(ctypes.c_char_p),
            rgb_u8.shape[0],
            rgb_u8.shape[1],
        )
        if rc == 0:
            return
    _write_png_fallback(path, rgb_u8)


def read_png(path) -> Optional[np.ndarray]:
    """Decode a PNG to an RGB8 (H, W, 3) array with the native decoder
    (native/fusg_io.cc: 8-bit gray/RGB/RGBA, all scanline filters) — the
    cv2-free counterpart of cv2.imread for VideoReader's frame-dir ingestion.
    Returns None when the native library is unavailable; raises on a corrupt
    or unsupported (palette/16-bit/interlaced) file."""
    lib = get_native()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.fusg_png_info(str(path).encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native PNG probe failed for {path} (rc={rc})")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.fusg_read_png(
        str(path).encode(), out.ctypes.data_as(ctypes.c_char_p), h.value, w.value
    )
    if rc != 0:
        raise IOError(f"native PNG decode failed for {path} (rc={rc})")
    return out


def parse_tracking_native(path) -> Optional[np.ndarray]:
    """Fast tracking parse via native code; None if the library is unavailable."""
    lib = get_native()
    if lib is None:
        return None
    n = lib.fusg_tracking_count(str(path).encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, 6), np.float64)
    got = lib.fusg_tracking_parse(
        str(path).encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
    )
    if got == -2:
        raise ValueError(f"{path}: expected 10 columns")
    if got < 0:
        raise IOError(f"native parse failed for {path}")
    return out[:got]
