"""ctypes binding for the native host runtime (libcbv_native.so).

Auto-builds with make on first import if the shared library is missing;
falls back gracefully (``AVAILABLE = False``) when no toolchain exists —
callers use the pure-Python/JAX paths then, mirroring the reference's
Cython-else-Python import seam (frame_enhancer.py:8-21).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libcbv_native.so")

_lib = None
AVAILABLE = False


def _build():
    try:
        subprocess.run(
            ["make", "-C", _DIR], check=True, capture_output=True, timeout=120
        )
        return True
    except (subprocess.SubprocessError, OSError) as e:
        print(f"[native] build failed: {e}", file=sys.stderr)
        return False


def _stale():
    """True when the .so is missing or older than its sources."""
    if not os.path.exists(_LIB_PATH):
        return True
    so_mtime = os.path.getmtime(_LIB_PATH)
    for src in ("src/cbv_native.cpp", "Makefile"):
        p = os.path.join(_DIR, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_mtime:
            return True
    return False


def _load():
    global _lib, AVAILABLE
    if _stale():
        if not _build() and not os.path.exists(_LIB_PATH):
            return
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        print(f"[native] load failed: {e}", file=sys.stderr)
        return

    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64 = ctypes.c_int64

    lib.cbv_resample_bgr.argtypes = [u8p, i64, i32p, f32p, f32p, u8p, i64, u8p, u8p, u8p]
    lib.cbv_resample_gray.argtypes = [u8p, i64, i32p, f32p, f32p, u8p, i64, u8p]
    lib.cbv_to_planar.argtypes = [u8p, i64, i64, u8p]
    lib.cbv_ring_create.restype = ctypes.c_void_p
    lib.cbv_ring_create.argtypes = [i64, i64]
    lib.cbv_ring_destroy.argtypes = [ctypes.c_void_p]
    for fn in ("cbv_ring_push", "cbv_ring_pop"):
        getattr(lib, fn).restype = i64
        getattr(lib, fn).argtypes = [ctypes.c_void_p, u8p]
    for fn in ("cbv_ring_skip_to_latest", "cbv_ring_size", "cbv_ring_dropped"):
        getattr(lib, fn).restype = i64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]

    _lib = lib
    AVAILABLE = True


_load()


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


class HostResampler:
    """Host-side bilinear warp+extract using the same static plan as the
    device path (ops/static_resample.ResamplePlan geometry)."""

    def __init__(self, X, Y, src_h: int, src_w: int):
        X = np.asarray(X, np.float32).reshape(-1)
        Y = np.asarray(Y, np.float32).reshape(-1)
        ix = np.floor(X).astype(np.int64)
        iy = np.floor(Y).astype(np.int64)
        self.fx = (X - ix).astype(np.float32)
        self.fy = (Y - iy).astype(np.float32)
        oob = np.zeros(X.size, np.uint8)
        for bit, (dy, dx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            yy, xx = iy + dy, ix + dx
            bad = ~((yy >= 0) & (yy < src_h) & (xx >= 0) & (xx < src_w))
            oob |= (bad.astype(np.uint8)) << bit
        anchor_bad = ~((iy >= 0) & (iy < src_h) & (ix >= 0) & (ix < src_w))
        oob |= np.where(anchor_bad, 0x0F, 0).astype(np.uint8)
        self.oob = oob
        iyc = np.clip(iy, 0, src_h - 1)
        ixc = np.clip(ix, 0, src_w - 1)
        self.idx = (iyc * src_w + ixc).astype(np.int32)
        self.src_w = src_w
        self.n = X.size

    def resample_gray(self, frame_hwc: np.ndarray) -> np.ndarray:
        assert AVAILABLE, "native library not available"
        frame = np.ascontiguousarray(frame_hwc)
        out = np.empty(self.n, np.uint8)
        _lib.cbv_resample_gray(
            _u8(frame),
            self.src_w,
            self.idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.fx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.fy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _u8(self.oob),
            self.n,
            _u8(out),
        )
        return out

    def resample_bgr(self, frame_hwc: np.ndarray):
        assert AVAILABLE, "native library not available"
        frame = np.ascontiguousarray(frame_hwc)
        b = np.empty(self.n, np.uint8)
        g = np.empty(self.n, np.uint8)
        r = np.empty(self.n, np.uint8)
        _lib.cbv_resample_bgr(
            _u8(frame),
            self.src_w,
            self.idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.fx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.fy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            _u8(self.oob),
            self.n,
            _u8(b),
            _u8(g),
            _u8(r),
        )
        return b, g, r


def to_planar_native(frame_hwc: np.ndarray) -> np.ndarray:
    assert AVAILABLE
    frame = np.ascontiguousarray(frame_hwc)
    h, w = frame.shape[:2]
    out = np.empty((3, h, w), np.uint8)
    _lib.cbv_to_planar(_u8(frame), h, w, _u8(out))
    return out


class FrameRing:
    """SPSC frame ring buffer (capture thread -> pipeline thread)."""

    def __init__(self, frame_shape, n_slots: int = 4):
        assert AVAILABLE
        self.shape = tuple(frame_shape)
        self.slot_bytes = int(np.prod(self.shape))
        self._ring = _lib.cbv_ring_create(self.slot_bytes, n_slots)

    def push(self, frame: np.ndarray) -> int:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        assert frame.shape == self.shape
        return _lib.cbv_ring_push(self._ring, _u8(frame))

    def pop(self):
        out = np.empty(self.shape, np.uint8)
        seq = _lib.cbv_ring_pop(self._ring, _u8(out))
        return (seq, out) if seq else (0, None)

    def skip_to_latest(self) -> int:
        return _lib.cbv_ring_skip_to_latest(self._ring)

    def __len__(self):
        return _lib.cbv_ring_size(self._ring)

    @property
    def dropped(self) -> int:
        return _lib.cbv_ring_dropped(self._ring)

    def close(self):
        if self._ring:
            _lib.cbv_ring_destroy(self._ring)
            self._ring = None
