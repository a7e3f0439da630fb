"""ctypes bindings for the native (C++) host data-path kernels.

Builds `libaugment.so` lazily with g++ on first use; every entry point has a
pure-Python fallback in `data/augment.py` / `data/events.py`, so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libaugment.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_DIR), "libaugment.so"],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.warp_perspective_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f64p, u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
    ]
    lib.hsv_jitter_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
    ]
    lib.paint_events_u8.argtypes = [
        i32p, i32p, i32p, ctypes.c_int64, u8p, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def is_available() -> bool:
    return get_lib() is not None


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def warp_perspective(src: np.ndarray, minv: np.ndarray, out_hw, fill=(114, 114, 114)):
    """Inverse-mapped bilinear warp (native).  minv: 3x3 OUTPUT->INPUT."""
    lib = get_lib()
    assert lib is not None
    src = np.ascontiguousarray(src, np.uint8)
    dh, dw = out_hw
    dst = np.empty((dh, dw, 3), np.uint8)
    m = np.ascontiguousarray(minv, np.float64)
    lib.warp_perspective_u8(
        _u8(src), src.shape[0], src.shape[1],
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        _u8(dst), dh, dw, fill[0], fill[1], fill[2],
    )
    return dst


def hsv_jitter(img: np.ndarray, rh: float, rs: float, rv: float):
    lib = get_lib()
    assert lib is not None
    img = np.ascontiguousarray(img, np.uint8)
    lib.hsv_jitter_u8(_u8(img), img.shape[0], img.shape[1], rh, rs, rv)
    return img


def paint_events(xs, ys, ps, canvas: np.ndarray):
    lib = get_lib()
    assert lib is not None
    xs = np.ascontiguousarray(xs, np.int32)
    ys = np.ascontiguousarray(ys, np.int32)
    ps = np.ascontiguousarray(ps, np.int32)
    i32 = ctypes.POINTER(ctypes.c_int32)
    lib.paint_events_u8(
        xs.ctypes.data_as(i32), ys.ctypes.data_as(i32),
        ps.ctypes.data_as(i32), len(xs),
        _u8(canvas), canvas.shape[0], canvas.shape[1],
    )
    return canvas
