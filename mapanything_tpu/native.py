"""ctypes bindings for the native data-loader kernels (native/dataops.cpp).

The shared library is built on first use with g++ (cached next to the
source); every entry point has a pure-numpy fallback so the framework works
without a compiler."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libdataops.so"
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    src = _NATIVE_DIR / "dataops.cpp"
    if not src.exists():
        return False
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-fopenmp",
        "-o", str(_SO_PATH), str(src),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not _SO_PATH.exists() and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(str(_SO_PATH))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")

        lib.covis_random_walk.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, i32p,
        ]
        lib.covis_random_walk.restype = ctypes.c_int

        lib.resize_normalize_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int,
            f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ]
        lib.resize_normalize_u8.restype = None

        lib.normalize_u8.argtypes = [u8p, ctypes.c_int, f32p, f32p, f32p]
        lib.normalize_u8.restype = None
        _lib = lib
    except OSError:
        _load_failed = True
    return _lib


def covis_random_walk(
    covis: np.ndarray, num_samples: int, thres: float, seed: int,
    max_retries: int = 4, bidirectional: bool = True,
) -> Optional[np.ndarray]:
    """Native covisibility random walk; None when the library is unavailable
    (caller falls back to the Python implementation)."""
    lib = get_lib()
    if lib is None:
        return None
    covis = np.ascontiguousarray(covis, dtype=np.float32)
    out = np.empty(num_samples, np.int32)
    n = lib.covis_random_walk(
        covis, covis.shape[0], num_samples, float(thres),
        np.uint64(seed), int(max_retries), int(bidirectional), out,
    )
    return out[:n]


def resize_normalize_u8(
    img: np.ndarray, out_hw: tuple[int, int],
    mean: np.ndarray, std: np.ndarray,
) -> Optional[np.ndarray]:
    """Native bilinear resize + normalize of a (H, W, 3) uint8 image."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    dh, dw = out_hw
    dst = np.empty((dh, dw, 3), np.float32)
    lib.resize_normalize_u8(
        img, img.shape[0], img.shape[1], dst, dh, dw,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
    )
    return dst


def normalize_u8(img: np.ndarray, mean: np.ndarray, std: np.ndarray
                 ) -> Optional[np.ndarray]:
    """Native normalize of a (..., 3) uint8 image (no resize)."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    dst = np.empty(img.shape, np.float32)
    lib.normalize_u8(
        img.reshape(-1), img.size,
        np.ascontiguousarray(mean, np.float32),
        np.ascontiguousarray(std, np.float32),
        dst.reshape(-1),
    )
    return dst
