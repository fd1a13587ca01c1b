"""ctypes bindings for the native host runtime (libsonar_native.so).

Builds on demand with ``make`` (g++) and degrades gracefully: every entry
point has a NumPy fallback with identical semantics, so the framework works
without a compiler. The NumPy implementations in
``sonar_slam_tpu/io/dataset.py`` are the reference; tests assert equivalence.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libsonar_native.so")
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR], check=True, capture_output=True
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None

    i64 = ctypes.c_int64
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    lib.align_nearest.argtypes = [f64p, i64, f64p, i64, i64p, f64p]
    lib.align_last_before.argtypes = [f64p, i64, f64p, i64, i64p]
    lib.gamma_decompress_u8.argtypes = [u8p, i64, ctypes.c_double, f32p]
    lib.cfar_sum_modes.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_int, u8p, ctypes.c_void_p,
    ]
    lib.cfar_os.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, u8p, ctypes.c_void_p,
    ]
    lib.voxel_downsample.argtypes = [
        f32p, i64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int, i64, f32p,
    ]
    lib.voxel_downsample.restype = i64
    lib.lz4_decompress_block.argtypes = [
        ctypes.c_char_p, i64, u8p, i64,
    ]
    lib.lz4_decompress_block.restype = i64
    lib.xxh32.argtypes = [ctypes.c_char_p, i64, ctypes.c_uint32]
    lib.xxh32.restype = ctypes.c_uint32
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def align_nearest(ref_times: np.ndarray, query_times: np.ndarray):
    """Nearest ref index + |dt| per query. Native or NumPy."""
    lib = _load()
    ref = np.ascontiguousarray(ref_times, np.float64)
    q = np.ascontiguousarray(query_times, np.float64)
    if lib is None:
        from sonar_slam_tpu.io.dataset import _nearest

        return _nearest(ref, q)
    idx = np.empty(len(q), np.int64)
    dt = np.empty(len(q), np.float64)
    lib.align_nearest(ref, len(ref), q, len(q), idx, dt)
    return idx, dt


def align_last_before(ref_times: np.ndarray, query_times: np.ndarray):
    lib = _load()
    ref = np.ascontiguousarray(ref_times, np.float64)
    q = np.ascontiguousarray(query_times, np.float64)
    if lib is None:
        from sonar_slam_tpu.io.dataset import _last_at_or_before

        return _last_at_or_before(ref, q)
    idx = np.empty(len(q), np.int64)
    lib.align_last_before(ref, len(ref), q, len(q), idx)
    return idx


def xxh32(data: bytes, seed: int = 0):
    """Native XXH32; None when the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    return int(lib.xxh32(data, len(data), seed))


def lz4_decompress_block(src: bytes, max_out: int):
    """Native LZ4 block decode; returns bytes, or None when the native lib
    is unavailable (caller falls back to the pure-Python codec)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(max_out, np.uint8)
    n = lib.lz4_decompress_block(src, len(src), out, max_out)
    if n < 0:
        raise ValueError("corrupt LZ4 block (native decoder)")
    return out[:n].tobytes()


def gamma_decompress(img_u8: np.ndarray, gamma: float) -> np.ndarray:
    """clip(pow(i/255, 255/gamma) * 255) over uint8 frames."""
    lib = _load()
    flat = np.ascontiguousarray(img_u8, np.uint8)
    if lib is None:
        x = np.power(flat.astype(np.float32) / 255.0, 255.0 / gamma) * 255.0
        return np.clip(x, 0, 255).astype(np.float32)
    out = np.empty(flat.size, np.float32)
    lib.gamma_decompress_u8(flat.reshape(-1), flat.size, float(gamma), out)
    return out.reshape(flat.shape)


_MODES = {"CA": 0, "SOCA": 1, "GOCA": 2}


def cfar_detect(img: np.ndarray, train_hs: int, guard_hs: int, tau: float,
                mode: str = "SOCA", rank: int = 0) -> np.ndarray:
    """Golden CPU CFAR (same semantics as the TPU kernels)."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    rows, cols = img.shape
    if lib is None:
        raise RuntimeError(
            "native library unavailable; use sonar_slam_tpu.kernels.cfar"
        )
    det = np.zeros((rows, cols), np.uint8)
    if mode == "OS":
        lib.cfar_os(img, rows, cols, train_hs, guard_hs, rank, tau, det, None)
    else:
        lib.cfar_sum_modes(
            img, rows, cols, train_hs, guard_hs, tau, _MODES[mode], det, None
        )
    return det.astype(bool)


def voxel_downsample(points: np.ndarray, resolution: float, x0: float,
                     y0: float, nx: int, ny: int, max_out: int) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        raise RuntimeError(
            "native library unavailable; use sonar_slam_tpu.cloud.voxel"
        )
    out = np.zeros((max_out, 2), np.float32)
    m = lib.voxel_downsample(
        pts.reshape(-1), len(pts), resolution, x0, y0, nx, ny, max_out,
        out.reshape(-1),
    )
    return out[:m]
