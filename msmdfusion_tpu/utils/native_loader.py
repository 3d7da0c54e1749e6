"""ctypes bindings for the native C++ multi-sweep loader.

Falls back to the numpy pipeline when the shared library is unavailable.
Build with ``make -C native``.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), 'native', 'libmsmd_loader.so')
_lib = None


def _load_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.msmd_load_sweeps.restype = ctypes.c_int64
        lib.msmd_load_sweeps.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def load_sweeps(paths: Sequence[str], transforms: np.ndarray,
                time_deltas: Sequence[float], capacity: int,
                load_dim: int = 5, out_dim: int = 5,
                point_range: Optional[Sequence[float]] = None,
                remove_close: bool = True,
                num_threads: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """Load keyframe+sweeps into fixed [capacity, out_dim] buffers.

    Args:
        paths: file paths, keyframe first.
        transforms: [len(paths), 3, 4] row-major [R|t] sensor->lidar.
        time_deltas: per-file timestamp channel.
    Returns:
        (points [capacity, out_dim] f32, mask [capacity] bool).
    """
    lib = _load_lib()
    n = len(paths)
    points = np.zeros((capacity, out_dim), np.float32)
    mask = np.zeros((capacity,), np.uint8)
    if lib is None:
        # numpy fallback
        written = 0
        for i, path in enumerate(paths):
            raw = np.fromfile(path, dtype=np.float32).reshape(-1, load_dim)
            if i > 0 and remove_close:
                raw = raw[np.linalg.norm(raw[:, :2], axis=1) >= 1.0]
            xyz = raw[:, :3] @ transforms[i, :, :3].T + transforms[i, :, 3]
            if point_range is not None:
                pr = np.asarray(point_range)
                keep = np.all((xyz >= pr[:3]) & (xyz <= pr[3:]), axis=1)
                raw, xyz = raw[keep], xyz[keep]
            take = min(len(raw), capacity - written)
            points[written:written + take, :3] = xyz[:take]
            extra = min(load_dim, out_dim - 1)
            points[written:written + take, 3:extra] = raw[:take, 3:extra]
            points[written:written + take, out_dim - 1] = time_deltas[i]
            written += take
        mask[:written] = 1
        return points, mask.astype(bool)

    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    trans = np.ascontiguousarray(transforms, np.float32).reshape(-1)
    deltas = np.ascontiguousarray(time_deltas, np.float32)
    rng = None
    if point_range is not None:
        rng_arr = np.ascontiguousarray(point_range, np.float32)
        rng = rng_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    lib.msmd_load_sweeps(
        c_paths, trans.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        deltas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, load_dim, out_dim, rng, int(remove_close),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        capacity, num_threads)
    return points, mask.astype(bool)
