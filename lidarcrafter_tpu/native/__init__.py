"""Native (C++) host-side kernels for the data-loading path.

The reference's runtime leans on native code for everything host-side (CUDA
ops compiled by ``lidargen/ops/setup.py``, multi-worker torch DataLoader);
this package is the TPU-native analogue for the parts that genuinely belong
on the host: the per-sample range projection (``src/range_projection.cpp``)
and the threaded prefetching batch loader built on it (``loader.py``).

The shared library builds on demand with the baked-in ``g++`` (one-time,
cached next to the source; rebuilt when the source is newer).  Everything
degrades gracefully: if the toolchain or build is unavailable, callers fall
back to the pure-JAX path (``ops/projection.py``).

Env: ``LCT_NATIVE=0`` disables the native path entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "range_projection.cpp")
_SO = os.path.join(_DIR, "_librange.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
    )


def get_lib():
    """dlopen the kernel library, building it first if needed.

    Returns None (and remembers the failure) if the toolchain is missing or
    the build fails — callers fall back to the JAX path.
    """
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.project_range_image.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # pts
                ctypes.c_int64, ctypes.c_int64,  # n, c
                ctypes.c_int64, ctypes.c_int64,  # H, W
                ctypes.c_float, ctypes.c_float,  # min/max depth
                ctypes.c_double, ctypes.c_double,  # fov up/down (deg)
                ctypes.POINTER(ctypes.c_float),  # out
            ]
            lib.project_range_image.restype = None
            _lib = lib
        except Exception:
            _lib_failed = True
    return _lib


def native_enabled() -> bool:
    if os.environ.get("LCT_NATIVE", "1") == "0":
        return False
    return get_lib() is not None


def project_range_image_native(
    points: np.ndarray,
    *,
    H: int,
    W: int,
    min_depth: float,
    max_depth: float,
    fov_up: float = 10.0,
    fov_down: float = -30.0,
) -> np.ndarray | None:
    """(N, C>=3) float32 points → (H, W, C+2) range image, or None if the
    native library is unavailable.  Same contract as
    ``ops.projection.points_to_range_image`` (no padding mask: the host data
    path carries unpadded clouds)."""
    lib = get_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n, c = pts.shape
    out = np.zeros((H, W, c + 2), dtype=np.float32)
    lib.project_range_image(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, c, H, W,
        ctypes.c_float(min_depth), ctypes.c_float(max_depth),
        float(fov_up), float(fov_down),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
