"""ctypes bindings for the nkbx native data path (libnkbx_data.so).

``NativeDecodePool`` decodes a batch of JPEG/PNG files with a C++ thread pool,
optionally crops a bbox per file, applies LongestMaxSize+center-pad (or stretch
resize), and writes directly into a preallocated uint8 NHWC numpy buffer —
replacing Python-side cv2 decode in loader workers when the pipeline's host
stage is exactly [LongestMaxSize, PadIfNeeded] or [Resize].

Falls back cleanly: if the .so is missing, ``load()`` tries ``make`` once and
returns None on failure; callers must keep the Python path working.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libnkbx_data.so"

MODE_LONGEST_PAD = 0
MODE_STRETCH = 1

_lib = None
_load_failed = False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_DIR)], check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.nkbx_pool_create.restype = ctypes.c_void_p
        lib.nkbx_pool_create.argtypes = [ctypes.c_int]
        lib.nkbx_pool_destroy.argtypes = [ctypes.c_void_p]
        lib.nkbx_decode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.nkbx_version.restype = ctypes.c_char_p
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


class NativeDecodePool:
    """C++ thread-pool batch decoder. Raises RuntimeError if lib unavailable."""

    def __init__(self, n_threads: int = 0):
        lib = load()
        if lib is None:
            raise RuntimeError("libnkbx_data.so unavailable (build failed?)")
        self._lib = lib
        self._pool = lib.nkbx_pool_create(n_threads)

    def decode_batch(self, paths, out_h: int, out_w: int, crops=None,
                     mode: int = MODE_LONGEST_PAD, out: Optional[np.ndarray] = None):
        """Decode ``paths`` into a (N, out_h, out_w, 3) uint8 batch.

        Args:
            crops: optional (N, 4) int32 xyxy boxes; row of -1 = no crop.
            out: optional preallocated output buffer.
        Returns: (batch, status) — status[i] == 0 on success.
        """
        n = len(paths)
        if out is None:
            out = np.zeros((n, out_h, out_w, 3), dtype=np.uint8)
        assert out.shape == (n, out_h, out_w, 3) and out.dtype == np.uint8 and out.flags.c_contiguous
        status = np.zeros(n, dtype=np.int32)
        c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        if crops is not None:
            crops = np.ascontiguousarray(crops, dtype=np.int32)
            assert crops.shape == (n, 4)
            c_crops = crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        else:
            c_crops = None
        self._lib.nkbx_decode_batch(
            self._pool, c_paths, n, c_crops, out_h, out_w, mode,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return out, status

    def __del__(self):
        try:
            if getattr(self, "_pool", None):
                self._lib.nkbx_pool_destroy(self._pool)
                self._pool = None
        except Exception:
            pass


def version() -> Optional[str]:
    lib = load()
    return lib.nkbx_version().decode() if lib else None
