"""Native C++ fast path for the chunked compression-ratio metric.

Binds ``libexaspim_native.so`` (built from ``native/``) via ctypes. The C++
side walks the 64³ chunk grid and calls ``blosc_compress_ctx`` across a
thread pool, removing the per-chunk Python loop of
:func:`exaspim_tpu.compression.cratio.compute_cratio` (reference
img_util.py:401-441 does this loop in Python). Falls back silently when the
library has not been built — ``available()`` gates every call site.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_SHUFFLE_IDS = {0: 0, 1: 1, 2: 2, "noshuffle": 0, "shuffle": 1, "bitshuffle": 2}


def _candidate_paths():
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(os.path.dirname(here))
    env = os.environ.get("EXASPIM_NATIVE_LIB")
    if env:
        yield env
    yield os.path.join(root, "native", "build", "libexaspim_native.so")
    yield os.path.join(root, "native", "libexaspim_native.so")


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        for path in _candidate_paths():
            if not os.path.exists(path):
                continue
            try:
                lib = ctypes.CDLL(path)
            except OSError:
                continue
            lib.exaspim_chunked_cratio.restype = ctypes.c_double
            lib.exaspim_chunked_cratio.argtypes = [
                ctypes.c_void_p,                      # uint16 volume
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # shape
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,  # chunk
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int,     # cname/clevel/shuffle
                ctypes.c_int,                         # n_threads
            ]
            _lib = lib
            return _lib
        _lib = False
        return _lib


def available():
    """True when the compiled native library is loadable."""
    return bool(_load())


def chunked_cratio(img, chunk_shape, cname="zstd", clevel=6, shuffle=1,
                   n_threads=0):
    """Chunked blosc compression ratio via the C++ runtime."""
    lib = _load()
    if not lib:
        raise RuntimeError("native library not built; check available() first")
    img = np.ascontiguousarray(img, dtype=np.uint16)
    if img.ndim != 3:
        raise ValueError(f"expected 3D volume, got shape {img.shape}")
    sh = _SHUFFLE_IDS.get(shuffle, shuffle)
    ratio = lib.exaspim_chunked_cratio(
        img.ctypes.data_as(ctypes.c_void_p),
        *[ctypes.c_int64(int(s)) for s in img.shape],
        *[ctypes.c_int64(int(c)) for c in chunk_shape],
        str(cname).encode(), int(clevel), int(sh), int(n_threads),
    )
    if ratio <= 0:
        raise RuntimeError(f"native chunked_cratio failed (code {ratio})")
    return float(ratio)
