"""Blosc codec bound directly to the system C library via ctypes.

Produces byte-identical compressed streams to the reference's
``numcodecs.blosc.Blosc`` (same C library, same ``blosc_compress_ctx``
parameters), so chunked compression ratios — the checkpoint-selection
signal and the product metric — are exactly comparable
(reference train.py:105, img_util.py:401-441).

Falls back to :class:`ZstdShuffleCodec` (python-zstandard + numpy byte
shuffle) when ``libblosc`` is not present; ratios are then close but not
bit-identical (no blosc block splitting / 16-byte header framing).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import threading

import numpy as np

#: blosc shuffle constants (blosc.h)
NOSHUFFLE = 0
SHUFFLE = 1
BITSHUFFLE = 2

_MAX_OVERHEAD = 16  # BLOSC_MAX_OVERHEAD

_lib = None
_lib_lock = threading.Lock()


def _load_blosc():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        for name in ("libblosc.so.1", "libblosc.so", "libblosc.dylib",
                     ctypes.util.find_library("blosc")):
            if not name:
                continue
            try:
                lib = ctypes.CDLL(name)
            except OSError:
                continue
            lib.blosc_compress_ctx.restype = ctypes.c_int
            lib.blosc_compress_ctx.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
            ]
            lib.blosc_decompress_ctx.restype = ctypes.c_int
            lib.blosc_decompress_ctx.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
                ctypes.c_int,
            ]
            lib.blosc_cbuffer_sizes.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_size_t),
            ]
            _lib = lib
            return _lib
        raise OSError("libblosc shared library not found")


def blosc_available():
    """True when the system blosc library can be loaded."""
    try:
        _load_blosc()
        return True
    except OSError:
        return False


class BloscCodec:
    """Blosc compressor matching ``numcodecs.Blosc`` encode/decode semantics.

    Parameters mirror the reference's codec construction
    (``Blosc(cname="zstd", clevel=6, shuffle=SHUFFLE)``).
    """

    def __init__(self, cname="zstd", clevel=6, shuffle=SHUFFLE, nthreads=1):
        self.cname = str(cname)
        self.clevel = int(clevel)
        self.shuffle = int(shuffle)
        self.nthreads = int(nthreads)
        self._lib = _load_blosc()

    def encode(self, buf):
        """Compresses a numpy array (or bytes); returns ``bytes``."""
        if isinstance(buf, np.ndarray):
            arr = np.ascontiguousarray(buf)
            typesize = arr.dtype.itemsize
            raw = arr.tobytes()
        else:
            raw = bytes(buf)
            typesize = 1
        dest = ctypes.create_string_buffer(len(raw) + _MAX_OVERHEAD)
        n = self._lib.blosc_compress_ctx(
            self.clevel, self.shuffle, typesize, len(raw), raw, dest,
            len(raw) + _MAX_OVERHEAD, self.cname.encode(), 0, self.nthreads,
        )
        if n <= 0:
            raise RuntimeError(f"blosc compression failed (rc={n})")
        return dest.raw[:n]

    def decode(self, data):
        """Decompresses ``bytes``; returns ``bytes``."""
        data = bytes(data)
        nbytes = ctypes.c_size_t()
        cbytes = ctypes.c_size_t()
        blocksize = ctypes.c_size_t()
        self._lib.blosc_cbuffer_sizes(
            data, ctypes.byref(nbytes), ctypes.byref(cbytes),
            ctypes.byref(blocksize),
        )
        out = ctypes.create_string_buffer(nbytes.value)
        m = self._lib.blosc_decompress_ctx(data, out, nbytes.value,
                                           self.nthreads)
        if m != nbytes.value:
            raise RuntimeError(f"blosc decompression failed (rc={m})")
        return out.raw

    @property
    def config(self):
        """Serializable codec config (stamped into run records)."""
        return {
            "id": "blosc",
            "cname": self.cname,
            "clevel": self.clevel,
            "shuffle": self.shuffle,
        }


def byteshuffle(raw, typesize):
    """Blosc-style byte transposition: groups byte k of every element."""
    arr = np.frombuffer(raw, dtype=np.uint8)
    n = arr.size // typesize
    return arr[: n * typesize].reshape(n, typesize).T.copy().tobytes()


def unbyteshuffle(raw, typesize):
    """Inverse of :func:`byteshuffle`."""
    arr = np.frombuffer(raw, dtype=np.uint8)
    n = arr.size // typesize
    return arr.reshape(typesize, n).T.copy().tobytes()


class ZstdShuffleCodec:
    """zstd + byte-shuffle fallback when libblosc is unavailable.

    Same transform pipeline as blosc-zstd-SHUFFLE (shuffle then entropy
    code) without blosc's internal block splitting; ratios track blosc
    closely but are not bit-identical.
    """

    def __init__(self, clevel=6, shuffle=SHUFFLE, typesize=2):
        import zstandard

        self.clevel = int(clevel)
        self.shuffle = int(shuffle)
        self.typesize = int(typesize)
        self._c = zstandard.ZstdCompressor(level=self.clevel)
        self._d = zstandard.ZstdDecompressor()

    def encode(self, buf):
        if isinstance(buf, np.ndarray):
            arr = np.ascontiguousarray(buf)
            typesize = arr.dtype.itemsize
            raw = arr.tobytes()
        else:
            raw = bytes(buf)
            typesize = self.typesize
        if self.shuffle == SHUFFLE and typesize > 1:
            raw = byteshuffle(raw, typesize)
        # prepend typesize+shuffle byte so decode can invert
        header = bytes([typesize, self.shuffle])
        return header + self._c.compress(raw)

    def decode(self, data):
        data = bytes(data)
        typesize, shuffle = data[0], data[1]
        raw = self._d.decompress(data[2:])
        if shuffle == SHUFFLE and typesize > 1:
            raw = unbyteshuffle(raw, typesize)
        return raw

    @property
    def config(self):
        return {
            "id": "zstd-shuffle",
            "clevel": self.clevel,
            "shuffle": self.shuffle,
        }


def best_codec(cname="zstd", clevel=6, shuffle=SHUFFLE):
    """Returns the blosc codec when available, else the zstd fallback."""
    if blosc_available():
        return BloscCodec(cname=cname, clevel=clevel, shuffle=shuffle)
    return ZstdShuffleCodec(clevel=clevel, shuffle=shuffle)
