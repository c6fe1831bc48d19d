"""Compression-ratio metric tests (reference img_util.py:401-513 parity).

Covers the chunked blosc cratio (the product metric / checkpoint-selection
signal), edge-chunk handling, 5D input promotion, the pure-Python vs
native-C++ path equivalence, and the generic 2D-slice codec paths.
"""

import os

import numpy as np
import pytest

from exaspim_tpu.compression import (
    BloscCodec,
    ZstdShuffleCodec,
    best_codec,
    compress_and_decompress_2d,
    compute_cratio,
    compute_cratio_2d,
)
from exaspim_tpu.compression import native


def _poisson_volume(shape=(96, 96, 96), lam=80, offset=37, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.poisson(lam, shape) + offset).astype(np.uint16)


class _RawCodec:
    """Stores bytes verbatim — ratio must be exactly 1.0."""

    config = {"id": "raw"}

    def encode(self, buf):
        return np.ascontiguousarray(buf).tobytes()

    def decode(self, buf):
        return np.frombuffer(buf, dtype=np.uint16)


def test_cratio_raw_codec_is_one():
    img = _poisson_volume((64, 64, 64))
    assert compute_cratio(img, _RawCodec(), use_native=False) == 1.0


def test_cratio_constant_volume_compresses_well():
    img = np.full((64, 64, 64), 123, dtype=np.uint16)
    codec = best_codec(clevel=6)
    assert compute_cratio(img, codec) > 50


def test_cratio_ragged_edges_and_5d_input():
    img = _poisson_volume((70, 65, 64))
    codec = best_codec(clevel=6)
    r3 = compute_cratio(img, codec)
    r5 = compute_cratio(img[None, None], codec)
    assert r3 == r5 > 1.0


def test_blosc_roundtrip():
    codec = best_codec(clevel=6)
    img = _poisson_volume((32, 32, 32))
    out = np.frombuffer(codec.decode(codec.encode(img)), dtype=np.uint16)
    np.testing.assert_array_equal(out, img.ravel())


@pytest.mark.slow
def test_native_builds_from_source():
    """`make -C native` must succeed on this toolchain and the fresh
    library must match the Python chunk loop — an unbuildable fast path
    is dead weight, so the build itself is under test."""
    import ctypes
    import shutil
    import subprocess

    if shutil.which("make") is None or shutil.which("g++") is None:
        pytest.skip("no C++ toolchain on this host")
    # The Makefile links -l:libblosc.so.1 (the same library numcodecs
    # wraps); on a runner without the system library the build — and the
    # availability assert below — would fail spuriously rather than skip.
    try:
        ctypes.CDLL("libblosc.so.1")
    except OSError:
        pytest.skip("system libblosc.so.1 not present on this host")
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native",
    )
    r = subprocess.run(
        ["make", "-C", root], capture_output=True, text=True, timeout=300
    )
    assert r.returncode == 0, r.stderr
    with native._lock:
        native._lib = None  # force a fresh probe of the built library
    assert native.available()
    img = _poisson_volume((70, 65, 64), seed=5)
    codec = BloscCodec(cname="zstd", clevel=6, shuffle=1)
    assert compute_cratio(img, codec, use_native=False) == compute_cratio(
        img, codec, use_native=True
    )


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_matches_python_path():
    img = _poisson_volume((130, 100, 70), seed=3)
    codec = BloscCodec(cname="zstd", clevel=6, shuffle=1)
    assert compute_cratio(img, codec, use_native=False) == compute_cratio(
        img, codec, use_native=True
    )


def test_zstd_fallback_codec_ratio_close_to_blosc():
    img = _poisson_volume((64, 64, 64), seed=1)
    r_blosc = compute_cratio(img, BloscCodec(clevel=6), use_native=False)
    r_zstd = compute_cratio(img, ZstdShuffleCodec(clevel=6), use_native=False)
    assert abs(r_blosc - r_zstd) / r_blosc < 0.25


class _Flat2D:
    """Trivial 2D codec: raw bytes, identity round-trip."""

    def encode(self, sl):
        self.last_shape = sl.shape
        self.last_dtype = sl.dtype
        return np.ascontiguousarray(sl).tobytes()

    def decode(self, buf):
        return np.frombuffer(buf, dtype=self.last_dtype).reshape(
            self.last_shape
        )


def test_cratio_2d_and_roundtrip_2d():
    img = _poisson_volume((32, 40, 24), seed=2)
    codec = _Flat2D()
    assert compute_cratio_2d(img, codec, patch_shape=(16, 16, 16)) == 1.0
    out, ratio = compress_and_decompress_2d(
        img, codec, patch_shape=(16, 16, 16)
    )
    assert ratio == 1.0
    np.testing.assert_array_equal(out, img)


def test_jpeg_slice_codec_roundtrip_and_ratio():
    from exaspim_tpu.compression import JpegSliceCodec, compute_cratio_2d

    img = _poisson_volume((16, 64, 64), lam=2000, offset=500, seed=5)
    codec = JpegSliceCodec(quality=85)
    ratio = compute_cratio_2d(img, codec, patch_shape=(8, 64, 64))
    assert ratio > 2.0
    sl = img[0]
    out = codec.decode(codec.encode(sl))
    assert out.shape == sl.shape and out.dtype == sl.dtype
    # Lossy but in the right ballpark (8-bit quantization + JPEG).
    assert abs(float(out.mean()) - float(sl.mean())) < 0.1 * sl.mean()


def test_png_slice_codec_lossless():
    from exaspim_tpu.compression import PngSliceCodec

    img = _poisson_volume((4, 32, 32), seed=6)
    codec = PngSliceCodec()
    out = codec.decode(codec.encode(img[0]))
    np.testing.assert_array_equal(out, img[0])


def test_jpegxl_slice_codec_uint16_faithful():
    from exaspim_tpu.compression import (
        JxlSliceCodec,
        compress_and_decompress_2d,
        jxl_available,
    )

    if not jxl_available():
        pytest.skip("libjxl not present on this system")
    img = _poisson_volume((4, 64, 64), lam=2000, offset=500, seed=7)
    # Lossless mode must round-trip the full 16-bit range exactly.
    lossless = JxlSliceCodec(lossless=True)
    np.testing.assert_array_equal(
        lossless.decode(lossless.encode(img[0])), img[0]
    )
    # Lossy mode keeps uint16 dtype and stays in the right ballpark.
    lossy = JxlSliceCodec(distance=1.0)
    out, ratio = compress_and_decompress_2d(
        img, lossy, patch_shape=(4, 64, 64)
    )
    assert out.dtype == np.uint16 and out.shape == img.shape
    assert ratio > 4.0
    assert abs(float(out.mean()) - float(img.mean())) < 0.1 * img.mean()


def test_jpegxl_codec_is_thread_safe_stateless():
    from concurrent.futures import ThreadPoolExecutor

    from exaspim_tpu.compression import JxlSliceCodec, jxl_available

    if not jxl_available():
        pytest.skip("libjxl not present on this system")
    rng = np.random.default_rng(3)
    slices = [
        (rng.poisson(100, (32 + 8 * i, 40)) * (i + 1)).astype(np.uint16)
        for i in range(8)
    ]
    codec = JxlSliceCodec(lossless=True)
    with ThreadPoolExecutor(max_workers=8) as pool:
        encs = list(pool.map(codec.encode, slices))
        outs = list(pool.map(codec.decode, encs))
    for sl, out in zip(slices, outs):
        np.testing.assert_array_equal(out, sl)


def test_jpegxl_multiframe_3d_roundtrip():
    """3D stacks encode frame-per-slice into one multiframe codestream
    and decode back stacked — the layout jxl-coded 3D zarr chunks use
    (reference img_util.py:170 registers the Jpegxl zarr codec)."""
    from exaspim_tpu.compression import jxl_available
    from exaspim_tpu.compression.jxl import jxl_decode, jxl_encode

    if not jxl_available():
        pytest.skip("libjxl not present on this system")
    vol = _poisson_volume((5, 40, 48), lam=2000, offset=500, seed=12)
    enc = jxl_encode(vol, lossless=True)
    out = jxl_decode(enc)
    assert out.shape == vol.shape
    np.testing.assert_array_equal(out, vol)
    # 2D slices keep returning 2D.
    assert jxl_decode(jxl_encode(vol[0], lossless=True)).ndim == 2


def test_jpeg2000_slice_codec_uint16():
    from exaspim_tpu.compression import Jpeg2000SliceCodec

    img = _poisson_volume((2, 64, 64), lam=2000, offset=500, seed=8)
    lossy = Jpeg2000SliceCodec(quality=20)
    out = lossy.decode(lossy.encode(img[0]))
    assert out.dtype == np.uint16 and out.shape == img[0].shape
    assert abs(float(out.mean()) - float(img[0].mean())) < 0.1 * img.mean()
    lossless = Jpeg2000SliceCodec(quality=None)
    np.testing.assert_array_equal(
        lossless.decode(lossless.encode(img[0])), img[0]
    )


def test_compute_cratio_jpegxl_chunked():
    from exaspim_tpu.compression import jxl_available
    from exaspim_tpu.compression.cratio import compute_cratio_jpegxl

    if not jxl_available():
        pytest.skip("libjxl not present on this system")
    img = _poisson_volume((8, 96, 80), lam=2000, offset=500, seed=9)
    lossy = compute_cratio_jpegxl(img, patch_shape=(8, 64, 64))
    lossless = compute_cratio_jpegxl(
        img, patch_shape=(8, 64, 64), lossless=True
    )
    assert lossy > lossless > 1.0
