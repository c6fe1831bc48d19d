"""Chunked compression codecs and the compression-ratio product metric.

The reference's product metric is a Zarr-style chunked blosc-zstd
compression ratio (reference img_util.py:401-441, train.py:105). Python
blosc bindings are not assumed; :mod:`exaspim_tpu.compression.blosc` binds
the system ``libblosc`` directly via ctypes (bit-identical ratios), with a
pure zstandard+shuffle fallback. A native C++ fast path
(:mod:`exaspim_tpu.compression.native`) walks the chunk grid without the
Python loop, and :mod:`exaspim_tpu.compression.proxy` provides a
device-side differentiably-monitorable compressibility estimate for
in-loop use.
"""

from exaspim_tpu.compression.blosc import BloscCodec, ZstdShuffleCodec, best_codec
from exaspim_tpu.compression.cratio import (
    compress_and_decompress_2d,
    compute_cratio,
    compute_cratio_2d,
    compute_cratio_jpegxl,
)
from exaspim_tpu.compression.jpeg import (
    Jpeg2000SliceCodec,
    JpegSliceCodec,
    PngSliceCodec,
)
from exaspim_tpu.compression.jxl import JxlSliceCodec
from exaspim_tpu.compression.jxl import available as jxl_available
from exaspim_tpu.compression.proxy import cratio_proxy

__all__ = [
    "BloscCodec",
    "Jpeg2000SliceCodec",
    "JpegSliceCodec",
    "JxlSliceCodec",
    "PngSliceCodec",
    "jxl_available",
    "ZstdShuffleCodec",
    "best_codec",
    "compute_cratio",
    "compute_cratio_2d",
    "compute_cratio_jpegxl",
    "compress_and_decompress_2d",
    "cratio_proxy",
]
