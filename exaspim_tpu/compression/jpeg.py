"""PIL-backed 2D slice codecs for lossy-compression experiments.

The reference experiments with JPEG-XL / JPEG slice codecs over chunked
volumes (reference img_util.py:444-513). The uint16-faithful JPEG-XL
codec lives in :mod:`exaspim_tpu.compression.jxl` (direct libjxl
binding); this module provides PIL-backed alternatives that need no
native jxl library:

* :class:`Jpeg2000SliceCodec` — uint16-faithful lossy/lossless (OpenJPEG).
* :class:`PngSliceCodec` — lossless, uint16-faithful.
* :class:`JpegSliceCodec` — 8-bit visual-band proxy (uint16 is reduced to
  its high byte; ratios from it are NOT comparable to 16-bit codecs —
  use JPEG-XL or JPEG 2000 for uint16-faithful experiments).

All codecs are stateless: any metadata ``decode`` needs is embedded in
the payload, so one codec instance is safe to share across the thread
pools in :func:`exaspim_tpu.compression.compute_cratio_2d` and
:func:`…compress_and_decompress_2d`.
"""

from __future__ import annotations

import io

import numpy as np

__all__ = ["JpegSliceCodec", "PngSliceCodec", "Jpeg2000SliceCodec"]

_TAG_UINT8 = 1
_TAG_UINT16 = 2


def _dtype_tag(dtype):
    if dtype == np.uint8:
        return _TAG_UINT8
    if dtype == np.uint16:
        return _TAG_UINT16
    raise ValueError(f"slice codecs support uint8/uint16, got {dtype}")


class JpegSliceCodec:
    """Lossy 8-bit JPEG over 2D slices; uint16 input is reduced to its
    high byte (visual-band proxy — see module docstring)."""

    def __init__(self, quality=85):
        self.quality = int(quality)
        self.config = {"id": "jpeg", "quality": self.quality}

    def encode(self, sl):
        from PIL import Image

        sl = np.asarray(sl)
        tag = _dtype_tag(sl.dtype)
        sl8 = (sl // 256).astype(np.uint8) if tag == _TAG_UINT16 else sl
        buf = io.BytesIO()
        Image.fromarray(sl8).save(buf, format="JPEG", quality=self.quality)
        return bytes([tag]) + buf.getvalue()

    def decode(self, data):
        from PIL import Image

        tag = data[0]
        arr = np.asarray(Image.open(io.BytesIO(data[1:])), dtype=np.uint8)
        if tag == _TAG_UINT16:
            return arr.astype(np.uint16) * 256
        return arr


class PngSliceCodec:
    """Lossless PNG over 2D slices; uint16-faithful (PIL ``I;16``)."""

    def __init__(self):
        self.config = {"id": "png"}

    def encode(self, sl):
        from PIL import Image

        sl = np.asarray(sl)
        tag = _dtype_tag(sl.dtype)
        buf = io.BytesIO()
        Image.fromarray(sl).save(buf, format="PNG")
        return bytes([tag]) + buf.getvalue()

    def decode(self, data):
        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(data[1:])))
        return arr.astype(np.uint16 if data[0] == _TAG_UINT16 else np.uint8)


class Jpeg2000SliceCodec:
    """JPEG 2000 over 2D slices — uint16-faithful lossy compression.

    ``quality`` is the OpenJPEG quality-layer ratio (higher = more
    compression); ``quality=None`` selects reversible (lossless) coding.
    """

    def __init__(self, quality=40):
        self.quality = None if quality is None else float(quality)
        self.config = {"id": "jpeg2000", "quality": self.quality}

    def encode(self, sl):
        from PIL import Image

        sl = np.asarray(sl)
        tag = _dtype_tag(sl.dtype)
        buf = io.BytesIO()
        kwargs = (
            {"irreversible": False}
            if self.quality is None
            else {"irreversible": True, "quality_layers": [self.quality]}
        )
        Image.fromarray(sl).save(buf, format="JPEG2000", **kwargs)
        return bytes([tag]) + buf.getvalue()

    def decode(self, data):
        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(data[1:])))
        dtype = np.uint16 if data[0] == _TAG_UINT16 else np.uint8
        info = np.iinfo(dtype)
        return np.clip(arr, info.min, info.max).astype(dtype)
