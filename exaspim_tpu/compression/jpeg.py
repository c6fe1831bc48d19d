"""2D slice codecs for lossy-compression experiments.

The reference experiments with JPEG-XL / JPEG slice codecs over chunked
volumes (reference img_util.py:444-513). This provides the same
capability through PIL's JPEG (and PNG for lossless comparison) so the
generic 2D chunk paths (:func:`exaspim_tpu.compression.compute_cratio_2d`,
:func:`…compress_and_decompress_2d`) run without imagecodecs.

uint16 slices are JPEG-coded as the 8-bit high byte with the residual
low byte carried losslessly only in ``quality='lossless'`` mode; for
ratio experiments the default 8-bit path matches how these codecs are
actually used (visual-band evaluation).
"""

from __future__ import annotations

import io

import numpy as np

__all__ = ["JpegSliceCodec", "PngSliceCodec"]


class JpegSliceCodec:
    """Lossy JPEG codec over 2D slices (uint8 or uint16 input)."""

    def __init__(self, quality=85):
        self.quality = int(quality)
        self.config = {"id": "jpeg", "quality": self.quality}
        self._shape = None
        self._dtype = None
        self._scale = 1

    def encode(self, sl):
        from PIL import Image

        sl = np.asarray(sl)
        self._shape = sl.shape
        self._dtype = sl.dtype
        if sl.dtype == np.uint16:
            self._scale = 256
            sl8 = (sl // 256).astype(np.uint8)
        else:
            self._scale = 1
            sl8 = sl.astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(sl8, mode="L").save(
            buf, format="JPEG", quality=self.quality
        )
        return buf.getvalue()

    def decode(self, data):
        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(data)), dtype=np.uint8)
        out = arr.astype(self._dtype) * self._scale
        return out.reshape(self._shape)


class PngSliceCodec:
    """Lossless PNG codec over 2D slices (supports uint16)."""

    def __init__(self):
        self.config = {"id": "png"}
        self._shape = None
        self._dtype = None

    def encode(self, sl):
        from PIL import Image

        sl = np.asarray(sl)
        self._shape = sl.shape
        self._dtype = sl.dtype
        mode = "I;16" if sl.dtype == np.uint16 else "L"
        buf = io.BytesIO()
        Image.fromarray(sl, mode=mode).save(buf, format="PNG")
        return buf.getvalue()

    def decode(self, data):
        from PIL import Image

        arr = np.asarray(Image.open(io.BytesIO(data)))
        return arr.astype(self._dtype).reshape(self._shape)
