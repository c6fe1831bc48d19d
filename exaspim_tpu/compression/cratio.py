"""Chunked compression-ratio metrics (the product metric).

``compute_cratio`` reproduces the reference's Zarr-style chunked ratio
(reference img_util.py:401-441): encode each 64³ chunk independently,
ratio = total uncompressed bytes / total compressed bytes, rounded to 2
decimals. When the native C++ runtime is built it walks the chunk grid
without the Python loop (:mod:`exaspim_tpu.compression.native`).

``compute_cratio_2d`` / ``compress_and_decompress_2d`` generalize the
reference's slice-codec paths (JPEG-XL / JPEG, img_util.py:444-513) to any
2D codec with ``encode``/``decode``.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from itertools import product

import numpy as np


def _as_3d_uint16(img):
    img = np.asarray(img)
    if img.ndim == 5:
        img = img[0, 0]
    return np.ascontiguousarray(img, dtype=np.uint16)


def _chunk_starts(shape, chunk_shape):
    return product(*[range(0, s, c) for s, c in zip(shape, chunk_shape)])


def compute_cratio(img, codec, patch_shape=(64, 64, 64), use_native=True):
    """Zarr-style chunked compression ratio of a (uint16) volume.

    Matches the reference metric bit-for-bit when ``codec`` is a
    :class:`~exaspim_tpu.compression.blosc.BloscCodec` (same C library).
    """
    img = _as_3d_uint16(img)

    if use_native:
        from exaspim_tpu.compression import native

        cfg = getattr(codec, "config", None)
        if cfg is not None and cfg.get("id") == "blosc" and native.available():
            ratio = native.chunked_cratio(
                img, patch_shape, cname=cfg["cname"], clevel=cfg["clevel"],
                shuffle=cfg["shuffle"],
            )
            return round(ratio, 2)

    total_c = 0
    total_u = 0
    for start in _chunk_starts(img.shape, patch_shape):
        sl = tuple(
            slice(s, s + c) for s, c in zip(start, patch_shape)
        )
        chunk = np.ascontiguousarray(img[sl])
        total_c += len(codec.encode(chunk))
        total_u += chunk.nbytes
    return round(total_u / total_c, 2)


def compute_cratio_2d(img, codec, patch_shape=(128, 128, 64), max_workers=8):
    """Chunked ratio under a 2D slice codec (JPEG-family experiments)."""
    img = np.ascontiguousarray(img)

    def one(start):
        sl = tuple(
            slice(i, min(i + c, s))
            for i, c, s in zip(start, patch_shape, img.shape)
        )
        patch = img[sl]
        compressed = sum(
            len(codec.encode(np.ascontiguousarray(patch[..., k])))
            for k in range(patch.shape[-1])
        )
        return patch.nbytes, compressed

    total_u = 0
    total_c = 0
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for u, c in pool.map(one, _chunk_starts(img.shape, patch_shape)):
            total_u += u
            total_c += c
    return round(total_u / total_c, 2)


def compress_and_decompress_2d(img, codec, patch_shape=(32, 256, 256),
                               max_workers=8):
    """Round-trips a volume through a 2D slice codec; returns (volume, ratio).

    Used to measure what a lossy 2D codec does to the data
    (reference img_util.py:474-513).
    """
    img = np.ascontiguousarray(img)

    def one(start):
        sl = tuple(
            slice(i, min(i + c, s))
            for i, c, s in zip(start, patch_shape, img.shape)
        )
        patch = img[sl]
        compressed = 0
        slices = []
        for k in range(patch.shape[-1]):
            enc = codec.encode(np.ascontiguousarray(patch[..., k]))
            compressed += len(enc)
            slices.append(codec.decode(enc))
        return sl, patch.nbytes, compressed, np.stack(slices, axis=-1)

    out = np.empty_like(img)
    total_u = 0
    total_c = 0
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for sl, u, c, patch in pool.map(
            one, _chunk_starts(img.shape, patch_shape)
        ):
            out[sl] = patch
            total_u += u
            total_c += c
    return out, round(total_u / total_c, 2)


def compute_cratio_jpegxl(img, patch_shape=(128, 128, 64), distance=1.0,
                          effort=3, lossless=False, max_workers=8):
    """Chunked JPEG-XL compression ratio over 2D slices.

    Direct counterpart of reference img_util.py:444-472
    (``compute_cratio_jpegxl``): volumes are walked in
    ``patch_shape`` chunks and each chunk's 2D slices are JPEG-XL
    encoded (uint16-faithful, via the libjxl binding).
    """
    from exaspim_tpu.compression.jxl import JxlSliceCodec

    codec = JxlSliceCodec(
        distance=distance, effort=effort, lossless=lossless
    )
    return compute_cratio_2d(
        img, codec, patch_shape=patch_shape, max_workers=max_workers
    )
