"""Whole-volume streaming denoise pipeline.

The production driver the reference lacks: the reference's eval script
denoises one in-memory crop (reference scripts/evaluate_bm4dnet.py);
whole-brain volumes are far larger than host or device memory. This
module streams a (possibly remote) chunked volume through the TPU in
halo'd super-tiles (full-plane z-slabs by default; y/x tiled too when
``max_block_voxels`` bounds the device block):

    reader thread (tensorstore, async chunk fetch)
        → bounded prefetch queue (double buffering)
        → fused tiled-inference program on device
        → writer thread (Zarr v3 output, async)

Each slab carries a ``patch_size`` halo on interior faces so every
output voxel sees the full overlap-average context — seams are exact
(same argument as :func:`exaspim_tpu.inference._predict_streaming`).
The prefetch/write threads overlap host IO with device compute, the
TPU-native analogue of the reference's producer-thread DataLoader
(reference data_handling.py:1236-1384) applied to inference.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from exaspim_tpu.inference import predict
from exaspim_tpu.utils import img_io

__all__ = ["denoise_volume"]


def _tile_plan(shape, cores, halo, stride):
    """3-axis super-tile plan: per tile, (d0, d1, lo, hi) per axis.

    ``(d0, d1)`` is the core (written) range, ``(lo, hi)`` the halo'd
    fetch range with the low edge aligned to the global stride grid.
    """
    plan = []
    for z0 in range(0, shape[0], cores[0]):
        for y0 in range(0, shape[1], cores[1]):
            for x0 in range(0, shape[2], cores[2]):
                tile = []
                for d0, core, dim in zip((z0, y0, x0), cores, shape):
                    d1 = min(d0 + core, dim)
                    lo = max(d0 - halo, 0)
                    lo -= lo % stride  # align with the global grid
                    hi = min(d1 + halo, dim)
                    tile.append((d0, d1, lo, hi))
                plan.append(tuple(tile))
    return plan


def denoise_volume(img, model, params, transform, output_path=None,
                   slab_z=256, patch_size=64, overlap=12, trim=5,
                   batch_size=32, clevel=5, chunks=(1, 1, 64, 64, 64),
                   prefetch=2, progress=False, mesh=None,
                   max_block_voxels=None):
    """Denoise an arbitrarily large volume super-tile by super-tile.

    ``img``: path / URL of a chunked volume (opened lazily) or an
    ndarray. With ``output_path`` the result streams into a Zarr v3
    array and the path is returned; otherwise the assembled uint16
    volume is returned (must fit host memory).

    Tiling: full-plane z-slabs of height ``slab_z`` by default
    (sequential chunk order for typical Zarr layouts). When
    ``max_block_voxels`` is set, y/x are super-tiled too
    (:func:`exaspim_tpu.inference.plan_stream_cores`), so volumes whose
    single plane × slab height exceeds device memory still stream —
    the reference has no recourse past host RAM
    (reference inference.py:79-81). Seams are exact either way (same
    stride-aligned halo argument as ``inference._predict_streaming``).

    With ``mesh`` (a 1-axis :class:`jax.sharding.Mesh`), each block runs
    through the spatially-sharded engine — z-sharded across chips with
    ICI halo exchange (:func:`exaspim_tpu.parallel.predict_sharded`).
    """
    src = img_io.read(img) if isinstance(img, (str,)) else img
    shape = tuple(src.shape[-3:])
    Z, Y, X = shape
    if patch_size == "auto":
        # Plan on the slab geometry (z capped at the slab height); the
        # same patch is used for every slab so the global stride grid —
        # and therefore seam exactness — is preserved.
        from exaspim_tpu.inference import plan_tiling

        patch_size, batch_size = plan_tiling(
            (min(Z, int(slab_z)), Y, X), overlap
        )
    halo = patch_size
    slab_z = max(int(slab_z), patch_size)
    if max_block_voxels is not None:
        from exaspim_tpu.inference import plan_stream_cores

        cores = plan_stream_cores(
            shape, patch_size, overlap, int(max_block_voxels)
        )
        cores = (min(cores[0], slab_z), cores[1], cores[2])
    else:
        cores = (slab_z, Y, X)
    plan = _tile_plan(shape, cores, halo, patch_size - overlap)
    if mesh is None:
        # One device commit for the whole run instead of per slab
        # (see inference.commit_params); the sharded engine does its
        # own mesh-replicated placement.
        from exaspim_tpu.inference import commit_params

        params = commit_params(params)

    out_arr = None
    out_store = None
    if output_path is None:
        out_arr = np.empty(shape, np.uint16)
    else:
        import tensorstore as ts

        from exaspim_tpu.utils.img_io import _kvstore, _zarr3_codecs

        spec = {
            "driver": "zarr3",
            "kvstore": _kvstore(output_path),
            "metadata": {
                "shape": [1, 1, *shape],
                "chunk_grid": {
                    "name": "regular",
                    "configuration": {"chunk_shape": list(chunks)},
                },
                "data_type": "uint16",
                "codecs": _zarr3_codecs("zstd", clevel, "shuffle", 2),
            },
            "create": True,
            "delete_existing": True,
        }
        out_store = ts.open(spec).result()

    def fetch(tile):
        sl = tuple(slice(lo, hi) for _, _, lo, hi in tile)
        ndim = len(src.shape) if hasattr(src, "read") else src.ndim
        idx = (Ellipsis,) + sl if ndim == 5 else sl
        if hasattr(src, "read"):
            block = np.asarray(src[idx].read().result())
        else:
            block = np.asarray(src[idx])
        if block.ndim == 5:
            block = block[0, 0]
        return block.astype(np.uint16)

    # Reader thread: keeps `prefetch` super-tiles in flight.
    q = queue.Queue(maxsize=max(1, prefetch))
    _STOP = object()

    def reader():
        try:
            for tile in plan:
                q.put((tile, fetch(tile)))
            q.put(_STOP)
        except BaseException as exc:
            q.put(exc)

    threading.Thread(target=reader, daemon=True).start()

    pending_writes = []
    done = 0
    while True:
        item = q.get()
        if item is _STOP:
            break
        if isinstance(item, BaseException):
            raise item
        tile, block = item
        (z0, z1, lo, _), (y0, y1, loy, _), (x0, x1, lox, _) = tile
        if mesh is not None:
            from exaspim_tpu.parallel import predict_sharded

            n = mesh.devices.size
            zb = block.shape[0]
            # predict_sharded needs each chip's z-shard to hold at least
            # one full patch; pad trailing/undersized slabs up to the
            # larger of n*patch_size and the next multiple of n.
            target = max(n * patch_size, zb + ((-zb) % n))
            pad = target - zb
            if pad:
                block = np.pad(
                    block, [(0, pad), (0, 0), (0, 0)], mode="edge"
                )
            res = predict_sharded(
                block, model, params, transform, mesh,
                patch_size=patch_size, overlap=overlap, trim=trim,
                batch_size=batch_size,
            )[:zb]
        else:
            res = predict(
                block, model, params, transform, patch_size=patch_size,
                overlap=overlap, trim=trim, batch_size=batch_size,
            )
        core = res[
            z0 - lo:z0 - lo + (z1 - z0),
            y0 - loy:y0 - loy + (y1 - y0),
            x0 - lox:x0 - lox + (x1 - x0),
        ]
        if out_arr is not None:
            out_arr[z0:z1, y0:y1, x0:x1] = core
        else:
            pending_writes.append(
                out_store[0, 0, z0:z1, y0:y1, x0:x1].write(core)
            )
        done += 1
        if progress:
            print(f"denoise_volume: tile {done}/{len(plan)}", flush=True)

    for w in pending_writes:
        w.result()
    return out_arr if out_arr is not None else output_path
