"""Tiled whole-volume inference: batched forward + overlap-average stitch.

Capability parity with the reference inference engine (reference
inference.py:28-252): a volume is covered by overlapping cubic patches
(stride = ``patch_size − overlap``), each patch is denoised by the model,
``trim`` voxels are discarded from patch faces, and overlapping
predictions are weight-averaged; finally the frozen transform maps back
to uint16 counts.

TPU-native design (not a port):

* The whole loop — patch gather (``dynamic_slice``), batched model
  forward, trim masking, scatter-add stitch — is ONE jitted XLA program
  per volume shape. ``lax.scan`` walks patch batches; accumulators live
  in HBM for the entire pass, so there is no host↔device traffic per
  batch (the reference round-trips every batch through the GPU,
  reference inference.py:171-173).
* Trim is a per-patch *weight mask* built from ``broadcasted_iota``
  comparisons, which also fixes a reference defect: faces of a patch
  touching the volume boundary are NOT trimmed, so the first ``trim``
  voxels of the volume get real predictions instead of zeros (the
  reference leaves leading faces with zero weight,
  reference inference.py:87-99).
* Batches of patches keep the MXU busy; odd volume shapes are handled by
  padding the transformed volume once (constant pad, like the
  reference's ``add_padding``) and cropping the stitched result.

For volumes larger than device memory, :func:`predict` transparently
streams super-tiles with a ``patch_size``-wide halo so every interior
seam sees identical averaging context; multi-chip spatial sharding lives
in :mod:`exaspim_tpu.parallel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "predict",
    "predict_patch",
    "generate_patch_starts",
    "count_patches",
    "plan_tiling",
    "plan_stream_cores",
    "build_tiled_program",
    "build_volume_transform",
]


def generate_patch_starts(shape, patch_size, overlap):
    """(N, 3) int32 array of patch start coordinates.

    Same grid as the reference (reference inference.py:202-229):
    ``range(0, dim − patch + stride, stride)`` per axis — trailing
    patches may extend past the volume and are evaluated on padded data.
    """
    stride = patch_size - overlap
    if stride <= 0:
        raise ValueError(
            f"overlap {overlap} must be smaller than patch {patch_size}"
        )
    axes = [
        np.arange(0, max(d - patch_size + stride, 1), stride)
        for d in shape
    ]
    grid = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.ravel() for g in grid], axis=-1).astype(np.int32)


def count_patches(shape, patch_size, overlap):
    """Number of patches in the tiling grid."""
    return len(generate_patch_starts(shape, patch_size, overlap))


def plan_tiling(shape, overlap=12, candidates=(64, 96, 128),
                target_batch_voxels=32 * 64 ** 3):
    """Pick (patch_size, batch_size) minimizing total forward voxels.

    The reference hard-codes patch 64 (reference inference.py:33); on
    TPU the fully-convolutional UNet runs any 16-multiple patch, and a
    larger patch slashes the overlap redundancy ``(P/(P−overlap))³`` —
    e.g. a 256³ block tiles as 125×64³ = 32.8 M forward voxels but only
    27×96³ = 23.9 M (−27 %). Candidates keep every pooling level even
    (P divisible by 16). Batch size is chosen to hold ~``target_batch_
    voxels`` per forward (the batch-32×64³ operating point) while
    minimizing padded tail slots.
    """
    best = None
    for P in candidates:
        if any(d < P for d in shape) or P <= overlap:
            continue
        stride = P - overlap
        n = int(np.prod([
            len(range(0, max(d - P + stride, 1), stride))
            for d in shape
        ]))
        total = n * P ** 3
        if best is None or total < best[0]:
            best = (total, P, n)
    if best is None:  # volume smaller than every candidate
        P = min(shape) // 16 * 16
        if P < 16 or P <= overlap:
            raise ValueError(
                f"volume {tuple(shape)} too small for auto tiling "
                f"(needs every dim ≥ 16 and a 16-multiple patch "
                f"> overlap {overlap})"
            )
        return P, 1
    _, P, n = best
    target_b = max(1, min(n, round(target_batch_voxels / P ** 3)))
    # Prefer the largest batch ≤ target with the fewest padded tail
    # slots (e.g. 125 patches → batch 25, zero waste).
    batch = min(
        range(max(1, target_b // 2), target_b + 1),
        key=lambda b: ((-n) % b, -b),
    )
    return P, batch


def trim_weight_mask(global_start, patch, trim, global_shape):
    """Per-patch stitch weight: trimmed faces get 0, kept voxels 1.

    Faces touching the global volume boundary are not trimmed (fixes the
    reference's zero-weight leading faces, reference inference.py:87-99).
    ``global_start`` is the patch's position in the WHOLE volume — under
    spatial sharding it differs from the local slab coordinate.
    """
    P = patch
    w = jnp.ones((P, P, P), jnp.float32)
    for d in range(3):
        iota = jax.lax.broadcasted_iota(jnp.int32, (P, P, P), d)
        lo_ok = (iota >= trim) | (global_start[d] == 0)
        hi_ok = (iota < P - trim) | (
            global_start[d] + P >= global_shape[d]
        )
        w = w * (lo_ok & hi_ok).astype(jnp.float32)
    return w


def tiled_accumulate(apply_fn, params, vol, starts, global_starts,
                     global_shape, patch, batch, trim):
    """Core stitching loop: gather → forward → masked scatter-add.

    Pure/traceable; shared by the single-chip jitted program and the
    shard_map spatially-sharded path (:mod:`exaspim_tpu.parallel`).
    ``starts`` index into ``vol`` (local coords); ``global_starts`` are
    the same patches in whole-volume coords (for boundary-aware trim).
    Returns float32 ``(accum, wgt)`` shaped like ``vol``.
    """
    P = patch
    n_batches = starts.shape[0] // batch
    # Derive the zero accumulators from vol (not fresh constants) so they
    # inherit vol's varying manual axes under shard_map.
    accum = jnp.zeros_like(vol, dtype=jnp.float32) * vol[0, 0, 0]
    wgt = accum
    pairs = (
        starts.reshape(n_batches, batch, 3),
        global_starts.reshape(n_batches, batch, 3),
    )

    bidx = jnp.asarray(np.stack(
        np.meshgrid(*([np.arange(P)] * 3), indexing="ij"), axis=-1
    ))  # (P, P, P, 3)

    def body(carry, batch_pair):
        accum, wgt = carry
        batch_starts, batch_global = batch_pair
        patches = jax.vmap(
            lambda s: jax.lax.dynamic_slice(vol, s, (P, P, P))
        )(batch_starts)
        pred = apply_fn(params, patches[..., None])[..., 0]
        masks = jax.vmap(
            lambda g: trim_weight_mask(g, P, trim, global_shape)
        )(batch_global)
        pred = pred.astype(jnp.float32) * masks

        # One batched scatter-add covers the whole patch batch
        # (duplicate-padded starts add pred and weight alike, leaving
        # the final average unchanged).
        coords = batch_starts[:, None, None, None, :] + bidx[None]
        cz, cy, cx = coords[..., 0], coords[..., 1], coords[..., 2]
        accum = accum.at[cz, cy, cx].add(pred)
        wgt = wgt.at[cz, cy, cx].add(masks)
        return (accum, wgt), None

    (accum, wgt), _ = jax.lax.scan(body, (accum, wgt), pairs)
    return accum, wgt


def _parity_canvas(blocks, grid_dims, stride, patch, vol_shape):
    """Dense overlap-add of a uniform patch grid — NO scatter.

    ``blocks``: (nz·ny·nx, P, P, P) values on the uniform grid
    ``start = index * stride`` per axis. Patches at even/odd grid
    parities are mutually disjoint when ``patch ≤ 2·stride``, so the sum
    decomposes into 8 parity groups, each laid out by pure
    pad/transpose/reshape and added with a static shift — every op is a
    dense copy XLA streams at memory bandwidth (XLA scatter, the
    alternative, serializes badly on TPU).
    """
    nz, ny, nx = grid_dims
    P, s = patch, stride
    if P > 2 * s:
        raise ValueError(
            f"patch {P} > 2×stride {s}: parity decomposition needs "
            "overlap ≤ stride"
        )
    blocks = blocks.reshape(nz, ny, nx, P, P, P)
    out = jnp.zeros(vol_shape, blocks.dtype)
    for a in range(min(2, nz)):
        for b in range(min(2, ny)):
            for c in range(min(2, nx)):
                sub = blocks[a::2, b::2, c::2]
                mz, my, mx = sub.shape[:3]
                # Pad each P-block into its 2s-cell, lay out as a canvas.
                sub = jnp.pad(
                    sub,
                    [(0, 0)] * 3 + [(0, 2 * s - P)] * 3,
                )
                canvas = sub.transpose(0, 3, 1, 4, 2, 5).reshape(
                    mz * 2 * s, my * 2 * s, mx * 2 * s
                )
                # Static shift to the parity offset, crop to volume.
                off = (a * s, b * s, c * s)
                lim = [
                    min(o + e, v) for o, e, v in zip(
                        off, canvas.shape, vol_shape
                    )
                ]
                region = tuple(
                    slice(o, l) for o, l in zip(off, lim)
                )
                crop = tuple(
                    slice(0, l - o) for o, l in zip(off, lim)
                )
                out = out.at[region].add(canvas[crop])
    return out


@functools.lru_cache(maxsize=32)
def _tiled_program(apply_fn, transform, vol_shape, orig_shape, patch,
                   stride, batch, trim, grid_dims, return_float,
                   output_clip=None):
    """Build + jit the full tiled-inference program for one geometry.

    The ENTIRE datapath — forward intensity transform, pad, patch
    gather, model forward, parity-canvas stitch, inverse transform,
    uint16 quantize — is one XLA program: raw counts in, counts out,
    zero intermediate host↔device round-trips (each eager op costs a
    dispatch over the host↔TPU link).
    """
    P = patch
    n_grid = int(np.prod(grid_dims))

    def run(params, raw, starts):
        x = transform.forward(raw.astype(jnp.float32))
        if output_clip == "input":
            clip_lo, clip_hi = jnp.min(x), jnp.max(x)
        elif output_clip is not None:
            clip_lo, clip_hi = output_clip
        x = jnp.pad(
            x, [(0, p - s) for p, s in zip(vol_shape, orig_shape)]
        )
        n = starts.shape[0]
        sb = starts.reshape(n // batch, batch, 3)

        def fwd(batch_starts):
            patches = jax.vmap(
                lambda st: jax.lax.dynamic_slice(x, st, (P, P, P))
            )(batch_starts)
            pred = apply_fn(params, patches[..., None])[..., 0]
            if output_clip is not None:
                # Clamp in the transform domain: self-supervised models
                # can overshoot at rare bright voxels, and an asinh-type
                # inverse amplifies a +0.3 overshoot into a 65535 clamp
                # (sinh explosion). Denoising never needs to exceed the
                # observed input range.
                pred = jnp.clip(pred, clip_lo, clip_hi)
            masks = jax.vmap(
                lambda g: trim_weight_mask(g, P, trim, orig_shape)
            )(batch_starts)
            return pred.astype(jnp.float32) * masks, masks

        preds, masks = jax.lax.map(fwd, sb)
        # Duplicate-padded tail entries (batch alignment) drop here; the
        # canvas wants exactly the uniform grid.
        preds = preds.reshape(n, P, P, P)[:n_grid]
        masks = masks.reshape(n, P, P, P)[:n_grid]
        accum = _parity_canvas(preds, grid_dims, stride, P, vol_shape)
        wgt = _parity_canvas(masks, grid_dims, stride, P, vol_shape)
        out = accum / (wgt + 1e-8)
        out = jax.lax.slice(out, (0, 0, 0), orig_shape)
        if return_float:
            return transform.inverse_float(out)
        return transform.inverse(out)

    return jax.jit(run)


def commit_params(params):
    """Move checkpoint params (host numpy leaves) onto the device once.

    msgpack checkpoints load as numpy; feeding those to a jitted program
    re-uploads every leaf on EVERY call — ~100 small transfers times the
    host link's per-transfer latency dominated the tiled program's wall
    time (measured on the tunnel: 1.65 s wall vs 0.45 s device compute
    per 256³ block, scripts/tiled_profile.py). Already-committed
    ``jax.Array`` leaves (including mesh-sharded params) pass through
    untouched, so calling this repeatedly is free.
    """
    return jax.tree_util.tree_map(
        lambda a: a if isinstance(a, jax.Array) else jax.device_put(a),
        params,
    )


@functools.cache
def _model_apply(model):
    """One stable apply closure per model instance (keeps jit caches warm)."""

    def apply_fn(p, x):
        return model.apply({"params": p}, x)

    return apply_fn


def predict(img, model, params, transform, patch_size=64, overlap=12,
            trim=5, batch_size=32, max_device_voxels=640**3,
            return_float=False, output_clip=None):
    """Denoise a whole volume; returns uint16 counts.

    ``img`` is a 3D (or squeezable 5D) uint16/float volume in raw counts.
    Defaults match the reference production config (patch 64, overlap 12,
    trim 5, batch 32 — reference inference.py:28-36);
    ``patch_size="auto"`` lets :func:`plan_tiling` choose the
    (patch, batch) pair minimizing total forward voxels for this volume.
    """
    img = np.asarray(img)
    if img.ndim == 5:
        img = img[0, 0]
    if img.ndim != 3:
        raise ValueError(f"expected 3D volume, got {img.shape}")
    if patch_size == "auto":
        patch_size, batch_size = plan_tiling(img.shape, overlap)
    if any(d < patch_size for d in img.shape):
        raise ValueError(
            f"volume {img.shape} smaller than patch {patch_size}; "
            "use predict_patch or a smaller patch_size"
        )
    if overlap < 2 * trim:
        # Trimmed patches must still tile the stride or interior voxels
        # get zero stitch weight (the reference silently produces such
        # holes; here it is an error).
        raise ValueError(
            f"overlap {overlap} must be >= 2*trim ({2 * trim}) for "
            "gap-free stitching"
        )

    if int(np.prod(img.shape)) > max_device_voxels:
        return _predict_streaming(
            img, model, params, transform, patch_size, overlap, trim,
            batch_size, max_device_voxels, return_float, output_clip,
        )

    params = commit_params(params)
    program, starts = build_tiled_program(
        model, transform, img.shape, patch_size, overlap, trim,
        batch_size, return_float=return_float, output_clip=output_clip,
    )
    return np.asarray(program(params, jnp.asarray(img), jnp.asarray(starts)))


def build_tiled_program(model, transform, shape, patch_size=64,
                        overlap=12, trim=5, batch_size=32,
                        return_float=False, output_clip=None):
    """The one-XLA-program tiled engine for a block of ``shape``.

    Returns ``(program, starts)`` where ``program(params, img, starts)``
    denoises one device-resident block and ``starts`` is the
    tail-padded (n, 3) patch-origin array. :func:`predict` and the
    benchmark/A-B harnesses all build their program here, so they
    measure exactly the production computation.
    """
    shape = tuple(shape)
    starts = generate_patch_starts(shape, patch_size, overlap)
    stride = patch_size - overlap
    grid_dims = tuple(
        len(range(0, max(d - patch_size + stride, 1), stride))
        for d in shape
    )
    # Pad volume so every patch is fully in-bounds (constant pad in the
    # transform domain, like reference add_padding).
    padded_shape = tuple(
        max(int(starts[:, d].max()) + patch_size, shape[d])
        for d in range(3)
    )
    n_pad = (-len(starts)) % batch_size
    if n_pad:
        starts = np.concatenate([starts, np.repeat(
            starts[-1:], n_pad, axis=0
        )])
    program = _tiled_program(
        _model_apply(model), transform, padded_shape, shape, patch_size,
        stride, batch_size, trim, grid_dims, bool(return_float),
        output_clip if output_clip is None else (
            "input" if output_clip == "input" else tuple(output_clip)
        ),
    )
    return program, starts


def plan_stream_cores(shape, patch_size, overlap, max_device_voxels):
    """Per-axis core sizes (cz, cy, cx) for halo'd super-tile streaming.

    Full-axis cores are preferred (fewer halos); when the halo'd block
    would exceed ``max_device_voxels`` the z axis is split first (slab
    streaming, matching sequential Zarr chunk order), then y, then x —
    so volumes whose single y/x plane is larger than the budget still
    stream (the reference instead requires the whole crop in RAM,
    reference inference.py:79-81). Core sizes shrink in ``stride``
    decrements so tile grids stay aligned with the global patch grid.
    """
    halo = patch_size
    stride = patch_size - overlap

    def ext(core, dim):
        # Worst-case halo'd block extent: halo both sides plus up to
        # stride-1 voxels of low-edge grid alignment.
        return dim if core >= dim else min(dim, core + 2 * halo + stride)

    cores = list(shape)
    for ax in range(3):
        while (
            ext(cores[0], shape[0])
            * ext(cores[1], shape[1])
            * ext(cores[2], shape[2]) > max_device_voxels
            and cores[ax] > patch_size
        ):
            cores[ax] = max(patch_size, cores[ax] - stride)
    return tuple(cores)


def _predict_streaming(img, model, params, transform, patch_size, overlap,
                       trim, batch_size, max_device_voxels, return_float,
                       output_clip=None):
    """Stream super-tiles with a patch-wide halo for huge volumes.

    Tiles all three axes (:func:`plan_stream_cores`): each super-tile is
    denoised independently with a ``>= patch_size`` halo on interior
    faces, and every tile's low edge is aligned to the global stride
    grid per axis, so the tile-local patch grid coincides with the
    single-pass grid wherever it can touch the core — every core voxel
    sees exactly the overlap-average context of a single-pass run
    (bit-identity pinned by tests/test_inference.py).
    """
    halo = patch_size
    stride = patch_size - overlap
    zyx = img.shape
    cores = plan_stream_cores(zyx, patch_size, overlap, max_device_voxels)
    out = np.empty(zyx, dtype=np.float32 if return_float else np.uint16)
    for z0 in range(0, zyx[0], cores[0]):
        for y0 in range(0, zyx[1], cores[1]):
            for x0 in range(0, zyx[2], cores[2]):
                core_sl, res_sl, blk_sl = [], [], []
                for d0, core, dim in zip((z0, y0, x0), cores, zyx):
                    d1 = min(d0 + core, dim)
                    lo = max(d0 - halo, 0)
                    lo -= lo % stride  # align with the global grid
                    hi = min(d1 + halo, dim)
                    core_sl.append(slice(d0, d1))
                    res_sl.append(slice(d0 - lo, d0 - lo + (d1 - d0)))
                    blk_sl.append(slice(lo, hi))
                block = img[tuple(blk_sl)]
                res = predict(
                    block, model, params, transform, patch_size, overlap,
                    trim, batch_size, max_device_voxels=2**63,
                    return_float=return_float, output_clip=output_clip,
                )
                out[tuple(core_sl)] = res[tuple(res_sl)]
    return out


def predict_patch(patch, model, params, transform):
    """Denoise a single patch (reference inference.py:119-150)."""
    patch = np.asarray(patch)
    x = transform.forward(patch.astype(np.float32))
    x = jnp.asarray(x)[None, ..., None]
    pred = _model_apply(model)(commit_params(params), x)[0, ..., 0]
    return transform.inverse(np.asarray(pred, dtype=np.float32))


def build_volume_transform(transform, img=None, offset=None,
                           percentile=1.0):
    """Per-volume transform with a background pedestal folded in.

    Prefers a precomputed ``offset`` (the production path); falls back to
    estimating from the volume's low percentile — debug only, estimates
    from a crop are biased (reference inference.py:302-339).
    """
    from exaspim_tpu.transforms import estimate_offset, with_offset

    if offset is None:
        if img is None:
            raise ValueError("need either a precomputed offset or an img")
        offset = estimate_offset(np.asarray(img), percentile=percentile)
    return with_offset(transform, float(offset))
