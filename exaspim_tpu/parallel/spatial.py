"""Spatially-sharded whole-volume inference with ICI halo exchange.

The volumetric analogue of sequence parallelism (SURVEY §2.2, §5): the
volume's z-axis is sharded across the mesh, each chip denoises its slab,
and the ``patch``-wide boundary context needed for seamless stitching
moves over ICI with ``jax.lax.ppermute`` instead of being recomputed.

Exactness: every patch of the *global* tiling grid is evaluated by each
chip whose core slab it intersects, using a halo wide enough to hold the
full patch context. Each output voxel therefore accumulates exactly the
same (prediction, weight) contributions as the single-chip pass —
weighted overlap-average is reproduced, not approximated. Boundary-chip
halos are zero-filled by ``ppermute`` semantics, matching the
constant-padding the single-chip path applies at volume edges.

Duplicate padded starts (to equalize per-chip patch counts, an SPMD
requirement) multiply pred and weight alike, leaving the average
unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from exaspim_tpu.inference import (
    _model_apply,
    generate_patch_starts,
    tiled_accumulate,
)

__all__ = ["predict_sharded", "plan_shards"]


def plan_shards(z_dim, n_shards, patch_size, overlap, global_shape):
    """Host-side plan: per-chip local/global patch starts, padded equal.

    Returns ``(local_starts, global_starts, n_per_shard)`` where both
    start arrays have shape (n_shards, n_max, 3); local z-coords are
    relative to each chip's haloed slab ``[core_lo − halo, core_hi + halo)``.
    """
    halo = patch_size
    if z_dim % n_shards:
        raise ValueError(f"z={z_dim} not divisible by {n_shards} shards")
    core = z_dim // n_shards
    if core < patch_size:
        raise ValueError(
            f"per-chip slab {core} smaller than patch {patch_size}"
        )
    starts = generate_patch_starts(global_shape, patch_size, overlap)
    locs, globs = [], []
    for s in range(n_shards):
        lo, hi = s * core, (s + 1) * core
        sel = (starts[:, 0] + patch_size > lo) & (starts[:, 0] < hi)
        g = starts[sel]
        l = g.copy()
        l[:, 0] = g[:, 0] - (lo - halo)
        locs.append(l)
        globs.append(g)
    n_max = max(len(g) for g in globs)
    out_l = np.zeros((n_shards, n_max, 3), np.int32)
    out_g = np.zeros((n_shards, n_max, 3), np.int32)
    for s in range(n_shards):
        n = len(globs[s])
        out_l[s, :n], out_g[s, :n] = locs[s], globs[s]
        if n < n_max:  # duplicate-pad: weight and pred scale together
            out_l[s, n:] = locs[s][-1]
            out_g[s, n:] = globs[s][-1]
    return out_l, out_g, n_max


def predict_sharded(img, model, params, transform, mesh, patch_size=64,
                    overlap=12, trim=5, batch_size=8, return_float=False):
    """Denoise a volume sharded along z across ``mesh``'s one axis.

    ``img``: 3D raw-count volume whose z-dim is divisible by the mesh
    size (pad upstream if needed). Returns uint16 counts like
    :func:`exaspim_tpu.inference.predict`.
    """
    img = np.asarray(img)
    if img.ndim != 3:
        raise ValueError(f"expected 3D volume, got {img.shape}")
    if overlap < 2 * trim:
        # Same gap-free stitching contract as inference.predict: trimmed
        # patches must still tile the stride or interior voxels get zero
        # stitch weight.
        raise ValueError(
            f"overlap {overlap} must be >= 2*trim ({2 * trim}) for "
            "gap-free stitching"
        )
    (axis_name,) = mesh.axis_names
    n = mesh.devices.size
    Z, Y, X = img.shape
    halo = patch_size

    local_starts, global_starts, n_max = plan_shards(
        Z, n, patch_size, overlap, img.shape
    )
    n_pad = (-n_max) % batch_size
    if n_pad:
        local_starts = np.concatenate(
            [local_starts, local_starts[:, -1:].repeat(n_pad, 1)], axis=1
        )
        global_starts = np.concatenate(
            [global_starts, global_starts[:, -1:].repeat(n_pad, 1)], axis=1
        )

    # Patches may overhang the volume in y/x (trailing grid) — pad once.
    pad_y = max(int(global_starts[..., 1].max()) + patch_size - Y, 0)
    pad_x = max(int(global_starts[..., 2].max()) + patch_size - X, 0)
    x_t = transform.forward(img.astype(np.float32))
    x_t = np.pad(x_t, [(0, 0), (0, pad_y), (0, pad_x)])

    apply_fn = _model_apply(model)
    program = _sharded_program(
        apply_fn, mesh, axis_name, x_t.shape, img.shape, patch_size,
        batch_size, trim, local_starts.shape[1], halo,
    )
    vol_sh = NamedSharding(mesh, P(axis_name, None, None))
    st_sh = NamedSharding(mesh, P(axis_name, None, None))
    out = program(
        params,
        jax.device_put(jnp.asarray(x_t), vol_sh),
        jax.device_put(jnp.asarray(local_starts), st_sh),
        jax.device_put(jnp.asarray(global_starts), st_sh),
    )
    out = np.asarray(out)[:, :Y, :X]
    if return_float:
        return transform.inverse_float(out)
    return transform.inverse(out)


@functools.lru_cache(maxsize=16)
def _sharded_program(apply_fn, mesh, axis_name, padded_shape, orig_shape,
                     patch, batch, trim, n_starts, halo):
    n_dev = mesh.devices.size

    def local_fn(params, slab, lstarts, gstarts):
        # slab: (core_z, Y, X) — this chip's z-slab (leading shard dim
        # stripped by shard_map). Exchange halos with both neighbors.
        slab = slab[0]
        lstarts, gstarts = lstarts[0], gstarts[0]
        up = [(i, i + 1) for i in range(n_dev - 1)]     # send down
        down = [(i + 1, i) for i in range(n_dev - 1)]   # send up
        from_above = jax.lax.ppermute(
            slab[-halo:], axis_name, up
        )
        from_below = jax.lax.ppermute(
            slab[:halo], axis_name, down
        )
        ext = jnp.concatenate([from_above, slab, from_below], axis=0)
        accum, wgt = tiled_accumulate(
            apply_fn, params, ext, lstarts, gstarts, orig_shape, patch,
            batch, trim,
        )
        core = slice(halo, halo + slab.shape[0])
        out = accum[core] / (wgt[core] + 1e-8)
        return out[None]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(),
            P(axis_name, None, None),
            P(axis_name, None, None),
            P(axis_name, None, None),
        ),
        out_specs=P(axis_name, None, None),
    )

    def run(params, vol, lstarts, gstarts):
        z, y, x = vol.shape
        vol = vol.reshape(n_dev, z // n_dev, y, x)
        out = fn(params, vol, lstarts, gstarts)
        return out.reshape(z, y, x)

    return jax.jit(run)
