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

P_spec = P  # un-shadowed alias (P doubles as "patch" in kernel-local code)

from exaspim_tpu.inference import (
    _model_apply,
    _parity_canvas,
    generate_patch_starts,
    tiled_accumulate,
    trim_weight_mask,
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
    if patch_size == "auto":
        # Plan on the per-chip slab geometry: every shard's core must
        # hold at least one patch (plan_shards validates core >= patch).
        from exaspim_tpu.inference import plan_tiling

        patch_size, batch_size = plan_tiling(
            (max(img.shape[0] // mesh.devices.size, 1),) + img.shape[1:],
            overlap,
        )
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

    stride = patch_size - overlap
    apply_fn = _model_apply(model)
    vol_sh = NamedSharding(mesh, P(axis_name, None, None))
    st_sh = NamedSharding(mesh, P(axis_name, None, None))
    # Commit host (numpy) checkpoint leaves replicated over the mesh
    # once — otherwise every program call re-uploads ~100 small leaves
    # (see inference.commit_params).
    rep_sh = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda a: a if isinstance(a, jax.Array)
        else jax.device_put(a, rep_sh),
        params,
    )

    if patch_size <= 2 * stride:
        # Dense parity-canvas stitch (no scatter in the HLO) — the same
        # trick as the single-chip path (inference._parity_canvas),
        # shifted per shard by a dynamic canvas offset.
        (base, offsets, extra_z, canvas_shape, grid_dims,
         pad_y, pad_x) = _plan_grid(
            Z, n, patch_size, overlap, img.shape
        )
        x_t = transform.forward(img.astype(np.float32))
        x_t = np.pad(x_t, [(0, 0), (0, pad_y), (0, pad_x)])
        n_grid = len(base)
        n_pad = (-n_grid) % batch_size
        if n_pad:
            base = np.concatenate(
                [base, np.repeat(base[-1:], n_pad, axis=0)]
            )
        program = _sharded_program_canvas(
            apply_fn, mesh, axis_name, img.shape, patch_size, stride,
            batch_size, trim, halo, int(extra_z), canvas_shape,
            grid_dims, tuple(base.shape),
        )
        off_sh = NamedSharding(mesh, P(axis_name, None))
        out = program(
            params,
            jax.device_put(jnp.asarray(x_t), vol_sh),
            jnp.asarray(base),
            jax.device_put(jnp.asarray(offsets), off_sh),
        )
    else:
        local_starts, global_starts, n_max = plan_shards(
            Z, n, patch_size, overlap, img.shape
        )
        n_pad = (-n_max) % batch_size
        if n_pad:
            local_starts = np.concatenate(
                [local_starts, local_starts[:, -1:].repeat(n_pad, 1)],
                axis=1,
            )
            global_starts = np.concatenate(
                [global_starts, global_starts[:, -1:].repeat(n_pad, 1)],
                axis=1,
            )

        # Patches may overhang the volume in y/x (trailing grid) — pad once.
        pad_y = max(int(global_starts[..., 1].max()) + patch_size - Y, 0)
        pad_x = max(int(global_starts[..., 2].max()) + patch_size - X, 0)
        x_t = transform.forward(img.astype(np.float32))
        x_t = np.pad(x_t, [(0, 0), (0, pad_y), (0, pad_x)])

        program = _sharded_program(
            apply_fn, mesh, axis_name, x_t.shape, img.shape, patch_size,
            batch_size, trim, local_starts.shape[1], halo,
        )
        out = program(
            params,
            jax.device_put(jnp.asarray(x_t), vol_sh),
            jax.device_put(jnp.asarray(local_starts), st_sh),
            jax.device_put(jnp.asarray(global_starts), st_sh),
        )
    if jax.process_count() > 1:
        # Multi-controller run: the z-sharded output spans processes and
        # is not addressable from any single one — gather the tiles so
        # every process returns the full volume (ICI/DCN all-gather).
        from jax.experimental import multihost_utils

        out = multihost_utils.process_allgather(out, tiled=True)
    out = np.asarray(out)[:, :Y, :X]
    if return_float:
        return transform.inverse_float(out)
    return transform.inverse(out)


def _plan_grid(Z, n_shards, patch_size, overlap, global_shape):
    """Host-side plan for the parity-canvas sharded stitch.

    Every shard evaluates the same NUMBER of patches on the same
    stride-uniform local grid (an SPMD requirement); only three
    per-shard scalars vary, shipped as data:

    ``loc0``  z of the first patch in haloed-slab coordinates,
    ``gz0``   global z of the canvas origin (for boundary-aware trim),
    ``ccs``   canvas z where this shard's core slab starts.

    Shards whose real patch range is shorter than the widest shard
    extend it with *virtual* grid rows past their core; those land
    strictly outside the core slice (first virtual row starts at
    global z ≥ core_hi), so their garbage predictions and weights are
    cropped away. ``extra_z`` zero-padding keeps their reads in bounds.
    """
    P, stride, halo = patch_size, patch_size - overlap, patch_size
    if Z % n_shards:
        raise ValueError(f"z={Z} not divisible by {n_shards} shards")
    core = Z // n_shards
    if core < P:
        raise ValueError(f"per-chip slab {core} smaller than patch {P}")
    y_grid = np.arange(0, max(global_shape[1] - P + stride, 1), stride)
    x_grid = np.arange(0, max(global_shape[2] - P + stride, 1), stride)

    k0s, k1s = [], []
    for s in range(n_shards):
        lo, hi = s * core, (s + 1) * core
        k0s.append(max(0, -((lo - P + 1) // -stride)))  # min k: k*stride > lo-P
        k1s.append((hi - 1) // stride)                  # max k: k*stride < hi
    nz_max = max(k1 - k0 + 1 for k0, k1 in zip(k0s, k1s))

    offsets = np.zeros((n_shards, 3), np.int32)
    max_read = 0
    for s, k0 in enumerate(k0s):
        lo = s * core
        loc0 = k0 * stride - lo + halo
        offsets[s] = (loc0, k0 * stride, lo - k0 * stride)
        max_read = max(max_read, loc0 + (nz_max - 1) * stride + P)
    extra_z = max(0, max_read - (core + 2 * halo))

    base = np.stack(
        np.meshgrid(
            np.arange(nz_max) * stride, y_grid, x_grid, indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3).astype(np.int32)
    canvas_shape = (
        (nz_max - 1) * stride + P,
        int(y_grid[-1]) + P,
        int(x_grid[-1]) + P,
    )
    pad_y = canvas_shape[1] - global_shape[1]
    pad_x = canvas_shape[2] - global_shape[2]
    grid_dims = (nz_max, len(y_grid), len(x_grid))
    return base, offsets, extra_z, canvas_shape, grid_dims, pad_y, pad_x


@functools.lru_cache(maxsize=16)
def _sharded_program_canvas(apply_fn, mesh, axis_name, orig_shape, patch,
                            stride, batch, trim, halo, extra_z,
                            canvas_shape, grid_dims, base_shape):
    n_dev = mesh.devices.size
    P = patch
    n_grid = int(np.prod(grid_dims))

    def local_fn(params, slab, base, offs):
        slab, offs = slab[0], offs[0]
        core = slab.shape[0]
        up = [(i, i + 1) for i in range(n_dev - 1)]     # send down
        down = [(i + 1, i) for i in range(n_dev - 1)]   # send up
        from_above = jax.lax.ppermute(slab[-halo:], axis_name, up)
        from_below = jax.lax.ppermute(slab[:halo], axis_name, down)
        ext = jnp.concatenate([from_above, slab, from_below], axis=0)
        if extra_z:
            ext = jnp.pad(ext, [(0, extra_z), (0, 0), (0, 0)])

        zoff = jnp.stack([offs[0], 0, 0]).astype(jnp.int32)
        goff = jnp.stack([offs[1], 0, 0]).astype(jnp.int32)
        sb = base.reshape(base.shape[0] // batch, batch, 3)

        def fwd(batch_base):
            patches = jax.vmap(
                lambda st: jax.lax.dynamic_slice(ext, st + zoff, (P, P, P))
            )(batch_base)
            pred = apply_fn(params, patches[..., None])[..., 0]
            masks = jax.vmap(
                lambda g: trim_weight_mask(g + goff, P, trim, orig_shape)
            )(batch_base)
            return pred.astype(jnp.float32) * masks, masks

        preds, masks = jax.lax.map(fwd, sb)
        preds = preds.reshape(-1, P, P, P)[:n_grid]
        masks = masks.reshape(-1, P, P, P)[:n_grid]
        accum = _parity_canvas(preds, grid_dims, stride, P, canvas_shape)
        wgt = _parity_canvas(masks, grid_dims, stride, P, canvas_shape)
        ccs = (offs[2], jnp.int32(0), jnp.int32(0))
        core_shape = (core, canvas_shape[1], canvas_shape[2])
        acc_c = jax.lax.dynamic_slice(accum, ccs, core_shape)
        wgt_c = jax.lax.dynamic_slice(wgt, ccs, core_shape)
        return (acc_c / (wgt_c + 1e-8))[None]

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P_spec(),
            P_spec(axis_name, None, None),
            P_spec(),
            P_spec(axis_name, None),
        ),
        out_specs=P_spec(axis_name, None, None),
    )

    def run(params, vol, base, offs):
        z, y, x = vol.shape
        vol = vol.reshape(n_dev, z // n_dev, y, x)
        out = fn(params, vol, base, offs)
        return out.reshape(z, y, x)

    return jax.jit(run)


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
