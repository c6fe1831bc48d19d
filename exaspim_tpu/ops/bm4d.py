"""BM4D volumetric denoiser — TPU-native JAX implementation.

Replaces the reference's vendored C++ ``bm4d`` binary (Tampere BM4D,
reference data_handling.py:332, evaluate.py:202 — the single biggest CPU
cost in the pipeline, reference scripts/precompute.py:3-10) with a
pure-JAX/XLA implementation designed for the MXU:

* **Static shapes everywhere**: fixed block size, fixed group size K,
  fixed search window — block matching is a dense distance computation
  over all window offsets followed by ``lax.top_k``; no data-dependent
  control flow.
* **Factored 4D transform**: the separable 4D DCT (3D over block
  axes ⊗ 1D across the group axis) factors into a DCT-emitting
  patch-extraction conv (each table row is already its block's 3D
  DCT, computed once per row instead of once per gathered group
  member) plus a tiny (K, K) contraction along the group axis — ~60×
  fewer GEMM FLOPs than the dense (K·B³, K·B³) Kronecker matrix,
  which is retained only as the factorization oracle for tests
  (:func:`_dct4_matrix_np`).
* **Row-wise data movement**: group blocks gather as whole B³-element
  rows from a conv-extracted patch view, and overlap-add aggregation
  scatters rows then folds them back with a single col2im conv —
  scalar gathers/scatters (which serialize on TPU) never appear.
* Two-pass structure: stage 1 hard-thresholding produces the basic
  estimate; stage 2 re-matches on the estimate and applies empirical
  Wiener shrinkage (the classical algorithm's structure, reimplemented
  from the published method, not from any source).

The implementation is exact-shape jittable; ``bm4d()`` is the
user-facing wrapper matching the reference call sites
(``bm4d(raw, sigma)`` → denoised float array).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["bm4d", "bm4d_stage"]

# Scatter-operand cap: see the aggregation comment in bm4d_stage.
# Module-level so tests can force multi-chunk paths on small volumes.
_SCATTER_CHUNK_BYTES = 400e6


def _dct_matrix_np(n):
    """Orthonormal DCT-II matrix (n, n), numpy."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    mat = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    mat[0] *= 1.0 / np.sqrt(n)
    mat[1:] *= np.sqrt(2.0 / n)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dct4_matrix_np(k, b):
    """Full 4D group transform as one Kronecker matrix (K·B³, K·B³).

    The separable 4D DCT (1D across the group axis ⊗ 3D over block
    axes) applied to a row-major-flattened group vector is a single
    (K·B³, K·B³) matrix. One MXU-shaped GEMM per direction replaces
    eight (..., B, B, B)-axis einsum passes of 4×4 matmuls — those are
    far too narrow to tile the MXU and each round-trips the full
    (R, K, B³) coefficient tensor through HBM.
    """
    mk = _dct_matrix_np(k)
    mb = _dct_matrix_np(b)
    return np.kron(np.kron(np.kron(mk, mb), mb), mb)


@functools.lru_cache(maxsize=None)
def _col2im_kernel_np(b):
    """One-hot conv kernel (B, B, B, B³, 1) folding block-rows to voxels.

    out[v] = Σ_δ rows[v − δ, flat(δ)] is a correlation over the B³
    in-block positions — a single XLA conv (kernel W[dx, c, 0] = 1 iff
    c == flat((B−1) − dx), zero padding B−1) replaces a fori_loop of
    B³ serialized dynamic-slice/update passes over the accumulator.
    """
    kern = np.zeros((b, b, b, b * b * b, 1), np.float32)
    for dz in range(b):
        for dy in range(b):
            for dx in range(b):
                flat = (dz * b + dy) * b + dx
                kern[b - 1 - dz, b - 1 - dy, b - 1 - dx, flat, 0] = 1.0
    return kern


@functools.lru_cache(maxsize=None)
def _patch_kernel_np(b, c):
    """One-hot patch-extraction kernel (B, B, B, C, C·B³).

    Output channel ci·B³ + flat(δ) holds input channel ci at in-block
    offset δ — a C-channel generalization of
    ``conv_general_dilated_patches`` with an explicit, documented
    channel order, so the Wiener stage can extract noisy+guide rows in
    ONE conv and gather both with ONE 2·B³-lane row gather (two
    half-width gathers were ~2× the HBM random-access cost).

    The production path composes the 3D DCT into this kernel
    (:func:`_patch_dct_kernel_np`); the raw one-hot form remains as
    the factorization oracle for tests.
    """
    n = b * b * b
    kern = np.zeros((b, b, b, c, c * n), np.float32)
    for dz in range(b):
        for dy in range(b):
            for dx in range(b):
                flat = (dz * b + dy) * b + dx
                for ci in range(c):
                    kern[dz, dy, dx, ci, ci * n + flat] = 1.0
    return kern


@functools.lru_cache(maxsize=None)
def _kron3_matrix_np(b):
    """3D block DCT as one (B³, B³) matrix (row-major flat blocks)."""
    mb = _dct_matrix_np(b)
    return np.kron(np.kron(mb, mb), mb)


@functools.lru_cache(maxsize=None)
def _patch_dct_kernel_np(b, c):
    """DCT-emitting patch kernel (B, B, B, C, C·B³).

    Composes the 3D block DCT into the patch-extraction conv: output
    channel ci·B³ + j is the j-th 3D-DCT coefficient of input channel
    ci's block at the output position. The conv's cost is unchanged
    (same shape, the kernel just stops being one-hot), and the full 4D
    group transform then factors as this conv followed by a tiny
    (K, K) contraction along the group axis after the gather — ~60×
    fewer GEMM FLOPs than the dense (K·B³)² Kronecker matrix, because
    the B³×B³ half runs once per *table row* instead of once per
    *gathered group member*, fused into a conv that was already being
    paid for.
    """
    m3 = _kron3_matrix_np(b)  # (j, flat(δ))
    n = b * b * b
    kern = np.zeros((b, b, b, c, c * n), np.float32)
    for dz in range(b):
        for dy in range(b):
            for dx in range(b):
                flat = (dz * b + dy) * b + dx
                for ci in range(c):
                    kern[dz, dy, dx, ci, ci * n: (ci + 1) * n] = (
                        m3[:, flat]
                    )
    return kern


@functools.lru_cache(maxsize=None)
def _col2im_agg_kernel_np(b):
    """Aggregation fold kernel (B, B, B, B³+1, 2).

    Input channels: B³ value rows + 1 augmented weight channel.
    Output 0 folds values (the one-hot col2im of _col2im_kernel_np);
    output 1 folds the weight with every tap set — a row start
    contributes its weight to all B³ voxels the block covers.
    """
    nrow = b * b * b
    kern = np.zeros((b, b, b, nrow + 1, 2), np.float32)
    kern[..., :nrow, :1] = _col2im_kernel_np(b)
    kern[:, :, :, nrow, 1] = 1.0
    return kern


def _strided_box_sum(x, size, stride):
    """Valid-mode box sum over a cube window, separably (3 × 1D),
    subsampled to every ``stride``-th window start per axis.

    Striding inside ``reduce_window`` computes the distance field
    directly at reference-grid resolution: the first axis pass already
    drops the data volume by ``stride``×, and no gather of grid rows is
    needed afterwards (a ``jnp.take`` here lowers to element-wise
    while loops on TPU and dominated the matching profile).
    """
    for axis in range(3):
        window = [1, 1, 1]
        window[axis] = size
        strides = [1, 1, 1]
        strides[axis] = stride
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, tuple(window), tuple(strides), "VALID"
        )
    return x


@functools.partial(
    jax.jit,
    static_argnames=("block", "group", "step", "search", "mode",
                     "matcher", "agg"),
)
def bm4d_stage(noisy, guide, sigma, block=4, group=16, step=3, search=9,
               mode="hard", matcher="auto", agg="slices"):
    """One BM4D pass over ``noisy``; groups are matched on ``guide``.

    mode="hard": hard-threshold coefficients at 2.7σ (stage 1).
    mode="wiener": empirical Wiener using ``guide`` as the signal
    estimate (stage 2).
    Returns the aggregated estimate (same shape, float32).

    Block matching (``matcher="xla"``) is fully vectorized for the
    TPU: for every window offset, the per-reference block distance
    field is a shifted squared difference box-summed by a *strided*
    ``reduce_window`` at reference-grid resolution (dense VPU work, no
    per-reference gathers); ``top_k`` over the offset axis picks each
    group. ``matcher="pallas"`` (the "auto" default on TPU) fuses the
    distance sweep and the top-K selection into VMEM-resident Pallas
    kernels (:mod:`exaspim_tpu.ops.pallas_bm4d`) — the guide is read
    ~once instead of once per offset. Either way, group voxels come
    back as whole block-rows from a conv-extracted patch view.
    """
    Z0, Y0, X0 = noisy.shape
    B, K, W = block, group, search
    half = W // 2
    noisy = noisy.astype(jnp.float32)
    guide = guide.astype(jnp.float32)

    # Regularize the reference grid: reflect-pad each tail so
    # (dim - B) is a multiple of ``step``. The grid is then perfectly
    # strided, so the per-offset distance field can be computed by a
    # *strided* reduce_window at grid resolution (no ragged last row,
    # no grid gather). Final results are cropped back to the input
    # shape; tail references whose blocks dip into the (≤ step-1 voxel)
    # reflected margin are an approximation the aggregation weights
    # wash out.
    tails = tuple((-(d - B)) % step for d in (Z0, Y0, X0))
    noisy = jnp.pad(noisy, [(0, t) for t in tails], mode="reflect")
    guide = jnp.pad(guide, [(0, t) for t in tails], mode="reflect")
    Z, Y, X = noisy.shape

    # Reflect-pad the matching guide so every shifted copy around any
    # in-bounds reference is valid in padded coordinates.
    pad = half
    gpad = jnp.pad(guide, pad, mode="reflect")

    zs, ys, xs = (np.arange(0, d - B + 1, step, dtype=np.int32)
                  for d in (Z, Y, X))
    grid = np.stack(
        [g.ravel() for g in np.meshgrid(zs, ys, xs, indexing="ij")],
        axis=-1,
    )
    refs = jnp.asarray(grid)  # (R, 3) starts in padded coords

    if matcher == "auto":
        matcher = "pallas" if jax.default_backend() == "tpu" else "xla"
    if matcher == "pallas":
        from exaspim_tpu.ops.pallas_bm4d import match_topk

        # The select kernel emits absolute (unclipped) starts; only
        # the border clip remains here (the XLA branch's refs+offs
        # gather-add was a measured 3.4 ms/stage fusion at 128³).
        uz, uy, ux = match_topk(
            guide, block=B, group=K, step=step, search=W
        )
        sz = jnp.clip(uz, 0, Z - B)
        sy = jnp.clip(uy, 0, Y - B)
        sx = jnp.clip(ux, 0, X - B)
    else:
        offs_np = np.stack(
            [g.ravel()
             for g in np.meshgrid(*([np.arange(W) - half] * 3),
                                  indexing="ij")],
            axis=-1,
        ).astype(np.int32)
        offs = jnp.asarray(offs_np)  # (C, 3) window offsets

        def dist_for_offset(off):
            # Shifted copy of the guide: g(v + off) for all v in
            # original coords; slicing the padded volume keeps
            # everything in-bounds.
            shifted = jax.lax.dynamic_slice(
                gpad, (off[0] + pad, off[1] + pad, off[2] + pad),
                (Z, Y, X),
            )
            d2_field = _strided_box_sum((guide - shifted) ** 2, B, step)
            return d2_field.reshape(-1)  # (R,) grid-resolution field

        # (C, R) distance table; scanned over offset batches to bound
        # the transient full-volume diff fields.
        d2 = jax.lax.map(dist_for_offset, offs, batch_size=49)
        # Tie-break toward the reference block: flat regions tie every
        # candidate, and top_k must then prefer near offsets or
        # coverage collapses to one window corner. The per-reference
        # penalty scale is ≪ any real distance difference (same rule
        # as the Pallas selection kernel).
        off_norm2 = jnp.sum(offs.astype(jnp.float32) ** 2, axis=1)
        tie_eps = 1e-6 * (jnp.mean(d2, axis=0, keepdims=True) + 1.0)
        d2 = d2 + tie_eps * off_norm2[:, None]
        _, idx = jax.lax.top_k(-d2.T, K)  # (R, K) best offset indices
        sel = refs[:, None, :] + offs[idx]  # (R, K, 3) starts
        # Clamp near-border candidates into the volume (the classical
        # algorithm restricts matching to in-bounds blocks).
        sel = jnp.clip(
            sel, 0, jnp.asarray([Z - B, Y - B, X - B], jnp.int32)
        )
        sz, sy, sx = sel[..., 0], sel[..., 1], sel[..., 2]

    # Row-major block view: rows[z, y, x, ci·B³ + j] is the j-th
    # 3D-DCT coefficient of channel ci's B³ block starting at
    # (z, y, x) — one patch-extraction conv (DCT-emitting kernel, see
    # _patch_dct_kernel_np), so the group gather below moves whole
    # C·B³-element rows instead of scalars (XLA scalar gathers
    # serialize on TPU, and an unrolled B³-slice stack would blow up
    # compile time). The Wiener stage extracts noisy and guide
    # together: the gather is HBM random-access bound (measured
    # ~19 GB/s on 128-byte rows), so one 2·B³-lane gather beats two
    # B³-lane gathers.
    def block_rows(vols):
        c = len(vols)
        stacked = jnp.stack(vols, axis=-1)[None]  # (1, Z, Y, X, C)
        return jax.lax.conv_general_dilated(
            stacked, jnp.asarray(_patch_dct_kernel_np(B, c)),
            window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]  # (Z-B+1, Y-B+1, X-B+1, C·B³) — rows in 3D-DCT space

    # Factored 4D transform (see _patch_dct_kernel_np): the table rows
    # above already carry each block's 3D DCT, so the remaining group
    # transform is a (K, K) contraction along the member axis — the
    # dense (K·B³)² Kronecker GEMM ran ~167 GFLOP/direction per stage
    # at 128³ where this factorization needs ~3 GFLOP plus one
    # (R·K, B³)(B³, B³) inverse-DCT GEMM before aggregation.
    nb3 = B * B * B
    mk = jnp.asarray(_dct_matrix_np(K))
    m3 = jnp.asarray(_kron3_matrix_np(B))

    if mode == "hard":
        rows = block_rows([noisy])
        g = rows[sz, sy, sx]  # (R, K, B³) DCT-space rows
        coef_n = jnp.einsum("lk,rkb->rlb", mk, g)
        thr = 2.7 * sigma
        keep = jnp.abs(coef_n) > thr
        coef = jnp.where(keep, coef_n, 0.0)
        nretained = jnp.sum(keep, axis=(1, 2)).astype(jnp.float32)
        wgt = 1.0 / (1.0 + nretained)  # (R,)
    else:
        rows = block_rows([noisy, guide])
        both = rows[sz, sy, sx].reshape(-1, K, 2, nb3)
        coef_n = jnp.einsum("lk,rkb->rlb", mk, both[:, :, 0])
        coef_g = jnp.einsum("lk,rkb->rlb", mk, both[:, :, 1])
        shrink = coef_g**2 / (coef_g**2 + sigma**2 + 1e-12)
        coef = coef_n * shrink
        wgt = 1.0 / (1e-8 + jnp.sum(shrink**2, axis=(1, 2)))

    # Inverse: K-axis inverse (orthonormal ⇒ transpose contraction),
    # then one per-row inverse 3D DCT GEMM back to voxel space.
    filt_k = jnp.einsum("lk,rlb->rkb", mk, coef)
    filt = (filt_k.reshape(-1, nb3) @ m3).reshape(-1, K, nb3)

    # Overlap-add aggregation: scatter weighted block-rows onto the
    # start-indexed row accumulator (row scatter, not scalar scatter).
    # The scatter is z-chunked so each operand stays under ~400 MB:
    # XLA's TPU layout assignment flips large scatter operands to a
    # window-major layout (observed at ≥127³ rows; ≤126³ stays
    # channels-minor) and each contiguous B³-row write then becomes B³
    # 8MB-strided element writes — 248 ms vs 17 ms at 128³. Explicit
    # layout constraints, jit splits, and transposes are all
    # elided/overridden; keeping every chunk below the flip threshold
    # is the only arrangement that reliably survives. Out-of-chunk
    # updates are masked to an out-of-bounds row and dropped.
    w = wgt[:, None, None]
    # Augment each value row with its scalar aggregation weight: the
    # weight field then rides the SAME chunked row scatter (R·K rows)
    # instead of a second R·K-scalar scatter, and the weight fold
    # becomes the second output channel of the col2im conv below.
    filt_rows = jnp.concatenate(
        [
            filt * w,
            jnp.broadcast_to(w, (*sz.shape, 1)),
        ],
        axis=-1,
    )
    rows_shape = (Z - B + 1, Y - B + 1, X - B + 1)
    rz, ry, rx = rows_shape
    nrow = B * B * B + 1
    if agg == "sorted":
        # Sort + sorted segment-sum aggregation (the round-4 verdict's
        # one untried structural alternative to the chunked random-row
        # scatter): linearize destinations, argsort the R·K keys,
        # gather rows by the permutation, reduce runs of equal keys
        # with ``indices_are_sorted=True``. Measured on-chip at 128³
        # (scripts/agg_ab.py + in-situ two-stage A/B, RESULTS.md round
        # 5c) — kept as an option; the default records the measured
        # winner.
        keys = ((sz * ry) + sy).reshape(-1) * rx + sx.reshape(-1)
        perm = jnp.argsort(keys)
        acc_rows = jax.ops.segment_sum(
            filt_rows.reshape(-1, nrow)[perm], keys[perm],
            num_segments=rz * ry * rx, indices_are_sorted=True,
        ).reshape(rz, ry, rx, nrow)
        return _fold_rows(
            acc_rows, "slices", B, Z, Y, X, Z0, Y0, X0, nrow
        )
    nchunks = max(
        1,
        int(np.ceil(rz * ry * rx * nrow * 4 / _SCATTER_CHUNK_BYTES)),
    )
    zchunk = int(np.ceil(rz / nchunks))
    gyx = len(ys) * len(xs)
    parts = []
    for ci in range(nchunks):
        z0 = ci * zchunk
        zc = min(zchunk, rz - z0)
        if zc <= 0:  # rounding can over-provision trailing chunks
            break
        # References are z-major, and a reference's members land within
        # ``half`` planes of it, so each chunk's contributing updates
        # are a contiguous static ref-row slice — no need to stream all
        # R·K updates through every chunk's scatter.
        g0 = max(0, (z0 - half) // step)
        g1 = min(len(zs), (z0 + zc + half) // step + 1)
        rs = slice(g0 * gyx, g1 * gyx)
        in_chunk = (sz[rs] >= z0) & (sz[rs] < z0 + zc)
        zi = jnp.where(in_chunk, sz[rs] - z0, zc)  # zc is OOB → dropped
        acc_c = jnp.zeros((zc, ry, rx, nrow), jnp.float32)
        parts.append(
            acc_c.at[zi, sy[rs], sx[rs]].add(
                filt_rows[rs], mode="drop", unique_indices=False
            )
        )
    acc_rows = (
        parts[0] if nchunks == 1 else jnp.concatenate(parts, axis=0)
    )
    return _fold_rows(acc_rows, agg, B, Z, Y, X, Z0, Y0, X0, nrow)


def _fold_rows(acc_rows, agg, B, Z, Y, X, Z0, Y0, X0, nrow):
    """Fold rows back to voxel space: out[v] = Σ_δ rows[v − δ, flat(δ)]."""
    if agg == "conv":
        # One conv: out channel 0 is the value col2im; channel 1 folds
        # the augmented weight channel with an all-taps kernel (every
        # row covers all B³ voxels it spans) — _col2im_agg_kernel_np.
        folded = jax.lax.conv_general_dilated(
            acc_rows[None], jnp.asarray(_col2im_agg_kernel_np(B)),
            window_strides=(1, 1, 1), padding=[(B - 1, B - 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]  # (Z, Y, X, 2)
        accum, weight = folded[..., 0], folded[..., 1]
    else:
        # Static-slice fold (the default): B³ shifted single-channel
        # window adds, fused by XLA into one pass over the accumulator.
        # The conv formulation has only 2 output channels — far below
        # MXU tile width — and measured ~4× slower than its own HBM
        # traffic bound; the slice fold is pure VPU adds and reads each
        # accumulator element once. The weight fold is mathematically a
        # B-box sum of the weight channel, done separably — and it is
        # split off BEFORE the pad: when both folds consumed one padded
        # 65-channel tensor, XLA re-materialized the scatter chunks'
        # {1,0}→{0,1} relayout once per consumer (two ~3.9 ms
        # transposes per chunk per stage in the 128³ xplane trace);
        # slicing the weight lane from the channels-minor scatter
        # output directly leaves the value side as the relayout's only
        # consumer.
        padded = jnp.pad(
            acc_rows[..., : nrow - 1], [(B - 1, B - 1)] * 3 + [(0, 0)]
        )
        accum = jnp.zeros((Z, Y, X), jnp.float32)
        for dz in range(B):
            for dy in range(B):
                for dx in range(B):
                    flat = (dz * B + dy) * B + dx
                    start = (B - 1 - dz, B - 1 - dy, B - 1 - dx, flat)
                    win = jax.lax.slice(
                        padded, start,
                        (start[0] + Z, start[1] + Y, start[2] + X,
                         flat + 1),
                    )
                    accum = accum + win[..., 0]
        wpad = jnp.pad(acc_rows[..., nrow - 1], [(B - 1, B - 1)] * 3)
        for axis in range(3):
            window = [1, 1, 1]
            window[axis] = B
            wpad = jax.lax.reduce_window(
                wpad, 0.0, jax.lax.add, tuple(window), (1, 1, 1),
                "VALID",
            )
        weight = wpad
    return (accum / (weight + 1e-12))[:Z0, :Y0, :X0]


def bm4d_batch(vols, sigma, block=4, group=16, step=3, search=9,
               two_stage=True, matcher="auto", agg="slices"):
    """Denoise a batch of equal-shape volumes.

    A host loop of asynchronously queued per-volume dispatches (the
    stack at the end synchronizes once) with single-patch peak memory.
    One *fused* ``lax.map`` program measured ~7× slower than the
    standalone per-volume programs at 64³ — the fusion re-rolls the
    matching pipeline and re-litigates the scatter layout (see
    bm4d_stage) — while a dispatch chain costs only queue latency.
    """
    fn = functools.partial(
        bm4d, block=block, group=group, step=step, search=search,
        two_stage=two_stage, matcher=matcher, agg=agg,
    )
    vols = jnp.asarray(vols)
    return jnp.stack([fn(vols[i], sigma) for i in range(vols.shape[0])])


def bm4d(vol, sigma, block=4, group=16, step=3, search=9, two_stage=True,
         matcher="auto", agg="slices"):
    """Denoise a 3D volume with BM4D (drop-in for the reference's
    ``bm4d.bm4d(raw, sigma)`` call sites).

    ``sigma`` is the noise standard deviation in the volume's intensity
    units. Returns float32; caller rounds/clips to counts as needed.
    """
    vol = jnp.asarray(vol, jnp.float32)
    if vol.ndim != 3:
        raise ValueError(f"expected 3D volume, got {vol.shape}")
    sigma = jnp.float32(sigma)
    basic = bm4d_stage(
        vol, vol, sigma, block=block, group=group, step=step,
        search=search, mode="hard", matcher=matcher, agg=agg,
    )
    if not two_stage:
        return basic
    return bm4d_stage(
        vol, basic, sigma, block=block, group=group, step=step,
        search=search, mode="wiener", matcher=matcher, agg=agg,
    )
