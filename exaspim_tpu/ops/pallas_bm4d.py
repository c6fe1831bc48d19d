"""Pallas TPU kernels for BM4D block matching (SURVEY §7 stage 4b).

The XLA formulation of block matching (:mod:`exaspim_tpu.ops.bm4d`)
re-reads the guide volume once per search offset: 729 shifted copies,
squared diffs, and strided box sums stream ~15 GB of HBM traffic per
128³ stage. These kernels keep a z-slab of the guide resident in VMEM
and emit the full distance table — then select the K best offsets —
with the volume read essentially once:

* ``match_distances`` — grid over (ref z-row, Δy); per step the kernel
  forms the (Δy, Δx)-shifted guide with static slices, branching over
  the W possible Δy values (Mosaic requires provably 8-aligned dynamic
  sublane starts, so Δy cannot be a dynamic slice), sums
  the squared difference over the block's z extent, and collapses the
  y/x box-window-and-stride in one step each as band-matrix matmuls on
  the MXU (``P[j, y] = 1 for y ∈ [step·j, step·j+B)``). Output: the
  distance table (gz, Cp, gyp, gxp) — offset rows ordered
  (Δy, Δx, Δz), padded per Δy to a sublane multiple; ref y/x kept as
  separate (8-, 128-padded) axes because Mosaic cannot reshape
  sublanes into lanes in-kernel.
* ``select_topk`` — iterative masked-argmin top-K over column chunks of
  the table (16 VMEM passes beat a 58M-element XLA sort), with the
  near-offset tie-break applied per reference column.

Only matching moves into Pallas: the downstream gather/DCT/threshold/
scatter pipeline is already MXU/HBM-shaped in XLA (see bm4d.py).
Replaces the matching half of the reference's C++ ``bm4d`` binary
(reference data_handling.py:332); group selections agree with a
float64 numpy oracle (tests/test_pallas_bm4d.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["match_topk"]


def _band(npos, dim, block, step):
    """(npos, dim) 0/1 band matrix: row j covers [step·j, step·j+B)."""
    m = np.zeros((npos, dim), np.float32)
    for j in range(npos):
        m[j, step * j: step * j + block] = 1.0
    return m


def _match_kernel(*refs, B, W, step, Y, X, gy, gx, cchunk, gyp, gxp):
    """One (ref z-row, Δy) grid step; see module docstring."""
    *views, py_ref, px_ref, out_ref = refs
    half = W // 2
    lead = step * -(-half // step)
    dyi = pl.program_id(1)

    def plane(p, ys, xs):
        return views[p // step][p % step, ys, xs]

    gc = [
        plane(lead + t, slice(half, half + Y), slice(half, half + X))
        for t in range(B)
    ]
    py = py_ref[...]
    px = px_ref[...]

    # Zero the whole block once (unwritten output is undefined; padded
    # ref columns select garbage the caller crops, padded offset rows
    # are masked by position in the selection kernel).
    out_ref[0] = jnp.zeros((cchunk, gyp, gxp), jnp.bfloat16)

    # Δy is the grid minor axis and shifts the *sublane* (y) axis.
    # Mosaic only takes dynamic sublane starts it can prove 8-aligned
    # (a pl.ds(dyi, Y) load fails to compile on real TPU: "cannot
    # statically prove that index in dimension 1 is a multiple of 8"),
    # so branch over the W possible Δy values — scf.if control flow
    # means only the selected arm executes; the cost is code size.
    for dy in range(-half, half + 1):

        @pl.when(dyi == dy + half)
        def _():
            for dxi, dx in enumerate(range(-half, half + 1)):
                rows = []
                for dz in range(-half, half + 1):
                    d2 = None
                    for t in range(B):
                        sh = plane(
                            lead + dz + t,
                            slice(half + dy, half + dy + Y),
                            slice(half + dx, half + dx + X),
                        )
                        d = (gc[t] - sh) ** 2
                        d2 = d if d2 is None else d2 + d
                    # Band matmuls in bf16 with f32 accumulation: the
                    # MXU runs bf16 at 4× its f32 rate and the band
                    # operand is 0/1 (bf16-exact), so only the summed
                    # diff planes round (≲0.4 % relative). Distances
                    # feed a *ranking*; razor-thin ties flip, which
                    # BM4D grouping is indifferent to (the f64-oracle
                    # test compares with a matching distance
                    # tolerance).
                    d2 = d2.astype(jnp.bfloat16)
                    fy = jax.lax.dot_general(
                        py, d2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (gy, X)
                    fx = jax.lax.dot_general(
                        fy.astype(jnp.bfloat16), px,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (gy, gx)
                    rows.append(fx[None])
                row0 = dxi * W
                # The table is stored bf16: it is 836 MB in f32 at
                # 128³ — the write (here) and the read (select) are
                # pure HBM traffic, and its values are box sums of
                # already-bf16-rounded summands.
                out_ref[0, row0: row0 + W, :gy, :gx] = jnp.concatenate(
                    rows, axis=0
                ).astype(jnp.bfloat16)


def _select_kernel(d2_ref, sz_ref, sy_ref, sx_ref, *, K, W, cchunk,
                   step, yb):
    """Iterative packed-key top-K over one column chunk.

    Each table entry is packed into ONE monotonic int32 sort key:
    the bf16 distance's bit pattern (non-negative bf16 orders
    identically to its value) in the high 16 bits, and a tie-break in
    the low 16: clamped ‖Δ‖² then the (Δy, Δx, Δz) digits. Flat
    regions tie every candidate at the same bf16 distance and the
    group must then prefer near offsets or coverage collapses to a
    window corner; packing the preference into the key makes each of
    the K rounds a single vector min (the float formulation needed
    min + masked argmin + remask — measured 7.45 ms/stage at 128³)
    and the keys are unique per column, so exactly one entry retires
    per round. Padded offset rows (c mod cchunk ≥ W²) are forced to
    INT32_MAX (padded *columns* select garbage the caller crops).

    Emits *unclipped absolute block starts* (z, y, x per selection):
    the downstream gather wants start coordinates, and deriving them
    here from the key's offset digits is free VPU work, while the XLA
    formulation (``refs + offs[idx]``) was a measured 3.4 ms/stage
    gather-add fusion over R·K×3 elements at 128³. Border clipping
    stays in the caller (cheap, and keeps this kernel's output
    comparable to the unclipped matching oracle).
    """
    half = W // 2
    gi = pl.program_id(0)
    j = pl.program_id(1)
    d = d2_ref[0]  # (Cp, ys, xs) bf16
    bits = jax.lax.bitcast_convert_type(d, jnp.uint16).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    # Row decode: c = Δy-chunk · cchunk + (Δx·W + Δz), cchunk NOT a
    # multiple of W (it is sublane-padded) — reduce modulo cchunk
    # FIRST (c % W alone would interleave Δy into Δz).
    m = iota % cchunk
    pad_row = m >= W * W
    dy = iota // cchunk  # digits in [0, W)
    dx = m // W
    dz = m % W
    norm2 = (
        (dy - half) ** 2 + (dx - half) ** 2 + (dz - half) ** 2
    )
    low = (
        (jnp.minimum(norm2, 15) << 12) | (dy << 8) | (dx << 4) | dz
    )
    key = jnp.where(
        pad_row, jnp.int32(np.iinfo(np.int32).max), (bits << 16) | low
    )
    shp = (1,) + d.shape[1:]
    ybase = step * (j * yb + jax.lax.broadcasted_iota(jnp.int32, shp, 1))
    xbase = step * jax.lax.broadcasted_iota(jnp.int32, shp, 2)
    zbase = step * gi
    for k in range(K):
        mk = jnp.min(key, axis=0, keepdims=True)
        sz_ref[0, k: k + 1, :, :] = zbase + (mk & 15) - half
        sy_ref[0, k: k + 1, :, :] = ybase + ((mk >> 8) & 15) - half
        sx_ref[0, k: k + 1, :, :] = xbase + ((mk >> 4) & 15) - half
        key = jnp.where(key == mk, jnp.int32(np.iinfo(np.int32).max),
                        key)


@functools.partial(
    jax.jit,
    static_argnames=("block", "group", "step", "search", "interpret"),
)
def match_topk(guide, block=4, group=16, step=3, search=9,
               interpret=False):
    """Block matching on a (tail-regularized) guide volume.

    Returns ``(sz, sy, sx)``: three (R, K) int32 arrays of *unclipped*
    absolute block starts — reference-grid start + the selected window
    offset per group member (the caller clips to the in-bounds range;
    see _select_kernel on why starts are emitted in-kernel). ``guide``
    must already satisfy (dim − block) % step == 0 per axis (callers
    pad; see bm4d_stage).
    """
    Z, Y, X = guide.shape
    B, K, W = block, group, search
    if W > 15:
        raise ValueError(
            "pallas matcher packs window offsets into 4-bit key "
            f"digits; search window {W} > 15 needs matcher='xla'"
        )
    half = W // 2
    lead = step * -(-half // step)
    guide = guide.astype(jnp.float32)

    gz, gy, gx = ((d - B) // step + 1 for d in (Z, Y, X))
    R = gz * gy * gx
    gyp = -(-gy // 8) * 8  # ref y rows, sublane-padded
    gxp = -(-gx // 128) * 128  # ref x columns, lane-padded
    cchunk = -(-(W * W) // 8) * 8  # offsets per Δy, sublane-padded
    cp = W * cchunk

    # Kernel-visible guide: y/x reflect-padded by half; z padded by
    # (lead, trail) so the per-step slab views tile cleanly: slab gi =
    # planes [step·gi, step·gi + step·nview) covers every access
    # lead − half .. lead + B − 1 + half. Only ±half of the z pad is
    # ever read (reflect there matches the XLA path); the rest is
    # step-alignment margin.
    nview = (lead + B + half + step - 1) // step
    zk = step * (gz - 1 + nview)
    trail = zk - lead - Z
    if not (0 <= trail <= Z - 1 and lead <= Z - 1):
        raise ValueError(f"volume too small along z for matching: {Z}")
    # Guide views stay f32: a bf16 guide would halve the VMEM slice
    # traffic, but bf16's (16, 128) tiling makes the ±Δy sublane
    # slices misaligned and the realignment cost exceeds the saving
    # (measured 48 ms vs 36 ms for the whole matcher at 128³).
    gk = jnp.pad(
        guide, ((lead, trail), (half, half), (half, half)),
        mode="reflect",
    )
    yk, xk = Y + 2 * half, X + 2 * half

    py = jnp.asarray(_band(gy, Y, B, step), jnp.bfloat16)
    px = jnp.asarray(_band(gx, X, B, step), jnp.bfloat16)

    view_specs = [
        pl.BlockSpec(
            (step, yk, xk),
            (lambda gi, dyi, _v=v: (gi + _v, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        for v in range(nview)
    ]
    tail_specs = [
        pl.BlockSpec((gy, Y), lambda gi, dyi: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gx, X), lambda gi, dyi: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec(
        (1, cchunk, gyp, gxp), lambda gi, dyi: (gi, dyi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    d2 = pl.pallas_call(
        functools.partial(
            _match_kernel, B=B, W=W, step=step, Y=Y, X=X, gy=gy,
            gx=gx, cchunk=cchunk, gyp=gyp, gxp=gxp,
        ),
        out_shape=jax.ShapeDtypeStruct((gz, cp, gyp, gxp),
                                       jnp.bfloat16),
        grid=(gz, W),
        in_specs=view_specs + tail_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*([gk] * nview), py, px)

    yb = 8
    start_spec = pl.BlockSpec(
        (1, K, yb, gxp), lambda gi, j: (gi, 0, j, 0),
        memory_space=pltpu.VMEM,
    )
    starts = pl.pallas_call(
        functools.partial(_select_kernel, K=K, W=W, cchunk=cchunk,
                          step=step, yb=yb),
        out_shape=[
            jax.ShapeDtypeStruct((gz, K, gyp, gxp), jnp.int32)
            for _ in range(3)
        ],
        grid=(gz, gyp // yb),
        in_specs=[
            pl.BlockSpec((1, cp, yb, gxp), lambda gi, j: (gi, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[start_spec] * 3,
        interpret=interpret,
    )(d2)
    return tuple(
        jnp.moveaxis(s[:, :, :gy, :gx], 1, 3).reshape(R, K)
        for s in starts
    )
