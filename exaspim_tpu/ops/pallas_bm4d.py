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
    out_ref[0] = jnp.zeros((cchunk, gyp, gxp), jnp.float32)

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
                    # y box+stride then x box+stride as band matmuls.
                    fy = jax.lax.dot_general(
                        py, d2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (gy, X)
                    fx = jax.lax.dot_general(
                        fy, px, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (gy, gx)
                    rows.append(fx[None])
                row0 = dxi * W
                out_ref[0, row0: row0 + W, :gy, :gx] = (
                    jnp.concatenate(rows, axis=0)
                )


def _select_kernel(d2_ref, out_ref, *, K, W, cchunk):
    """Iterative masked-argmin top-K over one column chunk.

    Applies the near-offset tie-break (per-column scale) before
    selection: flat regions tie every candidate and the group must
    prefer near offsets or coverage collapses to a window corner.
    Padded offset rows (c mod cchunk ≥ W²) carry zeros from the match
    kernel; they are masked to +inf here (padded *columns* select
    garbage that the caller crops). The per-offset ‖Δ‖² penalty basis
    is derived from the row index in-kernel — an HBM input for it
    costs a ~14 ms serialized copy next to the custom-call.
    """
    cp = W * cchunk
    half = W // 2
    d = d2_ref[0]  # (Cp, ys, xs)
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)
    pad_row = (iota % cchunk) >= W * W
    dy = iota // cchunk - half
    dx = (iota % cchunk) // W - half
    dz = iota % W - half
    norm2 = (dy * dy + dx * dx + dz * dz).astype(jnp.float32)
    tie = 1e-6 * (
        jnp.sum(d, axis=0, keepdims=True) / (W * W * W) + 1.0
    )
    d = d + norm2 * tie
    d = jnp.where(pad_row, jnp.float32(np.inf), d)
    for j in range(K):
        mn = jnp.min(d, axis=0, keepdims=True)
        amin = jnp.min(
            jnp.where(d == mn, iota, cp), axis=0, keepdims=True
        )
        out_ref[0, j: j + 1, :, :] = amin
        d = jnp.where(iota == amin, jnp.float32(np.inf), d)


@functools.partial(
    jax.jit,
    static_argnames=("block", "group", "step", "search", "interpret"),
)
def match_topk(guide, block=4, group=16, step=3, search=9,
               interpret=False):
    """Block matching on a (tail-regularized) guide volume.

    Returns ``(idx, offs)``: ``idx`` (R, K) int32 indexes each
    reference-grid block's K best window offsets into ``offs``
    (Cp, 3) — the (Δz, Δy, Δx) table in the kernels' padded
    (Δy-major) ordering. ``guide`` must already satisfy
    (dim − block) % step == 0 per axis (callers pad; see bm4d_stage).
    """
    Z, Y, X = guide.shape
    B, K, W = block, group, search
    half = W // 2
    lead = step * -(-half // step)
    guide = guide.astype(jnp.float32)

    gz, gy, gx = ((d - B) // step + 1 for d in (Z, Y, X))
    R = gz * gy * gx
    gyp = -(-gy // 8) * 8  # ref y rows, sublane-padded
    gxp = -(-gx // 128) * 128  # ref x columns, lane-padded
    cchunk = -(-(W * W) // 8) * 8  # offsets per Δy, sublane-padded
    cp = W * cchunk

    # Offset table in kernel ordering: c = Δy-chunk · cchunk +
    # (Δx·W + Δz); padded rows are never selected.
    rng = np.arange(W, dtype=np.int32) - half
    offs = np.zeros((cp, 3), np.int32)
    for yi, dyv in enumerate(rng):
        for xi, dxv in enumerate(rng):
            for zi, dzv in enumerate(rng):
                offs[yi * cchunk + xi * W + zi] = (dzv, dyv, dxv)

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
    gk = jnp.pad(
        guide, ((lead, trail), (half, half), (half, half)),
        mode="reflect",
    )
    yk, xk = Y + 2 * half, X + 2 * half

    py = jnp.asarray(_band(gy, Y, B, step))
    px = jnp.asarray(_band(gx, X, B, step))

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
        out_shape=jax.ShapeDtypeStruct((gz, cp, gyp, gxp), jnp.float32),
        grid=(gz, W),
        in_specs=view_specs + tail_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*([gk] * nview), py, px)

    yb = 8
    idx = pl.pallas_call(
        functools.partial(_select_kernel, K=K, W=W, cchunk=cchunk),
        out_shape=jax.ShapeDtypeStruct((gz, K, gyp, gxp), jnp.int32),
        grid=(gz, gyp // yb),
        in_specs=[
            pl.BlockSpec((1, cp, yb, gxp), lambda gi, j: (gi, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, K, yb, gxp), lambda gi, j: (gi, 0, j, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(d2)
    idx = idx[:, :, :gy, :gx]  # (gz, K, gy, gx)
    idx = jnp.moveaxis(idx, 1, 3).reshape(R, K)
    return idx, jnp.asarray(offs)
