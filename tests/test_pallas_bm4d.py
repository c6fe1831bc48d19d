"""Pallas block-matching parity vs an independent numpy oracle.

Interpret-mode checks (the CPU test equivalent of trusting a Mosaic
kernel): the fused distance+top-K kernels must agree with a direct
numpy evaluation of the same definition — reflect-padded guide,
squared-difference box sums over the block extent, per-reference
near-offset tie-break — and the full BM4D stage must give identical
output through either matcher.
"""

import numpy as np
import pytest

from exaspim_tpu.ops.bm4d import bm4d_stage
from exaspim_tpu.ops.pallas_bm4d import match_topk

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow



def _naive_match(guide, block, group, step, search):
    """Direct numpy block matching (the oracle)."""
    Z, Y, X = guide.shape
    half = search // 2
    g = np.pad(guide.astype(np.float64), half, mode="reflect")
    zs = range(0, Z - block + 1, step)
    ys = range(0, Y - block + 1, step)
    xs = range(0, X - block + 1, step)
    rng = np.arange(search) - half
    offs = [(dz, dy, dx) for dy in rng for dx in rng for dz in rng]
    idx_all, d_all = [], []
    for z in zs:
        for y in ys:
            for x in xs:
                ref = g[z + half: z + half + block,
                        y + half: y + half + block,
                        x + half: x + half + block]
                d = np.empty(len(offs))
                for c, (dz, dy, dx) in enumerate(offs):
                    cand = g[z + dz + half: z + dz + half + block,
                             y + dy + half: y + dy + half + block,
                             x + dx + half: x + dx + half + block]
                    d[c] = np.sum((ref - cand) ** 2)
                tie = 1e-6 * (d.mean() + 1.0)
                d = d + tie * np.asarray(
                    [dz * dz + dy * dy + dx * dx
                     for dz, dy, dx in offs]
                )
                idx_all.append(np.argsort(d, kind="stable")[:group])
                d_all.append(d)
    return np.asarray(idx_all), np.asarray(offs, np.int32), \
        np.asarray(d_all)


@pytest.mark.parametrize("shape", [(16, 16, 16), (19, 16, 13)])
def test_match_topk_vs_naive(shape):
    rng = np.random.default_rng(3)
    vol = rng.normal(100.0, 20.0, shape).astype(np.float32)
    # Satisfy the (dim - B) % step == 0 contract like bm4d_stage does.
    B, step = 4, 3
    vol = np.pad(
        vol,
        [(0, (-(d - B)) % step) for d in shape],
        mode="reflect",
    )
    sz, sy, sx = (
        np.asarray(a)
        for a in match_topk(
            vol, block=B, group=8, step=step, search=5, interpret=True
        )
    )
    nidx, noffs, nd = _naive_match(vol, B, 8, step, 5)
    assert sz.shape == nidx.shape
    # Kernel emits absolute (unclipped) starts; recover offsets by
    # subtracting the z-major reference grid and compare against the
    # oracle's (index tables are ordered differently).
    gz, gy, gx = ((d - B) // step + 1 for d in vol.shape)
    refz, refy, refx = (
        g.reshape(-1, 1) * step
        for g in np.meshgrid(
            np.arange(gz), np.arange(gy), np.arange(gx), indexing="ij"
        )
    )
    got = np.stack([sz - refz, sy - refy, sx - refx], axis=-1)
    want = noffs[nidx]
    # The kernel's sweep runs in bf16 end to end (guide views, diffs,
    # band matmuls with f32 accumulate, table storage), so distances
    # carry up to ~1.5 % relative rounding (three bf16 quantizations
    # of 2⁻⁸ each) and near-tied candidates may swap with the f64
    # oracle. A swap is only acceptable when the swapped-in offset's
    # *oracle* distance is within that rounding band of the
    # swapped-out one — grouping is indifferent to such near-ties,
    # wrong selections (tens of % off) are not.
    rtol = 2e-2
    ooff = {tuple(o): c for c, o in enumerate(noffs)}
    n_swap = 0
    for r in range(sz.shape[0]):
        gs = set(map(tuple, got[r]))
        ws = set(map(tuple, want[r]))
        if gs == ws:
            continue
        n_swap += 1
        cut = max(nd[r][ooff[o]] for o in ws)  # worst accepted
        for o in gs - ws:
            do = nd[r][ooff[o]]
            assert do <= cut * (1 + rtol) + 1e-9, (
                f"ref {r}: selected {o} (d={do:.6g}) is not a "
                f"near-tie of the oracle cut {cut:.6g}"
            )
    # Rounding may swap a modest tail of near-ties, never the bulk.
    assert n_swap <= max(2, sz.shape[0] // 5), n_swap


def test_stage_output_matches_xla_matcher():
    """Either matcher must give the same denoised volume up to the
    group flips caused by f32 rounding of near-tied distances (the
    Pallas table agrees with a float64 oracle; the XLA strided
    reduce_window rounds differently on a few % of references), so the
    comparison is aggregate closeness, not bitwise equality."""
    rng = np.random.default_rng(5)
    vol = rng.normal(500.0, 30.0, (20, 17, 16)).astype(np.float32)
    a = np.asarray(
        bm4d_stage(vol, vol, 30.0, block=4, group=8, step=3, search=5,
                   mode="hard", matcher="xla")
    )
    # Interpret-mode Pallas matcher inside the jitted stage: exercised
    # via the public entry by forcing the matcher (CPU backend would
    # otherwise pick "xla").
    from exaspim_tpu.ops import pallas_bm4d

    orig = pallas_bm4d.match_topk
    try:
        pallas_bm4d.match_topk = lambda *a_, **k: orig(
            *a_, **{**k, "interpret": True}
        )
        b = np.asarray(
            bm4d_stage(vol, vol, 30.0, block=4, group=8, step=3,
                       search=5, mode="hard", matcher="pallas")
        )
    finally:
        pallas_bm4d.match_topk = orig
    # Closeness of the two estimates: on this flat phantom every
    # candidate is a statistical tie, so the bf16-sweep Pallas matcher
    # and the f32 XLA matcher legitimately pick different (equally
    # good) group members; both estimates must still agree to well
    # under the σ=30 noise scale.
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 0.2 * 30.0, rmse
    # On a flat+noise phantom every candidate is a statistical tie, so
    # the matchers' bf16-vs-f32 distance rounding swaps many (equally
    # good) group members; pin *denoising quality* equivalence instead
    # of voxel-wise agreement: both must recover the constant-500
    # truth equally well.
    ra = float(np.sqrt(np.mean((a - 500.0) ** 2)))
    rb = float(np.sqrt(np.mean((b - 500.0) ** 2)))
    assert abs(ra - rb) < 0.05 * max(ra, rb), (ra, rb)
