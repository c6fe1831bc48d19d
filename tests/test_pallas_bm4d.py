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
    idx_all = []
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
    return np.asarray(idx_all), np.asarray(offs, np.int32)


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
    idx, offs = match_topk(
        vol, block=B, group=8, step=step, search=5, interpret=True
    )
    idx, offs = np.asarray(idx), np.asarray(offs)
    nidx, noffs = _naive_match(vol, B, 8, step, 5)
    assert idx.shape == nidx.shape
    # Compare selected *offsets* (index tables are ordered differently).
    got = offs[idx]
    want = noffs[nidx]
    # Random floats: ties are measure-zero, so the sets must agree;
    # order may differ only through f32-vs-f64 rounding on near-ties,
    # so compare as sorted tuples per reference.
    for r in range(idx.shape[0]):
        gs = sorted(map(tuple, got[r]))
        ws = sorted(map(tuple, want[r]))
        assert gs == ws, f"ref {r}: {gs} != {ws}"


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
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    assert rmse < 1.0, rmse  # data scale ~500, noise sigma 30
    assert np.mean(np.abs(a - b) > 1.0) < 0.05
