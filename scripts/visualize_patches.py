"""Render a QA grid of cached patches (raw / teacher / fg overlay).

Capability parity with the reference's cache visualizer (reference
scripts/visualize_patches.py): rank patches by foreground occupancy,
sample a bounded pool, and render a grid of max-projections with the
foreground mask tinted over the raw projection.

Usage:
    python scripts/visualize_patches.py --cache /c/train \\
        --out grid.png [--n 16] [--seed 0]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from exaspim_tpu.data.cache import CachedPatchDataset  # noqa: E402


def pick_indices(ds, n, seed=0, pool_factor=4):
    """Foreground-ranked bounded pool, then a random draw
    (reference visualize_patches.py:78-118)."""
    occ = []
    for i in range(len(ds)):
        _, _, fg = ds[i]
        occ.append(fg.mean())
    order = np.argsort(occ)[::-1]
    pool = order[:max(n * pool_factor, n)]
    rng = np.random.default_rng(seed)
    take = min(n, len(pool))
    return sorted(rng.choice(pool, size=take, replace=False).tolist())


def stretch(img, lo_pct=1.0, hi_pct=99.5):
    lo, hi = np.percentile(img, [lo_pct, hi_pct])
    return np.clip((img - lo) / max(hi - lo, 1e-6), 0, 1)


def overlay(raw_proj, fg_proj):
    """Tint foreground red over a grayscale projection."""
    rgb = np.stack([raw_proj] * 3, axis=-1)
    rgb[..., 0] = np.clip(rgb[..., 0] + 0.5 * fg_proj, 0, 1)
    return rgb


def render(ds, indices, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(indices)
    fig, axes = plt.subplots(n, 3, figsize=(9, 3 * n), squeeze=False)
    for row, i in enumerate(indices):
        raw, teacher, fg = ds[i]
        rp = stretch(raw.max(axis=0).astype(float))
        tp = stretch(teacher.max(axis=0).astype(float))
        fp = fg.max(axis=0).astype(float)
        axes[row][0].imshow(rp, cmap="gray")
        axes[row][0].set_title(f"#{i} raw")
        axes[row][1].imshow(tp, cmap="gray")
        axes[row][1].set_title("teacher")
        axes[row][2].imshow(overlay(rp, fp))
        axes[row][2].set_title("fg overlay")
        for ax in axes[row]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    ds = CachedPatchDataset(args.cache)
    idx = pick_indices(ds, args.n, seed=args.seed)
    print(f"rendering patches {idx}")
    render(ds, idx, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
