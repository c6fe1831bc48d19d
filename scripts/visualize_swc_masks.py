"""Render SWC skeleton-mask overlays for QA.

Capability parity with the reference's SWC-mask visualizer (reference
scripts/visualize_swc_masks.py): pick traced nodes whose patches fit in
the volume, rasterize the skeleton mask, and render raw-vs-overlay
panels.

Usage:
    python scripts/visualize_swc_masks.py --img vol.zarr --swc traces/ \\
        --out masks.png [--n 6] [--patch 64 64 64]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from exaspim_tpu.ops.metrics import make_skeleton_mask  # noqa: E402
from exaspim_tpu.utils import img_io  # noqa: E402
from exaspim_tpu.utils.swc import Reader, to_voxels  # noqa: E402


def pick_examples(points, shape, patch, n, seed=0):
    """Nodes whose centered patch is fully in bounds
    (reference visualize_swc_masks.py:93-120)."""
    pts = np.asarray(points)
    half = np.asarray(patch) // 2
    hi = np.asarray(shape) - (np.asarray(patch) - half)
    ok = np.all((pts >= half) & (pts < hi), axis=1)
    candidates = pts[ok]
    if not len(candidates):
        raise ValueError("no in-bounds SWC nodes for this patch size")
    rng = np.random.default_rng(seed)
    take = min(n, len(candidates))
    sel = rng.choice(len(candidates), size=take, replace=False)
    return candidates[sel]


def render(img, points, centers, patch, out_path, dilate=2):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(centers)
    fig, axes = plt.subplots(n, 2, figsize=(6, 3 * n), squeeze=False)
    for row, center in enumerate(centers):
        raw = img_io.get_patch(img, tuple(int(c) for c in center), patch)
        start = [int(c) - p // 2 for c, p in zip(center, patch)]
        mask = make_skeleton_mask(points, start, patch, dilate=dilate)
        rp = raw.max(axis=0).astype(float)
        rp = rp / max(rp.max(), 1)
        mp = mask.max(axis=0).astype(float)
        axes[row][0].imshow(rp, cmap="gray")
        axes[row][0].set_title(f"raw @ {tuple(int(c) for c in center)}")
        rgb = np.stack([rp] * 3, axis=-1)
        rgb[..., 0] = np.clip(rgb[..., 0] + 0.6 * mp, 0, 1)
        axes[row][1].imshow(rgb)
        axes[row][1].set_title("skeleton overlay")
        for ax in axes[row]:
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)
    return out_path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--img", required=True)
    p.add_argument("--swc", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=6)
    p.add_argument("--patch", type=int, nargs=3, default=(64, 64, 64))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    img = img_io.read(args.img)
    traces = Reader().read(args.swc)
    points = np.concatenate(
        [to_voxels(d["xyz"]) for d in traces.values()], axis=0
    )
    shape = img.shape[-3:]
    centers = pick_examples(
        points, shape, tuple(args.patch), args.n, seed=args.seed
    )
    render(img, points, centers, tuple(args.patch), args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
