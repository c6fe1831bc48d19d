"""Model evaluation harnesses: supervised (saved blocks) and
unsupervised (vs live BM4D ground truth).

Capability parity with the reference evaluators (reference
evaluate.py:34-251): per-block compression ratios with noisy baselines,
3D SSIM, MAE / L∞ against BM4D ground truth, MIP plots, and CSV reports —
the quantitative harness the project uses to compare checkpoints.

TPU-native: model inference runs through the fused tiled engine
(:mod:`exaspim_tpu.inference`) and BM4D ground truth through the XLA
implementation (:mod:`exaspim_tpu.ops.bm4d`), so a full evaluation pass
stays on-device except for codec calls.
"""

from __future__ import annotations

import os

import numpy as np

from exaspim_tpu.compression import best_codec, compute_cratio
from exaspim_tpu.inference import predict, predict_patch
from exaspim_tpu.ops.ssim import compute_lmax, compute_mae, ssim3d
from exaspim_tpu.train.checkpoint import restore_pipeline
from exaspim_tpu.transforms import with_offset
from exaspim_tpu.utils.plots import plot_mips

__all__ = [
    "SupervisedEvaluator",
    "UnsupervisedEvaluator",
    "read_brain_ids",
    "read_voxels",
]


def _to_csv(rows, path):
    import pandas as pd

    df = pd.DataFrame(rows)
    df.to_csv(path, index=False)
    return df


class SupervisedEvaluator:
    """Evaluate checkpoints on a fixed set of noisy blocks
    (reference evaluate.py:34-124).

    ``blocks``: dict ``{block_id: ndarray}`` or list of ``(id, ndarray)``.
    """

    def __init__(self, blocks, output_dir, clevel=6, save_mips=True,
                 patch_size=64, overlap=12, trim=5, batch_size=32):
        if isinstance(blocks, dict):
            blocks = sorted(blocks.items())
        self.blocks = [(str(k), np.asarray(v)) for k, v in blocks]
        self.output_dir = os.fspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.codec = best_codec(clevel=clevel)
        self.save_mips = save_mips
        self.predict_kwargs = dict(
            patch_size=patch_size, overlap=overlap, trim=trim,
            batch_size=batch_size,
        )
        # Noisy baselines computed once.
        self.baseline = {
            k: compute_cratio(v, self.codec) for k, v in self.blocks
        }
        if save_mips:
            for k, v in self.blocks:
                plot_mips(v, os.path.join(
                    self.output_dir, f"{k}_noisy_mips.png"
                ))

    def run(self, ckpt_path, offset=None):
        """Evaluate one checkpoint over every block → DataFrame + CSV."""
        model, params, transform = restore_pipeline(ckpt_path)
        rows = []
        for block_id, noisy in self.blocks:
            t = transform if offset is None else with_offset(
                transform, offset
            )
            denoised = predict(
                noisy, model, params, t, **self.predict_kwargs
            )
            cr = compute_cratio(denoised, self.codec)
            ssim = float(ssim3d(
                noisy.astype(np.float32), denoised.astype(np.float32),
                data_range=float(noisy.max()),
            ))
            rows.append({
                "block_id": block_id,
                "cratio_noisy": self.baseline[block_id],
                "cratio": cr,
                "cratio_gain": round(cr / self.baseline[block_id], 3),
                "ssim": round(ssim, 5),
            })
            if self.save_mips:
                plot_mips(denoised, os.path.join(
                    self.output_dir, f"{block_id}_denoised_mips.png"
                ))
        return _to_csv(
            rows, os.path.join(self.output_dir, "results.csv")
        )


class UnsupervisedEvaluator:
    """Evaluate against live BM4D ground truth at sampled voxels
    (reference evaluate.py:126-239).

    ``dataset``: a live or cached dataset exposing ``read_counts`` /
    patch access; here any callable ``read_patch(brain_id, voxel)`` →
    raw counts works.
    """

    def __init__(self, read_patch, output_dir, sigma_gt=10.0, clevel=6):
        self.read_patch = read_patch
        self.output_dir = os.fspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.sigma_gt = float(sigma_gt)
        self.codec = best_codec(clevel=clevel)
        self._model = None

    def ingest_model(self, ckpt_path):
        """Load the checkpoint (model + params + transform) to evaluate."""
        self._model = restore_pipeline(ckpt_path)

    def run(self, voxel_lists, offsets=None):
        """``voxel_lists``: {(split, kind, brain_id): [(z, y, x), …]}.
        Writes one CSV per key; returns {key: DataFrame}."""
        assert self._model is not None, "call ingest_model first"
        out = {}
        for key, voxels in voxel_lists.items():
            split, kind, brain_id = key
            offset = (offsets or {}).get(brain_id, 0)
            rows = [
                self.compute_metrics(brain_id, tuple(v), offset)
                for v in voxels
            ]
            rows = [r for r in rows if r is not None]
            name = f"{split}_{kind}_{brain_id}.csv"
            out[key] = _to_csv(
                rows, os.path.join(self.output_dir, name)
            )
        return out

    def compute_metrics(self, brain_id, voxel, offset=0):
        """Per-voxel metric row (reference evaluate.py:172-217)."""
        from exaspim_tpu.ops.bm4d import bm4d

        model, params, transform = self._model
        noise = self.read_patch(brain_id, voxel)
        if noise is None:
            return None
        noise = np.asarray(noise)
        gt = np.clip(np.round(np.asarray(
            bm4d(noise.astype(np.float32), self.sigma_gt)
        )), 0, 65535).astype(np.uint16)
        t = with_offset(transform, offset) if offset else transform
        pred = predict_patch(noise, model, params, t)
        rng = float(noise.max())
        return {
            "brain_id": brain_id,
            "voxel": str(tuple(int(v) for v in voxel)),
            "cratio": compute_cratio(pred, self.codec),
            "cratio_noise": compute_cratio(noise, self.codec),
            "cratio_gt": compute_cratio(gt, self.codec),
            "ssim_noise": round(float(ssim3d(
                noise.astype(np.float32), pred.astype(np.float32),
                data_range=rng,
            )), 5),
            "ssim_gt": round(float(ssim3d(
                gt.astype(np.float32), pred.astype(np.float32),
                data_range=rng,
            )), 5),
            "l1_gt": round(float(compute_mae(pred, gt)), 3),
            "lmax_gt": round(float(compute_lmax(pred, gt)), 3),
        }


def read_brain_ids(data_dir, is_test=True):
    """Cohort brain-id list JSON (reference evaluate.py:240-243)."""
    import json

    name = "test" if is_test else "train"
    with open(os.path.join(data_dir, f"{name}_brain_ids.json")) as f:
        return json.load(f)


def read_voxels(data_dir, brain_id, is_foreground=True):
    """Voxel-tuple CSV for one brain; empty list when absent
    (reference evaluate.py:245-251)."""
    import ast

    import pandas as pd

    kind = "foreground" if is_foreground else "background"
    path = os.path.join(data_dir, f"{kind}-{brain_id}.csv")
    try:
        return list(pd.read_csv(path)["voxels"].apply(ast.literal_eval))
    except FileNotFoundError:
        return []
