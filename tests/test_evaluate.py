"""Evaluator-harness tests (reference evaluate.py:34-251 parity)."""

import os

import jax.numpy as jnp
import numpy as np

from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
from exaspim_tpu.evaluate import SupervisedEvaluator, UnsupervisedEvaluator
from exaspim_tpu.models import UNet
from exaspim_tpu.train import checkpoint_filename, create_train_state, \
    save_checkpoint
from exaspim_tpu.transforms import build_transform
import pytest

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow


TCFG = {"kind": "asinh", "params": {"offset": 100.0, "scale": 50.0}}


def _ckpt(tmp_path):
    model = UNet(width_multiplier=0.25)
    state = create_train_state(model, patch_shape=(16, 16, 16))
    t = build_transform(TCFG)
    path = os.path.join(tmp_path, checkpoint_filename(3, -1.0))
    save_checkpoint(path, state.params, model.config, t.cfg, step=3)
    return path


def _block(seed, shape=(24, 24, 24)):
    clean, _ = neurite_phantom(shape, seed=seed)
    return noisy_observation(clean, seed=seed + 100)


def test_supervised_evaluator(tmp_path):
    blocks = {"b0": _block(0), "b1": _block(1)}
    ev = SupervisedEvaluator(
        blocks, os.path.join(tmp_path, "out"), patch_size=16,
        overlap=4, trim=2, batch_size=4,
    )
    df = ev.run(_ckpt(tmp_path))
    assert set(df["block_id"]) == {"b0", "b1"}
    assert (df["cratio_noisy"] > 1.0).all()
    # zero-init model = identity denoiser → ssim 1, same cratio
    assert (df["ssim"] > 0.99).all()
    assert os.path.exists(os.path.join(tmp_path, "out", "results.csv"))
    assert os.path.exists(
        os.path.join(tmp_path, "out", "b0_denoised_mips.png")
    )


def test_unsupervised_evaluator(tmp_path):
    vol = _block(2, (32, 32, 32))

    def read_patch(brain_id, voxel):
        z, y, x = voxel
        return vol[z:z + 16, y:y + 16, x:x + 16]

    ev = UnsupervisedEvaluator(
        read_patch, os.path.join(tmp_path, "u"), sigma_gt=20.0
    )
    ev.ingest_model(_ckpt(tmp_path))
    out = ev.run({
        ("val", "foreground", "b2"): [(0, 0, 0), (8, 8, 8)],
    }, offsets={"b2": 0})
    df = out[("val", "foreground", "b2")]
    assert len(df) == 2
    for col in ("cratio", "cratio_noise", "cratio_gt", "ssim_noise",
                "ssim_gt", "l1_gt", "lmax_gt"):
        assert col in df.columns
    assert os.path.exists(
        os.path.join(tmp_path, "u", "val_foreground_b2.csv")
    )
