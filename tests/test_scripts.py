"""Script-layer tests: precompute → train → evaluate end-to-end (tiny).

The TPU equivalent of the reference's script tests (reference
tests/test_precompute.py, test_train_bm4dnet.py): runs the actual CLI
entry points on synthetic data with miniature shapes, asserting the
cache contract, config provenance, checkpoint production, and the
evaluation results file.
"""

import glob
import json
import os
import sys

import numpy as np
import pytest

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)
sys.path.insert(0, SCRIPTS)

import precompute as precompute_script  # noqa: E402
import train_bm4dnet as train_script  # noqa: E402
import evaluate_bm4dnet as evaluate_script  # noqa: E402
import visualize_patches as viz_script  # noqa: E402

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow



TCFG = {"kind": "asinh", "params": {"offset": 100.0, "scale": 50.0}}


@pytest.fixture(scope="module")
def caches(tmp_path_factory):
    root = tmp_path_factory.mktemp("script_caches")
    train_dir = os.path.join(root, "train")
    val_dir = os.path.join(root, "val")
    precompute_script.precompute(
        train_dir, split="train", source="synthetic", n=6,
        patch=(16, 16, 16), sigma_bm4d=20.0, seed=42,
        transform_cfg=TCFG,
    )
    precompute_script.precompute(
        val_dir, split="val", source="synthetic", n=3,
        patch=(16, 16, 16), sigma_bm4d=20.0, seed=42,
        transform_cfg=TCFG,
    )
    return train_dir, val_dir


def test_precompute_contract_and_config(caches):
    train_dir, val_dir = caches
    for d, n in [(train_dir, 6), (val_dir, 3)]:
        raw = np.load(os.path.join(d, "raw.npy"), mmap_mode="r")
        assert raw.shape == (n, 16, 16, 16) and raw.dtype == np.uint16
        cfg = json.load(open(os.path.join(d, "config.json")))
        assert cfg["transform"] == TCFG
        assert cfg["seed"] == 42
        assert cfg["seed_stream"] in (0, 1)
        assert cfg["count_dtype"] == "uint16"
        tj = json.load(open(os.path.join(d, "transform.json")))
        assert tj == TCFG


def test_precompute_splits_differ(caches):
    train_dir, val_dir = caches
    a = np.load(os.path.join(train_dir, "raw.npy"))
    b = np.load(os.path.join(val_dir, "raw.npy"))
    assert not np.array_equal(a[:3], b)


def test_precompute_rejects_calibrating_transform(tmp_path):
    with pytest.raises(ValueError, match="calibrate"):
        precompute_script.precompute(
            os.path.join(tmp_path, "x"), n=1,
            transform_cfg={**TCFG, "calibrate": {"offset": True}},
        )


@pytest.fixture(scope="module")
def trained(caches, tmp_path_factory):
    train_dir, val_dir = caches
    out = tmp_path_factory.mktemp("run")
    trainer = train_script.train(
        [train_dir], [val_dir], str(out), epochs=1, batch_size=3,
        val_every=2, width_multiplier=0.25, bf16=False,
        max_val_examples=2,
    )
    return trainer


def test_train_resume_adopts_checkpoint_architecture(trained, caches,
                                                     tmp_path):
    """--resume with no explicit model config must build the model from
    the checkpoint's own model_config (e.g. fine-tuning a
    residual=False N2V run on teachers) so the weights always fit."""
    import glob as _glob

    train_dir, val_dir = caches
    ckpt = sorted(_glob.glob(os.path.join(trained.ckpt_dir, "*.ckpt")))[0]
    trainer = train_script.train(
        [train_dir], [val_dir], str(tmp_path), epochs=1, batch_size=3,
        val_every=10, width_multiplier=1.0,  # ignored: ckpt says 0.25
        bf16=False, max_val_examples=1, resume=ckpt,
    )
    assert trainer.model.config["width_multiplier"] == 0.25


def test_train_produces_scored_checkpoints(trained):
    ckpts = glob.glob(os.path.join(trained.ckpt_dir, "*.ckpt"))
    assert ckpts
    cfg = json.load(
        open(os.path.join(trained.session_dir, "config.json"))
    )
    assert cfg["transform"] == TCFG
    assert "train_cache" in cfg and "checkpoint_weights" in cfg
    assert cfg["checkpoint_weights"]["cratio"] == 10.0


def test_evaluate_end_to_end(trained, tmp_path):
    from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
    from exaspim_tpu.utils import img_io

    clean, _ = neurite_phantom((24, 24, 24), seed=9)
    img = noisy_observation(clean, seed=10)
    img_path = os.path.join(tmp_path, "vol.zarr")
    img_io.write_zarr(img, img_path, chunks=(1, 1, 8, 8, 8))

    out_dir = os.path.join(tmp_path, "eval")
    results = evaluate_script.evaluate(
        trained.ckpt_dir, img_path, out_dir, offset=0.0,
        patch_size=16, overlap=4, trim=2, batch_size=4,
        write_output=os.path.join(tmp_path, "denoised.ome.zarr"),
    )
    assert results["cratio_raw"] > 1.0
    assert os.path.exists(os.path.join(out_dir, "results.json"))
    assert os.path.exists(os.path.join(out_dir, "denoised_mips.png"))
    back = np.asarray(
        img_io.read(os.path.join(tmp_path, "denoised.ome.zarr"),
                    dataset="0")
    )
    assert back.shape[-3:] == img.shape


def test_visualize_patches_grid(caches, tmp_path):
    train_dir, _ = caches
    out = os.path.join(tmp_path, "grid.png")
    viz_script.main([
        "--cache", train_dir, "--out", out, "--n", "2",
    ])
    assert os.path.exists(out)


def test_estimate_background_offsets(tmp_path):
    import estimate_background_offsets as off_script

    from exaspim_tpu.utils import img_io

    vol = (np.full((32, 32, 32), 500, np.uint16))
    vol[:4] = 0  # zero-padding region
    path = os.path.join(tmp_path, "brain.ome.zarr")
    img_io.write_ome_zarr(vol, path, chunks=(1, 1, 16, 16, 16),
                          n_levels=2)
    cfg = os.path.join(tmp_path, "brains.json")
    json.dump([{"brain_id": "b1", "img": path}], open(cfg, "w"))
    out = os.path.join(tmp_path, "offsets.json")
    off_script.main([
        "--config", cfg, "--out", out, "--level", "1",
        "--percentile", "0.5",
    ])
    offsets = json.load(open(out))
    assert abs(offsets["b1"] - 500) < 200  # windowed mean blurs the edge


def test_visualize_swc_masks_script(tmp_path):
    import visualize_swc_masks as swc_script

    from exaspim_tpu.utils import img_io

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 500, (48, 48, 48)).astype(np.uint16)
    img_path = os.path.join(tmp_path, "vol.zarr")
    img_io.write_zarr(vol, img_path, chunks=(1, 1, 16, 16, 16))
    swc_dir = os.path.join(tmp_path, "swcs")
    os.makedirs(swc_dir)
    lines = ["# OFFSET 0 0 0"]
    for i in range(1, 20):
        # physical coords so that voxels land mid-volume
        lines.append(f"{i} 3 {i * 0.748 + 7.48} 17.952 20.0 1.0 {i - 1}")
    with open(os.path.join(swc_dir, "n.swc"), "w") as f:
        f.write("\n".join(lines))
    out = os.path.join(tmp_path, "masks.png")
    swc_script.main([
        "--img", img_path, "--swc", swc_dir, "--out", out,
        "--n", "2", "--patch", "16", "16", "16",
    ])
    assert os.path.exists(out)


def test_ckpt_quality_script(trained, capsys):
    import ckpt_quality as quality_script

    ckpt = sorted(
        glob.glob(os.path.join(trained.ckpt_dir, "*.ckpt"))
    )[0]
    quality_script.main([ckpt, "--block", "32"])
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
    ]
    assert "cratio_noisy" in lines[0]
    assert lines[1]["ckpt"] == ckpt
    assert lines[1]["cratio_gain"] > 0
