"""Config-system tests: JSON round-trip, typo rejection, defaults."""

import os

import pytest

from exaspim_tpu.config import EvaluateConfig, PrecomputeConfig, TrainConfig


def test_defaults_match_reference_operating_point():
    c = TrainConfig()
    assert c.batch_size == 32 and c.lr == 1e-3 and c.epochs == 50
    assert c.fg_weight == 0.0 and not c.preserve_foreground
    assert c.checkpoint_weights["cratio"] == 10.0
    p = PrecomputeConfig()
    assert tuple(p.patch) == (64, 64, 64) and p.sigma_bm4d == 24.0
    assert p.seed == 42 and p.check_incoherence


def test_json_roundtrip(tmp_path):
    c = TrainConfig(train_cache=["/a"], val_cache=["/b"], epochs=3)
    path = c.to_json(os.path.join(tmp_path, "cfg.json"))
    back = TrainConfig.from_json(path)
    assert back == c


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        TrainConfig.from_dict({"epcohs": 3})
    with pytest.raises(ValueError, match="unknown overrides"):
        EvaluateConfig().replace(clevle=7)


def test_replace_overrides():
    c = PrecomputeConfig().replace(n=99, split="val")
    assert c.n == 99 and c.split == "val"
    assert PrecomputeConfig().n == 500
