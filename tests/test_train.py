"""Training-layer tests: jitted steps, checkpoints, Trainer end-to-end.

Mirrors the reference's trainer/checkpoint assertions (reference
tests/test_full_cache_training.py, test_train_bm4dnet.py:172-201) on the
TPU framework: loss decreases on a learnable toy problem, checkpoints
round-trip {params, model_config, transform}, resume rejects transform
and model-config mismatches, score-ranked filenames parse.
"""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from exaspim_tpu.data import make_synthetic_cache
from exaspim_tpu.data.cache import CachedPatchDataset, CachedValidateDataset
from exaspim_tpu.models import UNet
from exaspim_tpu.train import (
    Trainer,
    checkpoint_filename,
    create_train_state,
    find_best_checkpoint,
    load_checkpoint,
    make_eval_step,
    make_train_step,
    restore_pipeline,
    save_checkpoint,
)
from exaspim_tpu.transforms import build_transform

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow


TCFG = {"kind": "asinh", "params": {"offset": 100.0, "scale": 50.0}}
SMALL = dict(width_multiplier=0.25)


def test_train_step_reduces_loss():
    model = UNet(**SMALL)
    state = create_train_state(
        model, patch_shape=(8, 8, 8), lr=3e-3, total_steps=30
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.5, 0.1, (4, 8, 8, 8, 1)), jnp.float32)
    y = x * 0.5
    fg = jnp.zeros(x.shape, bool)
    step = make_train_step(fg_weight=0.0, donate=False)
    _, loss0 = step(state, x, y, fg)
    for _ in range(30):
        state, loss = step(state, x, y, fg)
    assert float(loss) < float(loss0)


def test_eval_step_returns_prediction():
    model = UNet(**SMALL)
    state = create_train_state(model, patch_shape=(8, 8, 8))
    x = jnp.full((2, 8, 8, 8, 1), 0.3)
    loss, pred = make_eval_step()(state, x, x, jnp.zeros(x.shape, bool))
    assert pred.shape == x.shape
    assert np.isfinite(float(loss))


def test_checkpoint_roundtrip(tmp_path):
    model = UNet(**SMALL)
    state = create_train_state(model, patch_shape=(8, 8, 8))
    t = build_transform(TCFG)
    path = os.path.join(tmp_path, checkpoint_filename(7, -1.25))
    save_checkpoint(
        path, state.params, model.config, t.cfg, step=7, score=-1.25
    )
    ckpt = load_checkpoint(path)
    assert ckpt["model_config"] == model.config
    assert ckpt["transform"] == t.cfg
    assert ckpt["step"] == 7 and ckpt["score"] == -1.25

    model2, params2, t2 = restore_pipeline(path, dtype=jnp.float32)
    x = jnp.full((1, 8, 8, 8, 1), 0.4)
    y1 = model.apply({"params": state.params}, x)
    y2 = model2.apply({"params": params2}, x)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y2), atol=1e-6
    )
    assert t2.cfg == t.cfg


def test_find_best_checkpoint_negative_aware(tmp_path):
    for step, score in [(1, 2.5), (2, -19.965923), (3, 0.0)]:
        open(os.path.join(
            tmp_path, checkpoint_filename(step, score, date="20260816")
        ), "w").close()
    best = find_best_checkpoint(tmp_path)
    assert "-19.965923" in best
    with pytest.raises(FileNotFoundError):
        find_best_checkpoint(os.path.join(tmp_path, "empty"))


@pytest.fixture(scope="module")
def tiny_caches(tmp_path_factory):
    root = tmp_path_factory.mktemp("caches")
    train_dir = make_synthetic_cache(
        os.path.join(root, "train"), 8, (16, 16, 16), TCFG, seed=1
    )
    val_dir = make_synthetic_cache(
        os.path.join(root, "val"), 4, (16, 16, 16), TCFG, seed=2
    )
    return train_dir, val_dir


def test_trainer_end_to_end(tmp_path, tiny_caches):
    train_dir, val_dir = tiny_caches
    train_ds = CachedPatchDataset(train_dir)
    val_ds = CachedValidateDataset(val_dir)
    t = build_transform(TCFG)
    trainer = Trainer(
        tmp_path, UNet(**SMALL), t, lr=1e-3, epochs=2, batch_size=4,
        val_every=2, seed=42, tensorboard=False, keep_mips=2,
    )
    trainer.run(train_ds, val_ds)

    # config.json records the run.
    cfg_path = os.path.join(trainer.session_dir, "config.json")
    assert os.path.exists(cfg_path)
    import json

    cfg = json.load(open(cfg_path))
    assert cfg["transform"] == t.cfg
    assert cfg["seed"] == 42
    assert cfg["model_config"]["model"] == "UNet"
    assert cfg["loss_eps"] == 1e-3  # default recorded for reproducibility

    # Scored checkpoints exist and parse.
    ckpts = glob.glob(os.path.join(trainer.ckpt_dir, "*.ckpt"))
    assert ckpts
    best = find_best_checkpoint(trainer.ckpt_dir)
    ckpt = load_checkpoint(best)
    assert "val_cratio" in ckpt["extra"]["metrics"]
    # MIPs went to the session dir, not CWD.
    assert glob.glob(os.path.join(trainer.mip_dir, "*.png"))


def test_validate_device_matches_host_oracle(tmp_path, tiny_caches):
    """The device-batched validation path (ops/metrics_device + cratio
    proxy, only scalars cross to host) must agree with the per-example
    host-oracle loop it replaced as the trainer default."""
    from exaspim_tpu.data.loader import DataLoader, make_count_val_collate

    _, val_dir = tiny_caches
    val_ds = CachedValidateDataset(val_dir)
    t = build_transform(TCFG)
    model = UNet(**SMALL)
    trainer = Trainer(
        tmp_path, model, t, batch_size=4, tensorboard=False, keep_mips=1,
    )
    state = create_train_state(
        model, patch_shape=(16, 16, 16), lr=1e-3, total_steps=4, seed=0
    )
    eval_step = make_eval_step(0.0, transform=t)
    loader = DataLoader(val_ds, 4, make_count_val_collate())
    dev = trainer.validate(state, eval_step, loader, step=1)
    host = trainer._validate_host(state, eval_step, loader, step=1)
    # All 4 examples fall inside exact_cratio_examples → the exact
    # blosc anchor is identical byte-for-byte.
    assert dev["val_cratio"] == pytest.approx(host["val_cratio"], rel=1e-6)
    assert dev["val_cratio_proxy"] > 0
    for k in ("val_loss", "val_fg_mae", "val_bg_mae", "val_top_pct_error",
              "val_mip_max_error", "val_false_bright_rate",
              "val_top_pct_preservation"):
        assert dev[k] == pytest.approx(host[k], rel=1e-2, abs=1e-2), k
    assert dev["val_score"] == pytest.approx(host["val_score"], rel=1e-2)
    # MIPs still land in the session dir on the device path.
    assert glob.glob(os.path.join(trainer.mip_dir, "*.png"))


def test_trainer_rejects_transform_mismatch(tmp_path, tiny_caches):
    train_dir, _ = tiny_caches
    model = UNet(**SMALL)
    state = create_train_state(model, patch_shape=(16, 16, 16))
    t = build_transform(TCFG)
    path = os.path.join(tmp_path, checkpoint_filename(1, 0.0))
    save_checkpoint(path, state.params, model.config, t.cfg)

    other = build_transform(
        {"kind": "asinh", "params": {"offset": 0.0, "scale": 10.0}}
    )
    trainer = Trainer(
        tmp_path, model, other, epochs=1, tensorboard=False
    )
    trainer.load_pretrained_weights(path)
    with pytest.raises(ValueError, match="transform"):
        trainer.check_transform_cfg()


def test_trainer_rejects_model_config_mismatch(tmp_path):
    model = UNet(**SMALL)
    state = create_train_state(model, patch_shape=(8, 8, 8))
    t = build_transform(TCFG)
    path = os.path.join(tmp_path, checkpoint_filename(1, 0.0))
    save_checkpoint(path, state.params, model.config, t.cfg)

    bigger = Trainer(
        tmp_path, UNet(width_multiplier=0.5), t, tensorboard=False
    )
    with pytest.raises(ValueError, match="model_config"):
        bigger.load_pretrained_weights(path)


def test_full_state_resume(tmp_path, tiny_caches):
    """Elastic resume: params + optimizer + step restore exactly."""
    from exaspim_tpu.train import restore_train_state, save_train_state

    train_dir, val_dir = tiny_caches
    train_ds = CachedPatchDataset(train_dir)
    val_ds = CachedValidateDataset(val_dir)
    t = build_transform(TCFG)
    trainer = Trainer(
        tmp_path, UNet(**SMALL), t, lr=1e-3, epochs=1, batch_size=4,
        val_every=2, seed=42, tensorboard=False, keep_mips=0,
    )
    state = trainer.run(train_ds, val_ds)
    latest = os.path.join(trainer.ckpt_dir, "latest_state.ckpt")
    assert os.path.exists(latest)

    template = create_train_state(
        UNet(**SMALL), patch_shape=(16, 16, 16), lr=1e-3,
        total_steps=10, seed=42,
    )
    restored, meta = restore_train_state(latest, template)
    assert int(restored.step) == int(state.step)
    assert meta["transform"] == t.cfg
    for a, b in zip(
        __import__("jax").tree.leaves(state.params),
        __import__("jax").tree.leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Transform mismatch must reject.
    other = build_transform(
        {"kind": "asinh", "params": {"offset": 0.0, "scale": 9.0}}
    )
    bad = Trainer(
        tmp_path, UNet(**SMALL), other, epochs=1, tensorboard=False,
        keep_mips=0,
    )
    with pytest.raises(ValueError, match="transform"):
        bad.run(train_ds, val_ds, resume_state=latest)


def test_device_cache_matches_loader_path(tmp_path, tiny_caches):
    """HBM-resident training must reproduce the loader path: same
    permutation stream, same target rule, same transform placement."""
    import jax

    train_dir, val_dir = tiny_caches
    t = build_transform(TCFG)
    params = {}
    for mode in (False, True):
        trainer = Trainer(
            os.path.join(tmp_path, f"dc_{mode}"), UNet(**SMALL), t,
            lr=1e-3, epochs=2, batch_size=4, val_every=100, seed=7,
            tensorboard=False, keep_mips=0, device_cache=mode,
        )
        state = trainer.run(
            CachedPatchDataset(train_dir), CachedValidateDataset(val_dir)
        )
        params[mode] = jax.tree.map(np.asarray, state.params)
        import json

        cfg = json.load(
            open(os.path.join(trainer.session_dir, "config.json"))
        )
        assert cfg["device_cache"] is bool(mode)
    flat0 = jax.tree.leaves(params[False])
    flat1 = jax.tree.leaves(params[True])
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)


def test_device_cache_auto_gating(tmp_path, tiny_caches):
    """auto falls back to the loader when batches don't divide the
    cache (partial-batch parity) or the budget is exceeded; True with
    an undersized budget raises."""
    train_dir, val_dir = tiny_caches
    t = build_transform(TCFG)
    train_ds = CachedPatchDataset(train_dir)

    tr = Trainer(os.path.join(tmp_path, "a"), UNet(**SMALL), t,
                 epochs=1, batch_size=3, tensorboard=False)
    assert tr._resolve_device_cache(train_ds) == 0  # 8 % 3 != 0

    tr = Trainer(os.path.join(tmp_path, "b"), UNet(**SMALL), t,
                 epochs=1, batch_size=4, tensorboard=False,
                 device_cache_budget=1024)
    assert tr._resolve_device_cache(train_ds) == 0  # over budget

    # Forced + budget too small for even one batch must raise; forced
    # with room for at least a batch shards instead (see
    # test_device_cache_shard_rotation).
    tr = Trainer(os.path.join(tmp_path, "c"), UNet(**SMALL), t,
                 epochs=1, batch_size=4, tensorboard=False,
                 device_cache=True, device_cache_budget=1024)
    with pytest.raises(ValueError, match="one batch"):
        tr._resolve_device_cache(train_ds)

    tr = Trainer(os.path.join(tmp_path, "d"), UNet(**SMALL), t,
                 epochs=1, batch_size=4, tensorboard=False,
                 device_cache=False)
    assert tr._resolve_device_cache(train_ds) == 0


def test_device_cache_forced_raises_when_unhonorable(tmp_path, tiny_caches):
    """An explicit device_cache=True must raise — not silently stream —
    when the mode cannot be honored (live dataset, tiny dataset, mesh)."""
    train_dir, _ = tiny_caches
    t = build_transform(TCFG)
    train_ds = CachedPatchDataset(train_dir)

    class _Live:  # no _raw/_teacher/_fg arrays
        def __len__(self):
            return 100

    tr = Trainer(os.path.join(tmp_path, "live"), UNet(**SMALL), t,
                 epochs=1, batch_size=4, tensorboard=False,
                 device_cache=True)
    with pytest.raises(ValueError, match="live"):
        tr._resolve_device_cache(_Live())

    tr = Trainer(os.path.join(tmp_path, "small"), UNet(**SMALL), t,
                 epochs=1, batch_size=64, tensorboard=False,
                 device_cache=True)
    with pytest.raises(ValueError, match="smaller than batch_size"):
        tr._resolve_device_cache(train_ds)

    # auto mode stays silent on the same inputs
    tr = Trainer(os.path.join(tmp_path, "auto"), UNet(**SMALL), t,
                 epochs=1, batch_size=64, tensorboard=False,
                 device_cache="auto")
    assert tr._resolve_device_cache(train_ds) == 0
    assert tr._resolve_device_cache(_Live()) == 0


def test_upload_cache_chunked_matches_whole(tmp_path, tiny_caches):
    """The chunked streaming upload must produce the same device arrays
    as a plain concatenate, including across the chunk boundary; fg is
    skipped when the loss never reads it (fg_weight=0, the production
    operating point) and bit-packed when it does."""
    from exaspim_tpu.train.state import unpack_fg_bits

    train_dir, _ = tiny_caches
    t = build_transform(TCFG)
    ds = CachedPatchDataset(train_dir)
    tr = Trainer(os.path.join(tmp_path, "u"), UNet(**SMALL), t,
                 epochs=1, batch_size=4, tensorboard=False)
    tr._UPLOAD_CHUNK_BYTES = 3 * ds._raw[0][0].nbytes  # force chunking
    raw_dev, teacher_dev, fg_dev = tr._upload_cache(ds)
    np.testing.assert_array_equal(
        np.asarray(raw_dev), np.concatenate(ds._raw, axis=0))
    np.testing.assert_array_equal(
        np.asarray(teacher_dev), np.concatenate(ds._teacher, axis=0))
    assert fg_dev is None  # fg_weight=0: mask never occupies HBM

    tr2 = Trainer(os.path.join(tmp_path, "u2"), UNet(**SMALL), t,
                  epochs=1, batch_size=4, tensorboard=False,
                  fg_weight=20.0)
    tr2._UPLOAD_CHUNK_BYTES = 3 * ds._raw[0][0].nbytes
    _, _, fg_packed = tr2._upload_cache(ds)
    assert fg_packed.dtype == np.uint8
    np.testing.assert_array_equal(
        np.asarray(unpack_fg_bits(fg_packed, ds.patch_shape)),
        np.concatenate(ds._fg, axis=0),
    )

    # Row-ranged upload (the shard-rotation path) slices correctly
    # across the multi-dir boundary.
    raw_mid, teacher_mid, _ = tr._upload_cache(ds, 2, 7)
    np.testing.assert_array_equal(
        np.asarray(raw_mid), np.concatenate(ds._raw, axis=0)[2:7])


def test_device_cache_shard_rotation(tmp_path, tiny_caches):
    """A forced device cache bigger than the budget rotates shards:
    every patch is still visited each epoch and training completes."""
    import json

    train_dir, val_dir = tiny_caches
    t = build_transform(TCFG)
    ds = CachedPatchDataset(train_dir)
    # per-row resident bytes: raw + teacher (fg skipped at fg_weight=0)
    row_b = ds._raw[0][0].nbytes + ds._teacher[0][0].nbytes
    trainer = Trainer(
        os.path.join(tmp_path, "shards"), UNet(**SMALL), t, lr=1e-3,
        epochs=2, batch_size=2, val_every=100, seed=7,
        tensorboard=False, keep_mips=0, device_cache=True,
        device_cache_budget=4 * row_b + 1,  # 2 batches per shard
    )
    n_shards = trainer._resolve_device_cache(ds)
    assert n_shards == 2
    trainer.run(ds, CachedValidateDataset(val_dir))
    cfg = json.load(
        open(os.path.join(trainer.session_dir, "config.json"))
    )
    assert cfg["device_cache_shards"] == 2
    uploads = [
        json.loads(line)
        for line in open(os.path.join(trainer.session_dir, "log.jsonl"))
        if json.loads(line).get("event") == "device_cache_upload"
    ]
    rows = sorted(tuple(u["rows"]) for u in uploads)
    # 2 epochs x 2 shards, covering all 8 rows each epoch
    assert rows == [(0, 4), (0, 4), (4, 8), (4, 8)]


def test_full_state_every_throttles_resume_checkpoint(tmp_path,
                                                      tiny_caches):
    """full_state_every=N writes latest_state.ckpt on every Nth
    validation only (the full-state fetch dominates validation cycles
    on slow device-to-host links)."""
    train_dir, val_dir = tiny_caches
    t = build_transform(TCFG)
    trainer = Trainer(
        os.path.join(tmp_path, "fse"), UNet(**SMALL), t, lr=1e-3,
        epochs=3, batch_size=4, val_every=2, seed=7,
        tensorboard=False, keep_mips=0, full_state_every=3,
    )
    trainer.run(
        CachedPatchDataset(train_dir), CachedValidateDataset(val_dir)
    )
    latest = os.path.join(trainer.ckpt_dir, "latest_state.ckpt")
    scored = glob.glob(os.path.join(trainer.ckpt_dir, "BM4DNet-*.ckpt"))
    # 3 epochs x 2 steps/epoch at val_every=2 -> 3 validations: scored
    # checkpoints every time, the full state only on the 3rd.
    assert len(scored) == 3
    assert os.path.exists(latest)
    assert trainer._n_validations == 3
