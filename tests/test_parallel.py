"""Multi-chip tests on the 8-device virtual CPU mesh.

The TPU analogue of "multi-node without a cluster" (SURVEY §4): spatial
sharding with ICI halo exchange must reproduce the single-device
overlap-average bit-for-bit (up to float reassociation), and the
data-parallel train step must match the single-device step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exaspim_tpu.inference import predict
from exaspim_tpu.models import UNet
from exaspim_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    plan_shards,
    predict_sharded,
    shard_batch,
)
from exaspim_tpu.train import create_train_state, make_train_step
from exaspim_tpu.transforms import build_transform

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = [pytest.mark.slow, pytest.mark.medium]


TCFG = {"kind": "linear", "params": {"mn": 0.0, "mx": 1000.0, "clip": 8.0}}


class DoublePlusOne:
    def apply(self, variables, x):
        return x * 2.0 + 0.01


def test_mesh_helpers():
    mesh = make_mesh(4, axis="z")
    assert mesh.devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(100)


def test_plan_shards_covers_all_patches():
    lstarts, gstarts, n_max = plan_shards(64, 4, 16, 4, (64, 36, 33))
    from exaspim_tpu.inference import generate_patch_starts

    all_starts = generate_patch_starts((64, 36, 33), 16, 4)
    seen = {tuple(s) for shard in gstarts for s in shard}
    assert {tuple(s) for s in all_starts} <= seen
    # local z-coords stay within the haloed slab [0, core + 2*halo)
    assert lstarts[..., 0].min() >= 0
    assert lstarts[..., 0].max() + 16 <= 64 // 4 + 2 * 16
    with pytest.raises(ValueError):
        plan_shards(63, 4, 16, 4, (63, 36, 33))


def test_sharded_equals_single_device_known_function():
    t = build_transform(TCFG)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 900, (64, 36, 33)).astype(np.uint16)
    single = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True,
    )
    mesh = make_mesh(4, axis="z")
    shd = predict_sharded(
        img, DoublePlusOne(), {}, t, mesh, patch_size=16, overlap=4,
        trim=2, batch_size=4, return_float=True,
    )
    np.testing.assert_allclose(shd, single, atol=1e-3)


def test_sharded_auto_patch_matches_explicit():
    """predict_sharded patch_size='auto' plans on the per-chip slab."""
    t = build_transform(TCFG)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 900, (64, 36, 33)).astype(np.uint16)
    mesh = make_mesh(4, axis="z")
    # Per-chip slab (16, 36, 33) → fallback patch 16, batch 1.
    auto = predict_sharded(
        img, DoublePlusOne(), {}, t, mesh, patch_size="auto", overlap=4,
        trim=2, return_float=True,
    )
    explicit = predict_sharded(
        img, DoublePlusOne(), {}, t, mesh, patch_size=16, overlap=4,
        trim=2, batch_size=1, return_float=True,
    )
    np.testing.assert_allclose(auto, explicit, atol=1e-5)


def test_sharded_equals_single_device_unet():
    t = build_transform(TCFG)
    m = UNet(width_multiplier=0.25)
    params = m.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))
    )["params"]
    rng = np.random.default_rng(1)
    img = rng.integers(0, 900, (32, 20, 18)).astype(np.uint16)
    single = predict(
        img, m, params, t, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True,
    )
    mesh = make_mesh(2, axis="z")
    shd = predict_sharded(
        img, m, params, t, mesh, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True,
    )
    # identical up to float reassociation across program structures
    np.testing.assert_allclose(shd, single, rtol=1e-4, atol=5e-3)


def test_dp_train_step_matches_single_device():
    m = UNet(width_multiplier=0.25)
    state_a = create_train_state(
        m, patch_shape=(8, 8, 8), lr=1e-3, total_steps=10, seed=0
    )
    state_b = create_train_state(
        m, patch_shape=(8, 8, 8), lr=1e-3, total_steps=10, seed=0
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.5, 0.1, (8, 8, 8, 8, 1)), jnp.float32)
    y = x * 0.7
    fg = jnp.asarray(rng.random((8, 8, 8, 8, 1)) < 0.2)

    single = make_train_step(fg_weight=5.0, donate=False)
    state_a, loss_a = single(state_a, x, y, fg)

    mesh = make_mesh(8, axis="data")
    dp = make_dp_train_step(mesh, fg_weight=5.0)
    xb, yb, fgb = shard_batch(mesh, (np.asarray(x), np.asarray(y),
                                     np.asarray(fg)))
    state_b, loss_b = dp(state_b, xb, yb, fgb)

    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)
    for pa, pb in zip(
        jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)
    ):
        # AdamW's rsqrt amplifies float reassociation differences between
        # the sharded and unsharded programs; tolerance reflects that.
        np.testing.assert_allclose(
            np.asarray(pa), np.asarray(pb), rtol=2e-3, atol=1e-4
        )


def test_trainer_with_mesh(tmp_path):
    from exaspim_tpu.data import make_synthetic_cache
    from exaspim_tpu.data.cache import (
        CachedPatchDataset,
        CachedValidateDataset,
    )
    from exaspim_tpu.train import Trainer

    tcfg = {"kind": "asinh", "params": {"offset": 100.0, "scale": 50.0}}
    train_dir = make_synthetic_cache(
        str(tmp_path / "train"), 8, (8, 8, 8), tcfg, seed=1
    )
    val_dir = make_synthetic_cache(
        str(tmp_path / "val"), 2, (8, 8, 8), tcfg, seed=2
    )
    mesh = make_mesh(8, axis="data")
    trainer = Trainer(
        tmp_path, UNet(width_multiplier=0.25),
        build_transform(tcfg), epochs=1, batch_size=8, val_every=1,
        tensorboard=False, keep_mips=0, mesh=mesh,
    )
    state = trainer.run(
        CachedPatchDataset(train_dir), CachedValidateDataset(val_dir)
    )
    assert state.step == 1


def test_initialize_multihost_solo_noop(monkeypatch):
    """With no coordinator configured, the call is a safe no-op."""
    from exaspim_tpu.parallel import initialize_multihost, is_primary

    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert initialize_multihost() is False
    # A single-entry worker list (the 1-chip harness sets
    # TPU_WORKER_HOSTNAMES=localhost) is still a solo run.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize_multihost() is False
    assert is_primary()
