"""Live-dataset tests on in-memory synthetic brains.

Exercises the reference's sampling semantics (reference
data_handling.py:88-1014) without any cloud backend: foreground-biased
draws, per-brain offset subtraction, annotation-mask hierarchy
(segmentation ∪ skeleton with robust fallback), the coherence-gate
resample loop, validation-pool fixity, and the init_datasets factory.
"""

import numpy as np
import pytest

from exaspim_tpu.data.live import TrainDataset, ValidateDataset, init_datasets
from tests.phantoms import salt_pepper_block, tube_phantom

PATCH = (16, 16, 16)


def _brain_volume(shape=(48, 48, 48), seed=0):
    return tube_phantom(shape, noise=20.0, seed=seed).astype(np.uint16)


def _dataset(**kw):
    kw.setdefault("patch_shape", PATCH)
    kw.setdefault("boundary_buffer", 0)
    kw.setdefault("check_incoherence", False)
    kw.setdefault("seed", 7)
    ds = TrainDataset(**kw)
    return ds


def test_sampling_requires_brains():
    with pytest.raises(RuntimeError):
        _dataset().sample_brain()


def test_interior_voxel_in_bounds():
    ds = _dataset()
    ds.ingest_brain("b1", _brain_volume())
    for _ in range(50):
        v = ds.sample_interior_voxel("b1")
        raw = ds.read_counts("b1", v)
        assert raw is not None and raw.shape == PATCH


def test_offset_subtraction():
    ds = _dataset()
    vol = np.full((32, 32, 32), 100, np.uint16)
    ds.ingest_brain("b1", vol, offset=37)
    raw = ds.read_counts("b1", (16, 16, 16))
    assert raw.max() == raw.min() == 63


def test_skeleton_sampling_and_mask():
    ds = _dataset(foreground_rate=1.0)
    vol = _brain_volume()
    # Straight trace along the tube axis (center of y/x).
    pts = np.stack([
        np.arange(8, 40),
        np.full(32, 24),
        np.full(32, 24),
    ], axis=-1)
    ds.ingest_brain("b1", vol, swc_source=None)
    ds.brains["b1"].swc_voxels = pts
    v = ds.sample_skeleton_voxel("b1")
    raw = ds.read_counts("b1", v)
    assert raw is not None
    mask = ds.skeleton_mask("b1", v)
    assert mask.shape == PATCH
    fg = ds.annotation_mask("b1", v, raw)
    assert fg.any()


def test_segmentation_mask_union_and_fallback():
    ds = _dataset()
    vol = _brain_volume()
    seg = np.zeros_like(vol, dtype=np.uint32)
    seg[20:28, 20:28, 20:28] = 5
    ds.ingest_brain("seg", vol, segmentation=seg)
    fg = ds.annotation_mask("seg", (24, 24, 24), ds.read_counts(
        "seg", (24, 24, 24)
    ))
    assert fg.any()
    # Fallback: no annotations at all → robust intensity mask.
    ds.ingest_brain("plain", vol)
    raw = ds.read_counts("plain", (24, 24, 24))
    fb = ds.annotation_mask("plain", (24, 24, 24), raw)
    assert fb.shape == PATCH


def test_coherence_gate_resamples_artifact_patches():
    # Brain whose segmentation marks a salt-and-pepper region: the gate
    # must reject patches centered there.
    vol = salt_pepper_block(
        (64, 64, 64), block=(12, 12, 12), origin=(26, 26, 26), seed=3
    ).astype(np.uint16)
    seg = np.zeros_like(vol, dtype=np.uint32)
    seg[26:38, 26:38, 26:38] = 9
    ds = _dataset(check_incoherence=True, foreground_rate=0.0,
                  max_resample_attempts=12)
    ds.ingest_brain("b1", vol, segmentation=seg)
    hits = 0
    for _ in range(10):
        _, voxel, raw = ds.sample_clean()
        seg_patch = ds._segmentation_patch("b1", voxel)
        from exaspim_tpu.ops.metrics import patch_has_incoherent_segment

        if patch_has_incoherent_segment(seg_patch, raw):
            hits += 1
    assert hits == 0


def test_getitem_returns_training_tuple():
    ds = _dataset(sigma_bm4d=20.0)
    ds.ingest_brain("b1", _brain_volume())
    raw, teacher, fg = ds[0]
    assert raw.shape == teacher.shape == fg.shape == PATCH
    assert raw.dtype == np.uint16 and teacher.dtype == np.uint16
    assert fg.dtype == bool
    # teacher is denoised: lower variance than raw in background
    assert teacher.astype(float).var() <= raw.astype(float).var()


def test_validate_pool_fixed_and_restores_rng():
    ds = _dataset(sigma_bm4d=20.0)
    ds.ingest_brain("b1", _brain_volume())
    before = ds.rng.bit_generator.state["state"]["state"]
    val = ValidateDataset(ds, n_examples=2, seed=5)
    after = ds.rng.bit_generator.state["state"]["state"]
    assert before == after  # train stream untouched
    assert len(val) == 2
    raw, teacher, counts, fg = val[0]
    np.testing.assert_array_equal(raw, counts)
    val2 = ValidateDataset(ds, n_examples=2, seed=5)
    np.testing.assert_array_equal(val[0][0], val2[0][0])


def test_init_datasets_factory_with_calibration():
    vol = _brain_volume()
    train, val, transform = init_datasets(
        [{"brain_id": "b1", "img": vol, "offset": 0}],
        patch_shape=PATCH,
        transform_cfg={
            "kind": "asinh",
            "params": {"scale": 50.0},
            "calibrate": {"offset": True},
        },
        calibrate=True,
        n_val_examples=1,
        boundary_buffer=0,
        check_incoherence=False,
        sigma_bm4d=20.0,
    )
    assert transform is not None
    assert transform.cfg["params"]["offset"] > 0  # calibrated black point
    assert len(val) == 1


def test_live_dataset_with_dataloader():
    """The live sampler must drive the DataLoader without a huge
    permutation (nominal epoch length, stochastic items)."""
    from exaspim_tpu.data import DataLoader, make_count_train_collate

    ds = _dataset(sigma_bm4d=20.0, samples_per_epoch=6)
    ds.ingest_brain("b1", _brain_volume())
    loader = DataLoader(
        ds, 3, make_count_train_collate(), shuffle=True, seed=0
    )
    assert len(loader) == 2
    batches = list(loader)
    assert len(batches) == 2
    x, y, fg = batches[0]
    assert x.shape == (3, *PATCH, 1) and x.dtype == np.uint16


def test_segmentation_sampler_requires_single_large_segment():
    # A patch full of tiny scattered segments must be rejected even when
    # the *total* labeled voxel count clears the threshold (reference
    # data_handling.py:637 counts per-segment volume).
    shape = (48, 48, 48)
    img = _brain_volume(shape)
    rng = np.random.default_rng(11)
    tiny = np.zeros(shape, np.uint32)
    coords = rng.integers(0, 48, size=(400, 3))
    tiny[coords[:, 0], coords[:, 1], coords[:, 2]] = (
        np.arange(1, 401, dtype=np.uint32)
    )  # 400 distinct 1-voxel segments: total 400 >> 50, max segment 1
    ds = _dataset(min_segmentation_volume=50)
    ds.ingest_brain("tiny", img, segmentation=tiny)
    assert ds.sample_segmentation_voxel("tiny", attempts=8) is None

    big = np.zeros(shape, np.uint32)
    big[20:28, 20:28, 20:28] = 1  # one 512-voxel segment
    ds2 = _dataset(min_segmentation_volume=50)
    ds2.ingest_brain("big", img, segmentation=big)
    assert ds2.sample_segmentation_voxel("big", attempts=64) is not None


def test_candidate_prefetch_is_submission_order_deterministic():
    import time

    img = _brain_volume()
    seg = np.zeros(img.shape, np.uint32)
    seg[8:40, 8:40, 8:40] = 1
    draws = []
    for _ in range(2):
        ds = _dataset(min_segmentation_volume=10)
        ds.ingest_brain("b", img, segmentation=seg)
        orig = ds._read_volume_patch

        def slow_read(vol, v, shape, _orig=orig):
            time.sleep(np.random.default_rng(abs(hash(v)) % 2**32)
                       .uniform(0, 0.01))
            return _orig(vol, v, shape)

        ds._read_volume_patch = slow_read
        draws.append([ds.sample_segmentation_voxel("b", attempts=8)
                      for _ in range(5)])
    assert draws[0] == draws[1]
