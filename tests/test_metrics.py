"""Metric, mask, and coherence-gate tests on synthetic phantoms.

Covers the same behavior matrix as the reference suite (signal/artifact
separation, gate flag/keep/empty/small cases, mask construction, per-metric
units, evaluate_example, checkpoint_score) plus host↔device parity for the
TPU-resident batched metrics.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from exaspim_tpu.ops import metrics as M
from exaspim_tpu.ops import metrics_device as MD
from phantoms import salt_pepper_block, smooth_blob


def _blob_and_labels():
    img = smooth_blob()
    labels = np.zeros(img.shape, dtype=np.int32)
    labels[16:32, 16:32, 16:32] = 1
    return img, labels


def _artifact_and_labels():
    img = salt_pepper_block()
    labels = np.zeros(img.shape, dtype=np.int32)
    labels[8:24, 8:24, 8:24] = 1
    return img, labels


class TestCoherenceGate:
    def test_metrics_separate_signal_from_noise(self):
        blob, blob_lab = _blob_and_labels()
        art, art_lab = _artifact_and_labels()
        ac_blob = M.local_autocorr(blob, blob_lab > 0)
        ac_art = M.local_autocorr(art, art_lab > 0)
        hf_blob = M.highfreq_energy_fraction(blob, blob_lab > 0)
        hf_art = M.highfreq_energy_fraction(art, art_lab > 0)
        assert ac_blob > 0.5 > ac_art
        assert hf_art > 0.5 > hf_blob

    def test_flags_patch_with_incoherent_segment(self):
        img, labels = _artifact_and_labels()
        assert M.patch_has_incoherent_segment(labels, img)

    def test_keeps_patch_with_coherent_segment(self):
        img, labels = _blob_and_labels()
        assert not M.patch_has_incoherent_segment(labels, img)

    def test_empty_labels_not_flagged(self):
        img, _ = _artifact_and_labels()
        assert not M.patch_has_incoherent_segment(np.zeros_like(img), img)

    def test_small_incoherent_segments_ignored(self):
        img, labels = _artifact_and_labels()
        small = np.zeros_like(labels)
        small[10:12, 10:12, 10:12] = 1  # 8 voxels < 50
        assert not M.patch_has_incoherent_segment(small, img)

    def test_undefined_autocorr_is_coherent(self):
        raw = np.zeros((8, 8, 8))
        assert M.local_autocorr(raw, np.zeros((8, 8, 8), bool)) == 1.0

    def test_degenerate_variance_hf_is_zero(self):
        raw = np.full((8, 8, 8), 7.0)
        mask = np.ones((8, 8, 8), bool)
        assert M.highfreq_energy_fraction(raw, mask) == 0.0


class TestMasks:
    def test_foreground_mask_flags_bright_block(self):
        img = np.full((32, 32, 32), 100.0)
        img[10:14, 10:14, 10:14] = 5000.0
        mask = M.make_foreground_mask(img)
        assert mask[11, 11, 11]
        assert not mask[0, 0, 0]
        # dilation grows the block by 1 voxel
        assert mask[9, 10, 10]

    def test_segmentation_mask_and_dilate(self):
        labels = np.zeros((10, 10, 10), dtype=np.int32)
        labels[5, 5, 5] = 3
        assert M.make_segmentation_mask(labels).sum() == 1
        assert M.make_segmentation_mask(labels, dilate=1).sum() == 7

    def test_skeleton_mask_marks_nodes(self):
        pts = np.array([[10, 10, 10], [10, 10, 11], [0, 0, 0]])
        mask = M.make_skeleton_mask(pts, start=(8, 8, 8), patch_shape=(8, 8, 8),
                                    dilate=0)
        assert mask[2, 2, 2] and mask[2, 2, 3]
        assert mask.sum() == 2  # out-of-patch node ignored

    def test_skeleton_mask_dilates_to_radius(self):
        pts = np.array([[4, 4, 4]])
        mask = M.make_skeleton_mask(pts, (0, 0, 0), (9, 9, 9), dilate=2)
        assert mask[4, 4, 4] and mask[2, 4, 4] and not mask[1, 4, 4]


class TestUnitMetrics:
    def test_foreground_background_mae(self):
        pred = np.array([[1.0, 2.0], [3.0, 4.0]])
        ref = np.zeros((2, 2))
        fg = np.array([[True, False], [False, False]])
        fg_mae, bg_mae = M.foreground_background_mae(pred, ref, fg)
        assert fg_mae == 1.0
        assert bg_mae == pytest.approx(3.0)

    def test_mae_empty_side_zero(self):
        pred = np.ones((2, 2))
        fg = np.ones((2, 2), bool)
        assert M.foreground_background_mae(pred, pred, fg)[1] == 0.0

    def test_mip_max_error(self):
        assert M.mip_max_error(np.array([5.0]), np.array([9.0])) == 4.0

    def test_false_bright_rate(self):
        raw = np.full((10, 10, 10), 100.0)
        raw += np.random.default_rng(0).normal(0, 5, raw.shape)
        pred = raw.copy()
        fg = np.zeros(raw.shape, bool)
        assert M.false_bright_rate(pred, raw, fg) == 0.0
        pred[0, 0, :] = 50000.0
        rate = M.false_bright_rate(pred, raw, fg)
        assert rate == pytest.approx(10 / 1000)


class TestEvaluateExample:
    def test_keys_and_perfect_preservation(self):
        raw = smooth_blob(seed=3)
        fg = M.make_foreground_mask(raw)
        out = M.evaluate_example(raw, raw, raw, fg)
        assert set(out) == {
            "fg_mae", "bg_mae", "top_pct_error", "top_pct_preservation",
            "mip_max_error", "false_bright_rate",
        }
        assert out["fg_mae"] == 0.0
        assert out["top_pct_preservation"] == pytest.approx(1.0, rel=1e-6)

    def test_attenuation_lowers_preservation(self):
        raw = smooth_blob(seed=4)
        fg = M.make_foreground_mask(raw)
        out = M.evaluate_example(raw * 0.5, raw, raw, fg)
        assert out["top_pct_preservation"] < 0.75
        assert out["fg_mae"] > 0

    def test_checkpoint_score_default_and_cratio(self):
        m = {"fg_mae": 2.0, "bg_mae": 10.0, "top_pct_error": 4.0}
        assert M.checkpoint_score(m, cratio=100.0) == pytest.approx(
            2.0 + 0.2 * 10.0 + 0.5 * 4.0
        )
        w = dict(M.DEFAULT_CHECKPOINT_WEIGHTS, cratio=10.0)
        assert M.checkpoint_score(m, 3.0, w) == pytest.approx(6.0 - 30.0)


class TestDeviceParity:
    def test_evaluate_batch_matches_host(self):
        raw = smooth_blob(seed=5).astype(np.float32)
        pred = (raw * 0.9 + 5).astype(np.float32)
        target = (raw * 0.95).astype(np.float32)
        fg = M.make_foreground_mask(raw)
        host = M.evaluate_example(pred, raw, target, fg)
        dev = MD.evaluate_batch(
            pred[None], raw[None], target[None], fg[None].astype(np.float32)
        )
        for key, val in host.items():
            assert_allclose(
                np.asarray(dev[key])[0], val, rtol=2e-3, atol=2e-3,
                err_msg=key,
            )

    def test_device_foreground_mask_matches_host(self):
        raw = salt_pepper_block(seed=6).astype(np.float32)
        host = M.make_foreground_mask(raw, dilate=0)
        dev = np.asarray(MD.foreground_mask(raw))
        assert (host == dev).mean() > 0.999
