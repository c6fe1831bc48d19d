"""Count-space validation metrics, masks, and the coherence artifact gate.

Host (numpy/scipy) implementations with semantics matching the reference
(reference: src/aind_exaspim_image_compression/machine_learning/metrics.py).
These run in the data layer (sampling-time gating, mask construction) where
the arrays live on host anyway. The TPU-resident batched variants used
inside the training loop live in :mod:`exaspim_tpu.ops.metrics_device`.

All metrics operate in raw count space (after a transform's inverse) so they
mean the same thing regardless of which intensity transform is used:
foreground fidelity is measured against the *raw* counts (preserve signal),
background cleanup against the BM4D *teacher* (clean like the teacher).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

# Weights for the checkpoint-selection score. cratio defaults to 0.0 so
# selection is purely fidelity-driven; raise it to trade fidelity for
# compression once the operating point is chosen (reference metrics.py:24).
DEFAULT_CHECKPOINT_WEIGHTS = {
    "fg_mae": 1.0,
    "bg_mae": 0.2,
    "top_pct_error": 0.5,
    "cratio": 0.0,
}


def robust_brightness_threshold(img, k=6.0):
    """Median + ``k`` robust standard deviations (1.4826 * MAD).

    The MAD-based scale estimate ignores the bright tail, so the threshold
    tracks the background/noise floor even when neurites are present.
    Shared by the foreground mask and the false-bright detector.
    """
    flat = np.asarray(img, dtype=np.float64).ravel()
    center = np.median(flat)
    scale = 1.4826 * np.median(np.abs(flat - center)) + 1e-6
    return float(center + k * scale)


def make_foreground_mask(raw, k=6.0, dilate=1):
    """Robust intensity foreground mask, dilated to cover neurite borders.

    Same selection semantics as reference metrics.py:32-61 (median +
    k*1.4826*MAD threshold, binary dilation).
    """
    mask = np.asarray(raw) > robust_brightness_threshold(raw, k=k)
    return ndimage.binary_dilation(mask, iterations=dilate) if dilate else mask


def _pearson(x, y):
    """Pearson r of two 1-D samples; NaN when undefined (n<2 or flat)."""
    if x.size < 2:
        return np.nan
    xc = x - x.mean()
    yc = y - y.mean()
    denom = np.sqrt((xc @ xc) * (yc @ yc))
    if denom < 1e-6 * x.size:
        return np.nan
    return float((xc @ yc) / denom)


def local_autocorr(raw, mask, lag=2):
    """Mean lag-``lag`` Pearson autocorrelation of masked voxels, per axis.

    Real neurites are PSF-blurred and stay correlated over 2-3 voxels;
    blocky artifacts decorrelate by lag 2 (same decision semantics as
    reference metrics.py:64-112; measured separation there: artifacts
    <= 0.30, neurites >= 0.53). Returns 1.0 (maximally coherent) when no
    axis yields a defined correlation, so callers never reject a segment
    on an undefined score.
    """
    vol = np.asarray(raw, dtype=np.float64)
    keep = np.asarray(mask, dtype=bool)
    per_axis = []
    for ax in range(vol.ndim):
        v = np.moveaxis(vol, ax, 0)
        k = np.moveaxis(keep, ax, 0)
        both = k[:-lag] & k[lag:]
        per_axis.append(_pearson(v[:-lag][both], v[lag:][both]))
    if not per_axis or np.all(np.isnan(per_axis)):
        return 1.0
    return float(np.nanmean(per_axis))


def highfreq_energy_fraction(raw, mask, smooth=None, smooth_sigma=1.0):
    """Fraction of masked variance living above a Gaussian low-pass.

    Salt-and-pepper artifacts land at ~0.6-0.8; smooth neurites at
    ~0.0-0.25 (same decision semantics as reference metrics.py:115-151).
    Returns 0.0 when the masked variance is degenerate.
    """
    vol = np.asarray(raw, dtype=np.float64)
    sel = np.asarray(mask, dtype=bool)
    low = ndimage.gaussian_filter(vol, sigma=smooth_sigma) if smooth is None else smooth
    total = np.var(vol[sel])
    if not np.isfinite(total) or total < 1e-12:
        return 0.0
    return float(np.var(vol[sel] - np.asarray(low)[sel]) / total)


def make_segmentation_mask(labels, dilate=0):
    """Foreground = labeled neurites only (labels > 0); dilation is opt-in.

    Bright non-neuronal structure is left for the teacher to denoise rather
    than preserved as raw counts (reference metrics.py:154-186).
    """
    mask = np.asarray(labels) > 0
    if dilate > 0:
        mask = ndimage.binary_dilation(mask, iterations=dilate)
    return mask


def patch_has_incoherent_segment(
    labels,
    raw,
    min_autocorr=0.4,
    max_highfreq_frac=0.35,
    min_segment_voxels=50,
    smooth_sigma=1.0,
    coherence_lag=2,
):
    """True if any scorable segment is a spatially incoherent artifact.

    A segment is rejected only when it fails BOTH tests — autocorrelation at
    ``coherence_lag`` below ``min_autocorr`` AND high-frequency energy
    fraction above ``max_highfreq_frac`` — so a thin-but-smooth neurite is
    not mistaken for an artifact. Segments under ``min_segment_voxels`` are
    ignored. Because the artifact corrupts the raw input itself, callers
    reject and resample the whole patch (reference metrics.py:189-260).
    """
    labels = np.asarray(labels)
    fg = labels > 0
    if not fg.any():
        return False
    raw = np.asarray(raw, dtype=np.float64)
    smooth = ndimage.gaussian_filter(raw, sigma=smooth_sigma)
    for lid in np.unique(labels[fg]):
        if lid == 0:
            continue
        seg = labels == lid
        if seg.sum() < min_segment_voxels:
            continue
        if local_autocorr(raw, seg, lag=coherence_lag) >= min_autocorr:
            continue
        if highfreq_energy_fraction(raw, seg, smooth=smooth) > max_highfreq_frac:
            return True
    return False


def make_skeleton_mask(points, start, patch_shape, dilate=2):
    """Rasterizes traced skeleton nodes in a patch, dilated to neurite radius.

    ``points`` are (N, 3) voxel coordinates in the brain volume; ``start`` is
    the patch's lower corner. Raw intensity is never consulted, so noise is
    not picked up (reference metrics.py:263-303).
    """
    start = np.asarray(start)
    stop = start + np.asarray(patch_shape)
    pts = np.asarray(points).reshape(-1, 3)
    inside = np.all((pts >= start) & (pts < stop), axis=1)
    mask = np.zeros(tuple(patch_shape), dtype=bool)
    local = (pts[inside] - start).astype(int)
    if local.size:
        mask[local[:, 0], local[:, 1], local[:, 2]] = True
    if dilate > 0:
        mask = ndimage.binary_dilation(mask, iterations=dilate)
    return mask


def foreground_background_mae(pred, ref, fg_mask):
    """Mean absolute error split by a foreground mask; empty side reports 0."""
    pred = np.asarray(pred, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    fg = np.asarray(fg_mask, dtype=bool)
    err = np.abs(pred - ref)
    fg_mae = float(err[fg].mean()) if fg.any() else 0.0
    bg_mae = float(err[~fg].mean()) if (~fg).any() else 0.0
    return fg_mae, bg_mae


def mip_max_error(pred, raw):
    """Absolute error between the global maxima of two images."""
    # int64 promotion: uint16 − uint16 wraps on overflow.
    return float(abs(
        np.max(pred).astype(np.int64) - np.max(raw).astype(np.int64)
    ))


def false_bright_rate(pred, raw, fg_mask, k=6.0):
    """Fraction of background voxels the model hallucinated above threshold.

    The threshold is the robust (median + k*1.4826*MAD) brightness of the
    *raw* image (reference metrics.py:352-381).
    """
    pred = np.asarray(pred, dtype=np.float64)
    bg = ~np.asarray(fg_mask, dtype=bool)
    if not bg.any():
        return 0.0
    return float(np.mean(pred[bg] > robust_brightness_threshold(raw, k=k)))


def evaluate_example(pred, raw, target, fg_mask, pct=0.1):
    """Full per-example metric dict in counts (reference metrics.py:384-424).

    Foreground fidelity vs raw; background cleanup vs teacher; top-``pct``%%
    brightness preservation; MIP max error; false-bright rate.
    """
    fg_mae, _ = foreground_background_mae(pred, raw, fg_mask)
    _, bg_mae = foreground_background_mae(pred, target, fg_mask)

    q = 100.0 - pct
    raw_top = float(np.percentile(np.asarray(raw, dtype=np.float64), q))
    pred_top = float(np.percentile(np.asarray(pred, dtype=np.float64), q))
    return {
        "fg_mae": fg_mae,
        "bg_mae": bg_mae,
        "top_pct_error": abs(pred_top - raw_top),
        "top_pct_preservation": pred_top / (raw_top + 1e-8),
        "mip_max_error": mip_max_error(pred, raw),
        "false_bright_rate": false_bright_rate(pred, raw, fg_mask),
    }


def checkpoint_score(metrics, cratio, weights=None):
    """Checkpoint-selection score, lower is better (reference metrics.py:427).

    Weighted fidelity terms minus ``weights['cratio'] * cratio``.
    """
    w = DEFAULT_CHECKPOINT_WEIGHTS if weights is None else weights
    return (
        w.get("fg_mae", 0.0) * metrics["fg_mae"]
        + w.get("bg_mae", 0.0) * metrics["bg_mae"]
        + w.get("top_pct_error", 0.0) * metrics["top_pct_error"]
        - w.get("cratio", 0.0) * cratio
    )
