"""SSIM / PSNR / MAE device-metric tests, incl. uint16-overflow parity."""

import numpy as np
from numpy.testing import assert_allclose
from scipy.ndimage import uniform_filter as scipy_uniform

from exaspim_tpu.ops.ssim import compute_lmax, compute_mae, psnr, ssim3d
from phantoms import smooth_blob


def _ssim3d_float64(img1, img2, data_range=None, window_size=16):
    """Host float64 oracle with the reference's exact formula."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    if data_range is None:
        data_range = max(img1.max() - img1.min(), img2.max() - img2.min())
    mu1 = scipy_uniform(img1, window_size, mode="reflect")
    mu2 = scipy_uniform(img2, window_size, mode="reflect")
    s1 = scipy_uniform(img1**2, window_size, mode="reflect") - mu1**2
    s2 = scipy_uniform(img2**2, window_size, mode="reflect") - mu2**2
    s12 = scipy_uniform(img1 * img2, window_size, mode="reflect") - mu1 * mu2
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu1 * mu2 + c1) * (2 * s12 + c2)
    den = (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    return float(np.mean(num / (np.maximum(den, 1e-8) + 1e-6)))


def test_identical_images_ssim_one():
    img = smooth_blob(seed=7)
    assert float(ssim3d(img, img)) > 0.9999


def test_ssim_matches_float64_oracle():
    a = smooth_blob(seed=8)
    b = a + np.random.default_rng(9).normal(0, 50, a.shape)
    got = float(ssim3d(a, b))
    want = _ssim3d_float64(a, b)
    assert_allclose(got, want, atol=5e-3)


def test_ssim_uint16_inputs_no_overflow():
    a = (smooth_blob(seed=10) * 10).astype(np.uint16)
    b = (a.astype(np.float64) * 0.97).astype(np.uint16)
    got = float(ssim3d(a, b))
    want = _ssim3d_float64(a, b)
    assert_allclose(got, want, atol=5e-3)


def test_ssim_decreases_with_noise():
    a = smooth_blob(seed=11)
    rng = np.random.default_rng(12)
    s_low = float(ssim3d(a, a + rng.normal(0, 10, a.shape)))
    s_high = float(ssim3d(a, a + rng.normal(0, 200, a.shape)))
    assert s_low > s_high


def test_psnr_and_mae_lmax():
    a = np.full((8, 8, 8), 100.0)
    b = a + 10.0
    assert_allclose(float(compute_mae(a, b)), 10.0)
    assert_allclose(float(compute_lmax(a, b)), 10.0)
    assert float(psnr(a, a)) > 100.0
    assert float(psnr(a, b)) < float(psnr(a, a))
