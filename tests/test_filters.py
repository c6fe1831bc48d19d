"""Parity of device filters against scipy.ndimage (the host oracle)."""

import numpy as np
from numpy.testing import assert_allclose
from scipy import ndimage

from exaspim_tpu.ops import filters


RNG = np.random.default_rng(42)
VOL = RNG.normal(100.0, 25.0, (24, 20, 28)).astype(np.float32)


def test_gaussian_filter_matches_scipy():
    for sigma in (0.7, 1.0, 2.3):
        ours = np.asarray(filters.gaussian_filter(VOL, sigma))
        ref = ndimage.gaussian_filter(
            VOL.astype(np.float64), sigma=sigma, mode="reflect"
        )
        assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


def test_uniform_filter_matches_scipy_even_and_odd():
    for size in (3, 4, 7, 16):
        ours = np.asarray(filters.uniform_filter(VOL, size))
        ref = ndimage.uniform_filter(
            VOL.astype(np.float64), size=size, mode="reflect"
        )
        assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)


def test_binary_dilation_matches_scipy():
    mask = RNG.random((16, 17, 15)) > 0.97
    for iters in (1, 2, 3):
        ours = np.asarray(filters.binary_dilation(mask, iterations=iters))
        ref = ndimage.binary_dilation(mask, iterations=iters)
        assert (ours == ref).all()


def test_separable_filter_2d_input():
    img = RNG.normal(0, 1, (31, 33)).astype(np.float32)
    ours = np.asarray(filters.gaussian_filter(img, 1.5))
    ref = ndimage.gaussian_filter(img.astype(np.float64), 1.5, mode="reflect")
    assert_allclose(ours, ref, rtol=2e-4, atol=2e-3)
