"""Device-side compressibility proxy tests.

The proxy must (a) compute exact histograms (Pallas path parity vs the
scatter-add golden in interpret mode), and (b) rank volumes by
compressibility the same way the real blosc metric does.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from exaspim_tpu.compression import best_codec, compute_cratio
from exaspim_tpu.compression.proxy import (
    _histogram_jnp,
    byte_histogram,
    cratio_proxy,
)


def test_histogram_golden_matches_numpy():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 256, 10_000).astype(np.uint8)
    counts = np.asarray(_histogram_jnp(jnp.asarray(vals)))
    np.testing.assert_array_equal(
        counts, np.bincount(vals, minlength=256)
    )


def test_byte_histogram_cpu_path():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 256, (37, 41)).astype(np.uint8)
    counts = np.asarray(byte_histogram(jnp.asarray(vals),
                                       use_pallas=False))
    np.testing.assert_array_equal(
        counts, np.bincount(vals.ravel(), minlength=256)
    )


def test_proxy_constant_is_highly_compressible():
    const = jnp.full((64, 64, 64), 123, jnp.uint16)
    noise = jnp.asarray(
        np.random.default_rng(0).integers(0, 65535, (64, 64, 64)),
        jnp.uint16,
    )
    assert float(cratio_proxy(const)) > 50
    assert float(cratio_proxy(noise)) < 1.5


def test_proxy_ranks_like_blosc():
    """Spearman rank agreement with the exact chunked blosc metric."""
    rng = np.random.default_rng(2)
    codec = best_codec(clevel=6)
    vols = []
    for lam in (5, 40, 200, 1000, 4000):
        vols.append(
            (rng.poisson(lam, (64, 64, 64)) + 30).astype(np.uint16)
        )
    from scipy import ndimage

    vols.append(np.clip(ndimage.gaussian_filter(
        vols[2].astype(np.float32), 2.0
    ), 0, 65535).astype(np.uint16))
    exact = [compute_cratio(v, codec) for v in vols]
    est = [float(cratio_proxy(jnp.asarray(v))) for v in vols]
    exact_rank = np.argsort(np.argsort(exact))
    est_rank = np.argsort(np.argsort(est))
    # Perfect rank agreement on clearly separated compressibilities.
    assert np.abs(exact_rank - est_rank).max() <= 1
    # And the estimates are within a factor ~2 of the real ratios.
    ratio = np.asarray(est) / np.asarray(exact)
    assert (ratio > 0.4).all() and (ratio < 2.5).all()
