"""BM4D denoiser tests: quality gates on synthetic phantoms.

The TPU equivalent of trusting the vendored C++ bm4d binary: golden
quality assertions on procedurally generated volumes (the reference's
phantom testing philosophy, reference tests/test_metrics.py) — BM4D must
beat both the identity and a Gaussian-smoothing baseline, preserve
structure, and behave sanely at sigma→0.
"""

import numpy as np
import pytest
from scipy import ndimage

from exaspim_tpu.ops.bm4d import bm4d, bm4d_stage
from tests.phantoms import tube_phantom

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow



def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


@pytest.fixture(scope="module")
def phantom():
    clean = tube_phantom((32, 32, 32), noise=0.0)
    noisy = tube_phantom((32, 32, 32), noise=30.0)
    return clean.astype(np.float32), noisy.astype(np.float32)


def test_bm4d_beats_noise_and_gaussian(phantom):
    clean, noisy = phantom
    den = np.asarray(bm4d(noisy, 30.0))
    e_noisy = _rmse(noisy, clean)
    e_gauss = _rmse(ndimage.gaussian_filter(noisy, 1.0), clean)
    e_bm4d = _rmse(den, clean)
    assert e_bm4d < e_noisy / 3
    assert e_bm4d < e_gauss


def test_two_stage_improves_on_stage_one(phantom):
    clean, noisy = phantom
    basic = np.asarray(bm4d(noisy, 30.0, two_stage=False))
    final = np.asarray(bm4d(noisy, 30.0, two_stage=True))
    assert _rmse(final, clean) <= _rmse(basic, clean) * 1.05


def test_structure_preserved(phantom):
    clean, noisy = phantom
    den = np.asarray(bm4d(noisy, 30.0))
    # The bright tube's mean intensity must survive denoising.
    tube = clean > clean.mean() + 2 * clean.std()
    assert abs(den[tube].mean() - clean[tube].mean()) < 0.15 * clean[
        tube
    ].mean()


def test_fast_profile_quality(phantom):
    """The step=4 "fast" operating point must stay near the default.

    With step == block the reference grid tiles exactly: the matcher's
    band matmuls become single-tile 128-wide contractions and the
    latency-bound gather/scatter row count drops 2.4×, measured ~2×
    end-to-end throughput on TPU (RESULTS.md round 4). The price is a
    bounded RMSE-gain cost — the −7 % figure comes from the RESULTS.md
    round-4b study on 96³/64³ phantoms at σ ∈ {16, 24}; this pin runs
    the module's 32³ CI phantom at σ=30 (a different operating point)
    and fails if the fast profile ever degrades materially past the
    documented trade.
    """
    clean, noisy = phantom
    den3 = np.asarray(bm4d(noisy, 30.0))
    den4 = np.asarray(bm4d(noisy, 30.0, step=4))
    e3, e4 = _rmse(den3, clean), _rmse(den4, clean)
    assert e4 < _rmse(noisy, clean) / 3  # still a strong denoiser
    assert e4 <= e3 * 1.2  # within ~20 % of the default's RMSE


def test_small_sigma_near_identity():
    rng = np.random.default_rng(0)
    vol = rng.normal(500.0, 5.0, (16, 16, 16)).astype(np.float32)
    den = np.asarray(bm4d(vol, 1e-3))
    # With a vanishing threshold nearly all coefficients are retained.
    assert _rmse(den, vol) < 2.0


def test_constant_volume_fixed_point():
    vol = np.full((16, 16, 16), 123.0, np.float32)
    den = np.asarray(bm4d(vol, 10.0))
    # Wiener shrinkage biases the DC coefficient by ~sigma²/coef² — a
    # relative error of order 1e-5 on a constant volume.
    np.testing.assert_allclose(den, vol, atol=0.01)


def test_output_shape_and_dtype(phantom):
    _, noisy = phantom
    den = bm4d_stage(noisy, noisy, 30.0, mode="hard")
    assert den.shape == noisy.shape
    assert den.dtype == np.float32
    with pytest.raises(ValueError):
        bm4d(np.zeros((4, 4)), 1.0)


def test_chunked_scatter_matches_single_chunk(phantom):
    """The z-chunked aggregation scatter (with its sliced ref ranges)
    must be exactly equivalent to one whole-volume scatter."""
    import importlib

    bm = importlib.import_module("exaspim_tpu.ops.bm4d")
    _, noisy = phantom
    one = np.asarray(bm4d_stage(noisy, noisy, 30.0, mode="hard"))
    orig = bm._SCATTER_CHUNK_BYTES
    try:
        bm._SCATTER_CHUNK_BYTES = 1e5  # force many small chunks
        bm.bm4d_stage.clear_cache()
        many = np.asarray(bm4d_stage(noisy, noisy, 30.0, mode="hard"))
    finally:
        bm._SCATTER_CHUNK_BYTES = orig
        bm.bm4d_stage.clear_cache()
    np.testing.assert_allclose(many, one, rtol=1e-6, atol=1e-4)


def test_agg_slices_matches_conv(phantom):
    """The static-slice col2im fold (the fast default) must agree with
    the one-shot conv formulation in both stage modes."""
    _, noisy = phantom
    for mode in ("hard", "wiener"):
        a = np.asarray(
            bm4d_stage(noisy, noisy, 30.0, mode=mode, agg="slices")
        )
        b = np.asarray(
            bm4d_stage(noisy, noisy, 30.0, mode=mode, agg="conv")
        )
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_dct4_kron_matches_separable():
    """The Kronecker 4D-DCT matrix equals the separable per-axis
    transform (and its transpose inverts it exactly)."""
    from exaspim_tpu.ops.bm4d import _dct4_matrix_np, _dct_matrix_np

    K, B = 5, 3
    rng = np.random.default_rng(0)
    g = rng.normal(size=(7, K, B, B, B)).astype(np.float32)
    mk, mb = _dct_matrix_np(K), _dct_matrix_np(B)
    sep = np.einsum("ij,rjabc->riabc", mk, g)
    sep = np.einsum("ij,rkjbc->rkibc", mb, sep)
    sep = np.einsum("ij,rkajc->rkaic", mb, sep)
    sep = np.einsum("ij,rkabj->rkabi", mb, sep)
    m4 = _dct4_matrix_np(K, B)
    kron = (g.reshape(7, -1) @ m4.T).reshape(sep.shape)
    np.testing.assert_allclose(kron, sep, rtol=1e-5, atol=1e-5)
    # Orthonormal: M4 @ M4.T = I, so coef @ M4 inverts.
    back = (kron.reshape(7, -1) @ m4).reshape(g.shape)
    np.testing.assert_allclose(back, g, rtol=1e-4, atol=1e-5)


def test_col2im_conv_matches_shifted_add():
    """The one-hot col2im conv kernel reproduces the naive
    out[v] = sum_delta rows[v - delta, flat(delta)] fold."""
    import jax
    import jax.numpy as jnp

    from exaspim_tpu.ops.bm4d import _col2im_kernel_np

    B = 3
    rz, ry, rx = 4, 5, 6
    Z, Y, X = rz + B - 1, ry + B - 1, rx + B - 1
    rng = np.random.default_rng(1)
    rows = rng.normal(size=(rz, ry, rx, B * B * B)).astype(np.float32)

    naive = np.zeros((Z, Y, X), np.float32)
    for dz in range(B):
        for dy in range(B):
            for dx in range(B):
                flat = (dz * B + dy) * B + dx
                naive[dz:dz + rz, dy:dy + ry, dx:dx + rx] += (
                    rows[..., flat]
                )

    conv = jax.lax.conv_general_dilated(
        jnp.asarray(rows)[None], jnp.asarray(_col2im_kernel_np(B)),
        window_strides=(1, 1, 1), padding=[(B - 1, B - 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0, ..., 0]
    np.testing.assert_allclose(np.asarray(conv), naive, rtol=1e-5,
                               atol=1e-5)


def test_factored_dct_matches_dense_kronecker():
    """The DCT-emitting patch conv + (K, K) group contraction must
    reproduce the dense (K*B^3)^2 Kronecker GEMM path exactly: the
    production transform is the factored form; the dense matrix is the
    oracle."""
    import jax
    import jax.numpy as jnp

    from exaspim_tpu.ops.bm4d import (
        _dct4_matrix_np,
        _dct_matrix_np,
        _patch_dct_kernel_np,
        _patch_kernel_np,
    )

    B, K = 4, 6
    rng = np.random.default_rng(5)
    vol = rng.normal(100.0, 20.0, (10, 11, 12)).astype(np.float32)

    def rows_of(kern):
        return jax.lax.conv_general_dilated(
            jnp.asarray(vol)[None, ..., None], jnp.asarray(kern),
            window_strides=(1, 1, 1), padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]

    raw = np.asarray(rows_of(_patch_kernel_np(B, 1)))
    dct = np.asarray(rows_of(_patch_dct_kernel_np(B, 1)))

    # Fake groups: K arbitrary row positions per reference.
    rz, ry, rx, _ = raw.shape
    idx = rng.integers(0, rz * ry * rx, size=(7, K))
    g_raw = raw.reshape(-1, B ** 3)[idx]  # (7, K, B^3)
    g_dct = dct.reshape(-1, B ** 3)[idx]

    m4 = _dct4_matrix_np(K, B)
    dense = (g_raw.reshape(7, -1) @ m4.T).reshape(7, K, B ** 3)
    mk = _dct_matrix_np(K)
    fact = np.einsum("lk,rkb->rlb", mk, g_dct)
    np.testing.assert_allclose(fact, dense, rtol=1e-4, atol=1e-3)

    # Inverse chain: K-transpose contraction then row @ m3 returns the
    # spatial rows.
    from exaspim_tpu.ops.bm4d import _kron3_matrix_np

    back_k = np.einsum("lk,rlb->rkb", mk, fact)
    back = back_k.reshape(-1, B ** 3) @ _kron3_matrix_np(B)
    np.testing.assert_allclose(
        back.reshape(7, K, B ** 3), g_raw, rtol=1e-4, atol=1e-3
    )


def test_sorted_aggregation_matches_scatter(phantom):
    """agg="sorted" (argsort + sorted segment-sum, the round-4 verdict's
    untried alternative) must equal the chunked-scatter default. On-chip
    it measured SLOWER (228 vs 203 ms two-stage at 128³, RESULTS.md
    round 5c) so the default stays "slices"; the option remains tested."""
    clean, noisy = phantom
    a = np.asarray(bm4d(noisy, 30.0, agg="slices"))
    b = np.asarray(bm4d(noisy, 30.0, agg="sorted"))
    np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-5)
