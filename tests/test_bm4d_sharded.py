"""Sharded BM4D equals the single-chip denoiser (virtual CPU mesh)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from exaspim_tpu.ops.bm4d import bm4d
from exaspim_tpu.parallel.bm4d_sharded import bm4d_halo, bm4d_sharded

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = [pytest.mark.slow, pytest.mark.medium]



def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("z",))


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(7)
    return rng.normal(300.0, 25.0, (48, 16, 16)).astype(np.float32)


def _oracle(vol, sigma, halo, **cfg):
    """Single-chip BM4D of the reflect-extended volume — the sharded
    op's exact specification (boundary chips reflect-fill their
    out-of-volume halo, so the whole volume behaves like the interior
    of a reflect-padded one)."""
    ext = np.pad(vol, ((halo, halo), (0, 0), (0, 0)), mode="reflect")
    return np.asarray(bm4d(ext, sigma, **cfg))[halo:-halo]


def test_two_stage_matches_single_chip(vol):
    ref = _oracle(vol, 25.0, bm4d_halo(search=5), search=5)
    got = np.asarray(
        bm4d_sharded(vol, 25.0, _mesh(2), search=5)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-2)
    # Away from the global z-ends the reflect extension is invisible:
    # the plain single-chip result matches there too.
    plain = np.asarray(bm4d(vol, 25.0, search=5))
    np.testing.assert_allclose(
        got[14:-14], plain[14:-14], rtol=1e-4, atol=1e-2
    )


def test_four_shards_single_stage():
    rng = np.random.default_rng(9)
    vol = rng.normal(300.0, 25.0, (60, 16, 16)).astype(np.float32)
    halo = bm4d_halo(search=5, two_stage=False)
    ref = _oracle(vol, 25.0, halo, search=5, two_stage=False)
    got = np.asarray(
        bm4d_sharded(
            vol, 25.0, _mesh(4), search=5, two_stage=False
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-2)


def test_halo_formula():
    # search 9, block 4: stage reach 2·(4+3) = 14, doubled, step-rounded.
    assert bm4d_halo() == 30
    assert bm4d_halo(two_stage=False) == 15
    assert bm4d_halo(search=5, step=3) == 21


def test_shard_validation(vol):
    with pytest.raises(ValueError, match="not divisible"):
        bm4d_sharded(vol[:47], 25.0, _mesh(2), search=5)
    with pytest.raises(ValueError, match="<= halo"):
        bm4d_sharded(vol, 25.0, _mesh(8), search=5)
