"""Streaming whole-volume pipeline tests: slab seams must be exact."""

import os

import numpy as np

from exaspim_tpu.inference import predict
from exaspim_tpu.pipeline import denoise_volume
from exaspim_tpu.transforms import build_transform
from exaspim_tpu.utils import img_io
import pytest

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow


TCFG = {"kind": "linear", "params": {"mn": 0.0, "mx": 1000.0, "clip": 8.0}}


class DoublePlusOne:
    def apply(self, variables, x):
        return x * 2.0 + 0.01


def test_streamed_equals_direct(tmp_path):
    t = build_transform(TCFG)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 900, (80, 24, 20)).astype(np.uint16)
    direct = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4,
    )
    streamed = denoise_volume(
        img, DoublePlusOne(), {}, t, slab_z=32, patch_size=16,
        overlap=4, trim=2, batch_size=4,
    )
    np.testing.assert_array_equal(streamed, direct)


def test_streamed_yx_supertiles_equal_direct(tmp_path):
    """max_block_voxels forces 3-axis super-tiling; seams stay exact."""
    t = build_transform(TCFG)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 900, (20, 72, 60)).astype(np.uint16)
    direct = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4,
    )
    streamed = denoise_volume(
        img, DoublePlusOne(), {}, t, slab_z=16, patch_size=16,
        overlap=4, trim=2, batch_size=4,
        max_block_voxels=20 * 60 * 60,
    )
    np.testing.assert_array_equal(streamed, direct)


def test_streamed_yx_zarr_to_zarr(tmp_path):
    """Zarr→Zarr with y/x super-tiles: per-tile writes reassemble."""
    t = build_transform(TCFG)
    rng = np.random.default_rng(4)
    img = rng.integers(0, 900, (20, 48, 40)).astype(np.uint16)
    in_path = os.path.join(tmp_path, "in_yx.zarr")
    out_path = os.path.join(tmp_path, "out_yx.zarr")
    img_io.write_zarr(img, in_path, chunks=(1, 1, 16, 16, 16))
    result = denoise_volume(
        in_path, DoublePlusOne(), {}, t, output_path=out_path,
        slab_z=16, patch_size=16, overlap=4, trim=2, batch_size=4,
        chunks=(1, 1, 16, 16, 16), max_block_voxels=20 * 44 * 40,
    )
    assert result == out_path
    direct = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4,
    )
    back = np.asarray(img_io.read(out_path))[0, 0]
    np.testing.assert_array_equal(back, direct)


def test_streamed_zarr_to_zarr(tmp_path):
    t = build_transform(TCFG)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 900, (48, 20, 18)).astype(np.uint16)
    in_path = os.path.join(tmp_path, "in.zarr")
    out_path = os.path.join(tmp_path, "out.zarr")
    img_io.write_zarr(img, in_path, chunks=(1, 1, 16, 16, 16))

    result = denoise_volume(
        in_path, DoublePlusOne(), {}, t, output_path=out_path,
        slab_z=16, patch_size=16, overlap=4, trim=2, batch_size=4,
        chunks=(1, 1, 16, 16, 16),
    )
    assert result == out_path
    direct = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4,
    )
    back = np.asarray(img_io.read(out_path))[0, 0]
    np.testing.assert_array_equal(back, direct)


def test_streamed_auto_patch_matches_explicit(tmp_path):
    """patch_size='auto' plans on the slab geometry and matches the
    equivalent explicit-patch run exactly (same global stride grid)."""
    t = build_transform(TCFG)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 900, (80, 40, 40)).astype(np.uint16)
    # (48, 40, 40) slab geometry fits no 64+ candidate → planner falls
    # back to the largest 16-multiple ≤ min(shape): patch 32, batch 1.
    auto = denoise_volume(
        img, DoublePlusOne(), {}, t, slab_z=48, patch_size="auto",
        overlap=4, trim=2,
    )
    explicit = denoise_volume(
        img, DoublePlusOne(), {}, t, slab_z=48, patch_size=32,
        overlap=4, trim=2, batch_size=1,
    )
    np.testing.assert_array_equal(auto, explicit)


def test_streamed_with_mesh_matches_single(tmp_path):
    from exaspim_tpu.parallel import make_mesh

    t = build_transform(TCFG)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 900, (96, 20, 18)).astype(np.uint16)
    single = denoise_volume(
        img, DoublePlusOne(), {}, t, slab_z=48, patch_size=16,
        overlap=4, trim=2, batch_size=4,
    )
    mesh = make_mesh(2, axis="z")
    sharded = denoise_volume(
        img, DoublePlusOne(), {}, t, slab_z=48, patch_size=16,
        overlap=4, trim=2, batch_size=4, mesh=mesh,
    )
    np.testing.assert_allclose(
        sharded.astype(int), single.astype(int), atol=1
    )
