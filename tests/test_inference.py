"""Tiled-inference tests: grid math, stitching, trim, odd shapes.

The reference has no dedicated inference tests; these cover the
equivalent surface (reference inference.py:28-252) plus the TPU
framework's full-coverage guarantee (boundary-aware trim — a reference
defect fix, see inference.py module docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exaspim_tpu.inference import (
    build_volume_transform,
    count_patches,
    generate_patch_starts,
    predict,
    predict_patch,
)
from exaspim_tpu.models import UNet
from exaspim_tpu.transforms import build_transform

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow


TCFG = {"kind": "linear", "params": {"mn": 0.0, "mx": 1000.0, "clip": 8.0}}


class DoublePlusOne:
    """Minimal stand-in model: local, shape-preserving, known output."""

    def apply(self, variables, x):
        return x * 2.0 + 0.01


@pytest.fixture(scope="module")
def small_unet():
    m = UNet(width_multiplier=0.25)
    params = m.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))
    )["params"]
    return m, params


def test_patch_grid_matches_reference_semantics():
    # stride = patch − overlap; ranges go to dim − patch + stride
    starts = generate_patch_starts((128, 128, 128), 64, 12)
    per_axis = sorted({s[0] for s in starts})
    assert per_axis == [0, 52, 104]
    assert len(starts) == 27
    assert count_patches((128, 128, 128), 64, 12) == 27


def test_predict_known_function_full_coverage():
    t = build_transform(TCFG)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 900, (40, 36, 33)).astype(np.uint16)
    out = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True,
    )
    # Every voxel — including the leading trim faces — must equal the
    # analytic result: inverse(2*forward(x)+0.01).
    expect = t.inverse_float(2.0 * t.forward(img.astype(np.float32)) + 0.01)
    np.testing.assert_allclose(out, expect, atol=0.01)


def test_predict_uint16_output(small_unet):
    m, params = small_unet
    t = build_transform(TCFG)
    img = np.random.default_rng(1).integers(
        0, 900, (20, 18, 17)
    ).astype(np.uint16)
    out = predict(
        img, m, params, t, patch_size=16, overlap=4, trim=2, batch_size=4
    )
    assert out.shape == img.shape and out.dtype == np.uint16


def test_predict_5d_input_and_small_volume_error(small_unet):
    m, params = small_unet
    t = build_transform(TCFG)
    img = np.zeros((1, 1, 20, 20, 20), np.uint16)
    out = predict(
        img, m, params, t, patch_size=16, overlap=4, trim=2, batch_size=4
    )
    assert out.shape == (20, 20, 20)
    with pytest.raises(ValueError, match="smaller than patch"):
        predict(np.zeros((8, 8, 8), np.uint16), m, params, t,
                patch_size=16)


def test_streaming_matches_in_memory():
    t = build_transform(TCFG)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 900, (64, 24, 20)).astype(np.uint16)
    full = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True,
    )
    streamed = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True, max_device_voxels=64 * 24 * 20 // 3,
    )
    np.testing.assert_allclose(streamed, full, atol=1e-4)


def test_streaming_yx_supertiles_match_in_memory():
    """y/x super-tiling (volume planes too big for the device budget)
    must reproduce the single-pass result bit-for-bit."""
    from exaspim_tpu.inference import plan_stream_cores

    t = build_transform(TCFG)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 900, (20, 72, 60)).astype(np.uint16)
    budget = 20 * 60 * 60  # < one full-plane slab of min height
    cores = plan_stream_cores(img.shape, 16, 4, budget)
    assert cores[1] < img.shape[1]  # y really splits
    full = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True,
    )
    streamed = predict(
        img, DoublePlusOne(), {}, t, patch_size=16, overlap=4, trim=2,
        batch_size=4, return_float=True, max_device_voxels=budget,
    )
    np.testing.assert_allclose(streamed, full, atol=1e-4)


def test_plan_stream_cores_axis_order():
    """Cores shrink z first, then y, then x; all stay >= patch."""
    from exaspim_tpu.inference import plan_stream_cores

    # Plenty of budget: no split at all.
    assert plan_stream_cores((64, 64, 64), 16, 4, 2**40) == (64, 64, 64)
    # Tight budget: every axis collapses toward the patch floor.
    cz, cy, cx = plan_stream_cores((200, 300, 400), 16, 4, 100 * 100 * 100)
    assert cz == 16 and cy == 16 and cx >= 16
    # Moderate budget: z splits first, y/x stay whole.
    cz, cy, cx = plan_stream_cores((512, 96, 96), 16, 4, 128 * 96 * 96)
    assert cz < 512 and cy == 96 and cx == 96


def test_predict_patch(small_unet):
    m, params = small_unet
    t = build_transform(TCFG)
    patch = np.full((16, 16, 16), 400, np.uint16)
    out = predict_patch(patch, m, params, t)
    assert out.shape == patch.shape and out.dtype == np.uint16


def test_build_volume_transform_prefers_offset():
    t = build_transform(TCFG)
    vt = build_volume_transform(t, offset=37.0)
    # linear kind folds the offset into the bounds
    assert vt.mn == 37.0 and vt.mx == 1037.0
    with pytest.raises(ValueError):
        build_volume_transform(t)
    img = np.full((8, 8, 8), 50, np.uint16)
    vt2 = build_volume_transform(t, img=img)
    assert vt2.mn == 50.0


def test_predict_output_clip_input_range():
    """output_clip="input" bounds the denoised counts by the observed
    input range — guards self-supervised models against transform-domain
    overshoot exploding through an asinh-type inverse."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from exaspim_tpu.inference import predict
    from exaspim_tpu.models import UNet
    from exaspim_tpu.transforms import build_transform

    model = UNet(width_multiplier=0.25, head_init="normal",
                 residual=False, blocked="never")
    rng = np.random.default_rng(0)
    vol = (rng.poisson(50, (20, 20, 20)) + 100).astype(np.uint16)
    t = build_transform(
        {"kind": "asinh", "params": {"offset": 100.0, "scale": 20.0}}
    )
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 16, 1))
    )["params"]
    out = predict(vol, model, params, t, patch_size=16, overlap=8,
                  trim=2, batch_size=4, output_clip="input")
    assert out.max() <= vol.max() + 1
    assert out.min() >= max(int(vol.min()) - 1, 0)


def test_plan_tiling_minimizes_forward_voxels():
    from exaspim_tpu.inference import plan_tiling

    # 256³: 27×96³ = 23.9 M forward voxels beats 125×64³ = 32.8 M.
    patch, batch = plan_tiling((256, 256, 256), overlap=12)
    assert patch == 96
    assert 27 % batch == 0  # no padded tail slots
    # 128³ fits a single 128 patch — zero overlap redundancy.
    assert plan_tiling((128, 128, 128), overlap=12)[0] == 128
    # Smaller than every candidate → 16-multiple fallback.
    patch, batch = plan_tiling((40, 40, 40), overlap=12)
    assert patch == 32 and batch == 1


def test_predict_auto_patch_matches_explicit():
    """patch_size='auto' runs the planner and produces full coverage."""
    t = build_transform(TCFG)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 900, (24, 20, 20)).astype(np.uint16)
    out = predict(
        img, DoublePlusOne(), {}, t, patch_size="auto", overlap=4,
        trim=2, return_float=True,
    )
    expect = t.inverse_float(
        2.0 * t.forward(img.astype(np.float32)) + 0.01
    )
    np.testing.assert_allclose(out, expect, atol=0.01)


def test_commit_params_places_leaves_once():
    """commit_params moves numpy checkpoint leaves onto a device and
    passes already-committed (or sharded) jax.Array leaves through
    unchanged — per-call host re-uploads dominated wall time on slow
    host links (see inference.commit_params docs)."""
    from exaspim_tpu.inference import commit_params

    tree = {
        "conv": {"kernel": np.ones((3, 3, 3, 1, 4), np.float32)},
        "gn": {"scale": np.ones((4,), np.float32)},
    }
    committed = commit_params(tree)
    leaves = jax.tree_util.tree_leaves(committed)
    assert all(isinstance(leaf, jax.Array) for leaf in leaves)
    np.testing.assert_array_equal(
        np.asarray(committed["conv"]["kernel"]), tree["conv"]["kernel"]
    )
    # A second pass returns the identical leaves (no copies).
    again = commit_params(committed)
    assert again["conv"]["kernel"] is committed["conv"]["kernel"]


def test_predict_accepts_numpy_params(small_unet):
    """predict works when params arrive as host numpy leaves (the
    msgpack checkpoint case) and matches device-committed params."""
    from exaspim_tpu.inference import commit_params

    model, params = small_unet
    transform = build_transform(TCFG)
    np_params = jax.tree_util.tree_map(np.asarray, params)
    rng = np.random.default_rng(1)
    vol = (rng.poisson(60, (20, 20, 20)) + 90).astype(np.uint16)
    kw = dict(patch_size=16, overlap=8, trim=2, batch_size=4)
    out_np = predict(vol, model, np_params, transform, **kw)
    out_dev = predict(vol, model, commit_params(np_params), transform,
                      **kw)
    np.testing.assert_array_equal(out_np, out_dev)
