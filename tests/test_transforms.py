"""Property tests for intensity transforms.

Covers the same properties as the reference test suite (round-trips,
monotonicity, boundedness, offset composition, frozen-cfg factory) plus
TPU-specific properties: transforms work identically inside ``jax.jit`` and
on device arrays (reference tests/test_transforms.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from numpy.testing import assert_allclose

from exaspim_tpu.transforms import (
    AnscombeTransform,
    AsinhTransform,
    IntensityTransform,
    LinearClipTransform,
    OffsetTransform,
    build_transform,
    calibrate_transform,
    estimate_offset,
    with_offset,
)


COUNTS = np.array([0, 1, 10, 100, 1000, 10000, 65535], dtype=np.float32)


class TestAsinh:
    def test_round_trip(self):
        t = AsinhTransform(offset=10.0, scale=40.0)
        y = t.forward(COUNTS)
        back = t.inverse_float(y)
        assert_allclose(back, COUNTS, rtol=1e-4, atol=0.5)

    def test_no_bright_plateau(self):
        t = AsinhTransform()
        bright = np.array([30000.0, 50000.0, 65535.0], dtype=np.float32)
        y = t.forward(bright)
        assert np.all(np.diff(y) > 1e-6), "bright tail must stay invertible"

    def test_monotonic(self):
        t = AsinhTransform(offset=5.0)
        x = np.linspace(0, 65535, 512).astype(np.float32)
        assert np.all(np.diff(t.forward(x)) > 0)

    def test_bounded(self):
        t = AsinhTransform(offset=0.0)
        y = t.forward(COUNTS)
        assert y.max() <= 1.0 + 1e-6
        assert y.min() >= -0.1

    def test_inverse_dtype_and_clip(self):
        t = AsinhTransform()
        out = t.inverse(np.array([-5.0, 0.0, 0.5, 2.0], dtype=np.float32))
        assert out.dtype == np.uint16
        assert out.min() >= 0 and out.max() <= 65535


class TestAnscombe:
    def test_round_trip_algebraic(self):
        t = AnscombeTransform(gain=2.0, read_noise=3.0, unbiased_inverse=False)
        y = t.forward(COUNTS)
        assert_allclose(t.inverse_float(y), COUNTS, rtol=1e-4, atol=0.5)

    def test_unbiased_inverse_biased_roundtrip(self):
        t = AnscombeTransform(unbiased_inverse=True)
        y = t.forward(np.array([100.0], dtype=np.float32))
        # unbiased inverse uses 1/8 instead of 3/8 -> +1/4 count shift
        assert_allclose(t.inverse_float(y)[0], 100.25, atol=0.05)

    def test_monotonic(self):
        t = AnscombeTransform(gain=1.7, read_noise=2.0, offset=7.0)
        x = np.linspace(0, 65535, 512).astype(np.float32)
        assert np.all(np.diff(t.forward(x)) > 0)

    def test_bounded(self):
        t = AnscombeTransform()
        y = t.forward(COUNTS)
        assert y.max() <= 1.0 + 1e-6 and y.min() >= 0.0

    def test_reduces_to_standard_anscombe(self):
        t = AnscombeTransform(gain=1.0, read_noise=0.0, offset=0.0)
        x = np.array([10.0, 500.0], dtype=np.float32)
        expected = 2.0 * np.sqrt(x + 3.0 / 8.0)
        got = t.forward(x) * t._norm
        assert_allclose(got, expected, rtol=1e-5)


class TestLinearClip:
    def test_round_trip_within_clip(self):
        t = LinearClipTransform(mn=0.0, mx=1000.0, clip=8.0)
        x = np.array([0.0, 100.0, 900.0, 4000.0], dtype=np.float32)
        assert_allclose(t.inverse_float(t.forward(x)), x, rtol=1e-4, atol=0.5)

    def test_clips_bright_tail(self):
        t = LinearClipTransform(mn=0.0, mx=1000.0, clip=2.0)
        y = t.forward(np.array([10000.0, 60000.0], dtype=np.float32))
        assert np.all(y == 2.0), "values above clip form a plateau"


class TestOffsetComposition:
    def test_with_offset_matches_manual_subtraction(self):
        base = build_transform({"kind": "asinh", "params": {"scale": 30.0}})
        t = with_offset(base, 37.0)
        x = np.array([37.0, 137.0, 1037.0], dtype=np.float32)
        assert_allclose(t.forward(x), base.forward(x - 37.0), rtol=1e-6)

    def test_with_offset_inverse_restores_pedestal(self):
        base = build_transform({"kind": "asinh", "params": {}})
        t = with_offset(base, 50.0)
        x = np.array([60.0, 500.0, 5000.0], dtype=np.float32)
        assert_allclose(t.inverse_float(t.forward(x)), x, rtol=1e-4, atol=0.5)

    def test_with_offset_is_exact_for_anscombe(self):
        base = build_transform(
            {"kind": "anscombe", "params": {"unbiased_inverse": False}}
        )
        t = with_offset(base, 25.0)
        x = np.array([30.0, 300.0, 3000.0], dtype=np.float32)
        assert_allclose(t.inverse_float(t.forward(x)), x, rtol=1e-4, atol=0.5)

    def test_with_offset_does_not_change_normalization(self):
        base = build_transform({"kind": "asinh", "params": {"scale": 32.0}})
        t = with_offset(base, 100.0)
        assert t.base_transform._norm == base._norm

    def test_offset_transform_config_round_trip(self):
        base = build_transform({"kind": "asinh", "params": {"scale": 20.0}})
        t = with_offset(base, 12.0)
        rebuilt = build_transform(t.cfg)
        x = np.array([15.0, 900.0], dtype=np.float32)
        assert_allclose(rebuilt.forward(x), t.forward(x), rtol=0)
        assert isinstance(rebuilt, OffsetTransform)

    def test_with_offset_shifts_linear_bounds(self):
        base = build_transform(
            {"kind": "linear", "params": {"mn": 0.0, "mx": 1000.0}}
        )
        t = with_offset(base, 30.0)
        assert isinstance(t, LinearClipTransform)
        assert t.mn == 30.0 and t.mx == 1030.0
        x = np.array([130.0], dtype=np.float32)
        assert_allclose(t.forward(x), base.forward(x - 30.0), rtol=1e-5)
        # inverse restores the pedestal
        assert_allclose(t.inverse_float(t.forward(x)), x, atol=0.01)

    def test_with_offset_unwraps_existing_offset(self):
        base = build_transform({"kind": "asinh", "params": {}})
        t1 = with_offset(base, 10.0)
        t2 = with_offset(t1, 20.0)
        assert t2.offset == 20.0
        assert not isinstance(t2.base_transform, OffsetTransform)

    def test_with_offset_requires_cfg(self):
        with pytest.raises(ValueError):
            with_offset(AsinhTransform(), 5.0)

    def test_getattr_delegates_to_base(self):
        base = build_transform({"kind": "asinh", "params": {"scale": 77.0}})
        t = with_offset(base, 5.0)
        assert t.scale == 77.0


class TestFactory:
    def test_build_transform_kinds(self):
        assert isinstance(
            build_transform({"kind": "asinh"}), AsinhTransform
        )
        assert isinstance(
            build_transform({"kind": "anscombe"}), AnscombeTransform
        )
        assert isinstance(
            build_transform({"kind": "linear"}), LinearClipTransform
        )
        with pytest.raises(ValueError):
            build_transform({"kind": "nope"})

    def test_build_transform_stamps_cfg(self):
        cfg = {"kind": "asinh", "params": {"scale": 64.0}}
        t = build_transform(cfg)
        assert t.cfg == cfg
        assert t.cfg is not cfg or t.cfg["params"] is not cfg["params"]

    def test_calibrate_transform_sets_offset(self):
        cfg = {
            "kind": "asinh",
            "params": {},
            "calibrate": {"offset": True, "offset_percentile": 1.0},
        }
        sample = np.full(1000, 42.0, dtype=np.float32)
        out = calibrate_transform(cfg, sample)
        assert out["params"]["offset"] == 42.0
        assert cfg["params"] == {}, "input cfg must not be mutated"

    def test_calibrate_transform_noop(self):
        cfg = {"kind": "asinh", "params": {"offset": 3.0}}
        out = calibrate_transform(cfg, np.ones(10))
        assert out["params"]["offset"] == 3.0

    def test_base_class_not_implemented(self):
        t = IntensityTransform()
        for fn in (t.forward, t.inverse, t.inverse_float):
            with pytest.raises(NotImplementedError):
                fn(np.zeros(3))


class TestEstimateOffset:
    def test_ignores_zeros(self):
        sample = np.concatenate([np.zeros(900), np.full(100, 50.0)])
        assert estimate_offset(sample) == 50.0

    def test_all_zero_falls_back(self):
        assert estimate_offset(np.zeros(100)) == 0.0

    def test_percentile(self):
        sample = np.arange(1, 101, dtype=np.float32)
        assert estimate_offset(sample, percentile=50.0) == pytest.approx(50.5)


class TestJaxIntegration:
    """TPU-specific: transforms must be jit-transparent and device-correct."""

    def test_forward_inside_jit_matches_numpy(self):
        t = build_transform({"kind": "asinh", "params": {"offset": 10.0}})
        x = np.linspace(0, 65535, 257).astype(np.float32)
        host = t.forward(x)
        dev = jax.jit(t.forward)(jnp.asarray(x))
        assert_allclose(np.asarray(dev), host, rtol=1e-6, atol=1e-6)

    def test_transform_as_static_arg(self):
        @jax.jit
        def roundtrip(x, transform):
            return transform.inverse_float(transform.forward(x))

        t = build_transform(
            {"kind": "anscombe", "params": {"unbiased_inverse": False}}
        )
        x = jnp.asarray(COUNTS)
        assert_allclose(np.asarray(roundtrip(x, t)), COUNTS, rtol=1e-3, atol=0.5)

    def test_offset_transform_inside_jit(self):
        base = build_transform({"kind": "asinh", "params": {}})
        t = with_offset(base, 37.0)
        x = jnp.asarray(COUNTS) + 37.0
        y = jax.jit(t.forward)(x)
        assert_allclose(
            np.asarray(y), base.forward(COUNTS), rtol=1e-5, atol=1e-5
        )

    def test_inverse_uint16_on_device(self):
        t = build_transform({"kind": "asinh", "params": {}})
        out = jax.jit(t.inverse)(jnp.asarray([0.0, 0.5, 1.0, 2.0]))
        assert out.dtype == jnp.uint16

    def test_equal_transforms_share_jit_cache(self):
        t1 = AsinhTransform(offset=1.0)
        t2 = AsinhTransform(offset=1.0)
        assert t1 == t2 and hash(t1) == hash(t2)


class TestInverseFloatSmooth:
    """The σ-aware N2V loss differentiates through the inverse map;
    ``inverse_float_smooth`` must agree with ``inverse_float`` on the
    valid range but keep a nonzero gradient below the transform floor
    (AnscombeTransform's exact inverse clips y at 0)."""

    Y = np.linspace(0.0, 1.5, 64).astype(np.float32)

    @pytest.mark.parametrize("cfg", [
        {"kind": "asinh", "params": {"offset": 10.0}},
        {"kind": "anscombe", "params": {"unbiased_inverse": False}},
        {"kind": "linear", "params": {}},
    ])
    def test_agrees_on_valid_range(self, cfg):
        t = build_transform(cfg)
        assert_allclose(
            t.inverse_float_smooth(self.Y), t.inverse_float(self.Y),
            rtol=1e-6, atol=1e-5,
        )

    def test_anscombe_gradient_nonzero_below_floor(self):
        t = AnscombeTransform(unbiased_inverse=False)
        g_exact = jax.grad(lambda y: t.inverse_float(y))(-0.2)
        g_smooth = jax.grad(lambda y: t.inverse_float_smooth(y))(-0.2)
        assert float(g_exact) == 0.0          # the failure mode
        assert float(g_smooth) > 0.0          # the fix
        # and it stays monotone (odd extension)
        ys = jnp.linspace(-1.0, 1.0, 101)
        vals = t.inverse_float_smooth(ys)
        assert bool(jnp.all(jnp.diff(vals) > 0))

    def test_offset_transform_delegates(self):
        base = build_transform(
            {"kind": "anscombe", "params": {"unbiased_inverse": False}}
        )
        t = with_offset(base, 5.0)
        y = np.float32(-0.3)
        assert float(t.inverse_float_smooth(y)) == pytest.approx(
            float(base.inverse_float_smooth(y)) + 5.0
        )
