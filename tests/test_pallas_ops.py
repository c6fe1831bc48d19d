"""Pallas transform-kernel parity tests (interpret mode on CPU).

``ops/pallas_ops.py`` is the framework's documented elementwise-kernel
pattern example, not a production path (see its module docstring);
these tests keep the example semantically correct against the real
transform. The same kernels run compiled on TPU hardware (verified
out-of-band); interpret mode checks kernel semantics hermetically.
"""

import numpy as np
import jax.numpy as jnp

from exaspim_tpu.ops.pallas_ops import asinh_forward, asinh_inverse
from exaspim_tpu.transforms import build_transform


def test_forward_matches_transform():
    rng = np.random.default_rng(0)
    raw = (rng.poisson(300, (24, 24, 24)) + 37).astype(np.uint16)
    y = np.asarray(asinh_forward(
        jnp.asarray(raw), offset=100.0, scale=60.0, norm=2.0,
        interpret=True,
    ))
    expect = np.arcsinh((raw.astype(np.float32) - 100.0) / 60.0) / 2.0
    np.testing.assert_allclose(y, expect, atol=1e-4)


def test_roundtrip_exact_counts():
    rng = np.random.default_rng(1)
    raw = (rng.poisson(300, (16, 16, 16)) + 37).astype(np.uint16)
    y = asinh_forward(
        jnp.asarray(raw), offset=100.0, scale=60.0, norm=2.0,
        interpret=True,
    )
    back = np.asarray(asinh_inverse(
        y, offset=100.0, scale=60.0, norm=2.0, interpret=True,
    ))
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, raw)


def test_matches_transform_class_mapping():
    t = build_transform(
        {"kind": "asinh", "params": {"offset": 37.0, "scale": 50.0}}
    )
    rng = np.random.default_rng(2)
    raw = (rng.poisson(200, (1000,)) + 37).astype(np.uint16)
    norm = float(t._norm)
    y = np.asarray(asinh_forward(
        jnp.asarray(raw), offset=37.0, scale=50.0, norm=norm,
        interpret=True,
    ))
    np.testing.assert_allclose(
        y, t.forward(raw.astype(np.float32)), atol=1e-4
    )
