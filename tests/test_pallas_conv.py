"""Blocked Pallas conv vs lax.conv_general_dilated (interpret mode).

The real-TPU path is exercised by bench.py / the verify flow; these
tests pin the math (packing algebra, tap bookkeeping, vjp) on the CPU
interpreter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exaspim_tpu.ops.pallas_conv import (
    blocked_conv3d,
    supports_blocked_conv,
)

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow


def _ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize("cin,cout,shape", [
    (32, 32, (1, 4, 32, 32)),
    (32, 64, (2, 2, 32, 32)),
    (64, 32, (1, 2, 32, 64)),
])
def test_blocked_conv_matches_lax(cin, cout, shape):
    b, d, h, w = shape
    assert supports_blocked_conv((b, d, h, w), cin, cout)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, cin)).astype(np.float32))
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, cout)) * 0.05).astype(np.float32)
    )
    got = blocked_conv3d(x, k, True)
    want = _ref(x, k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_blocked_conv_grads_match_lax():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 32, 32, 32)).astype(np.float32))
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, 32, 32)) * 0.05).astype(np.float32)
    )

    def loss_p(x, k):
        return jnp.sum(blocked_conv3d(x, k, True) ** 2)

    def loss_r(x, k):
        return jnp.sum(_ref(x, k) ** 2)

    gx_p, gk_p = jax.grad(loss_p, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gk_p), np.asarray(gk_r), atol=1e-3, rtol=1e-3
    )


def test_supports_gate():
    assert not supports_blocked_conv((1, 4, 32, 32), 1, 32)   # cin=1
    assert not supports_blocked_conv((1, 3, 32, 32), 32, 32)  # odd D
    assert not supports_blocked_conv((1, 4, 16, 16), 32, 32)  # M too small
