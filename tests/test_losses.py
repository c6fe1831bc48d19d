"""Loss-function behavior tests (reference tests/test_losses.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exaspim_tpu.losses import SignalPreservingLoss, charbonnier, signal_preserving_loss


def test_charbonnier_approximates_l1():
    d = jnp.asarray([0.5, -2.0, 10.0])
    out = np.asarray(charbonnier(d, eps=1e-3))
    np.testing.assert_allclose(out, np.abs(np.asarray(d)), atol=1e-4)


def test_fg_weight_zero_is_uniform_charbonnier():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.normal(size=(2, 8, 8, 8)).astype(np.float32))
    target = jnp.zeros_like(pred)
    fg = jnp.asarray((rng.random((2, 8, 8, 8)) > 0.5).astype(np.float32))
    uniform = signal_preserving_loss(pred, target, fg, fg_weight=0.0)
    plain = jnp.mean(charbonnier(pred))
    np.testing.assert_allclose(float(uniform), float(plain), rtol=1e-6)


def test_foreground_error_weighted_more():
    pred = jnp.zeros((4, 4, 4))
    target = jnp.ones((4, 4, 4))
    fg_on = jnp.ones((4, 4, 4))
    fg_off = jnp.zeros((4, 4, 4))
    loss = SignalPreservingLoss(fg_weight=20.0)
    assert float(loss(pred, target, fg_on)) > float(loss(pred, target, fg_off))


def test_gradient_flows_with_correct_sign():
    target = jnp.full((4, 4, 4), 2.0)
    fg = jnp.zeros((4, 4, 4))

    def f(p):
        return signal_preserving_loss(p, target, fg)

    g = jax.grad(f)(jnp.zeros((4, 4, 4)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.all(np.asarray(g) < 0), "loss must pull pred toward target"


def test_loss_is_jit_static():
    loss = SignalPreservingLoss(fg_weight=5.0)

    @jax.jit
    def step(p, t, m, criterion):
        return criterion(p, t, m)

    out = step(jnp.ones((2, 2)), jnp.zeros((2, 2)), jnp.ones((2, 2)), loss)
    assert float(out) == pytest.approx(6.0 * 1.0000005, rel=1e-4)


def test_smaller_eps_sharpens_small_residue_penalty():
    """loss_eps is the compression lever: below the knee the penalty is
    quadratic and sub-count background residue stops being pushed to
    zero (RESULTS.md round 4). The relative penalty on a tiny residual
    must grow as eps shrinks."""
    import jax
    import jax.numpy as jnp

    d = jnp.full((4, 4), 1e-4)  # sub-knee residual

    def mean_loss(eps):
        return signal_preserving_loss(
            d, jnp.zeros_like(d), jnp.zeros_like(d), fg_weight=0.0,
            eps=eps,
        )

    g_big = jax.grad(lambda x: signal_preserving_loss(
        x, jnp.zeros_like(d), jnp.zeros_like(d), 0.0, eps=1e-3))(d)
    g_small = jax.grad(lambda x: signal_preserving_loss(
        x, jnp.zeros_like(d), jnp.zeros_like(d), 0.0, eps=1e-5))(d)
    # Near-L1 gradient magnitude with the small knee; vanishing with
    # the default.
    assert float(g_small.mean()) > 5 * float(g_big.mean())
    assert float(mean_loss(1e-5)) < float(mean_loss(1e-3))
