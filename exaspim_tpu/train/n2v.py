"""Noise2Void self-supervised training (blind-spot masking).

The reference ships the N2V2UNet architecture (reference
unet3d.py:392-571) but no self-supervised trainer — it trains everything
against BM4D teachers. This module completes the N2V2 capability: train
a denoiser from noisy data alone by masking random voxels, replacing
them with neighborhood values, and scoring the prediction only at the
masked sites (so the net cannot learn the identity).

Everything — blind-spot sampling, neighbor substitution, the masked
loss — runs inside one jitted step using ``jax.random`` (fold the step
index into a base key for deterministic, resumable masking).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from exaspim_tpu.losses import charbonnier

__all__ = ["make_blind_spots", "make_n2v_train_step"]


def make_blind_spots(key, batch_shape, mask_rate=0.005, max_shift=2):
    """Sample blind-spot masks and per-sample neighbor shifts.

    Returns ``(mask, shifts)`` where ``mask`` is boolean
    ``batch_shape`` (≈ ``mask_rate`` of voxels set) and ``shifts`` is
    (B, 3) int in [−max_shift, max_shift] \\ 0 volumes-roll offsets used
    as the neighbor-substitution source.
    """
    kmask, kshift = jax.random.split(key)
    mask = jax.random.uniform(kmask, batch_shape) < mask_rate
    B = batch_shape[0]
    shifts = jax.random.randint(
        kshift, (B, 3), -max_shift, max_shift + 1
    )
    # Avoid the zero shift (which would leak the central value).
    shifts = jnp.where(
        jnp.all(shifts == 0, axis=1, keepdims=True),
        jnp.full_like(shifts, max_shift), shifts,
    )
    return mask, shifts


def _substitute(x, mask, shifts):
    """Replace masked voxels with values from a randomly rolled copy."""

    def one(xi, mi, si):
        rolled = jnp.roll(xi, (si[0], si[1], si[2]), axis=(0, 1, 2))
        return jnp.where(mi, rolled, xi)

    return jax.vmap(one)(x, mask, shifts)


def make_n2v_train_step(transform=None, mask_rate=0.005, max_shift=2,
                        eps=1e-3, donate=False,
                        sigma_gain=None, sigma_read=0.0):
    """Jitted N2V step ``(state, x, key) -> (state, loss)``.

    ``x``: noisy batches — raw counts (with ``transform``) or
    transform-domain floats, shaped (B, D, H, W, 1). Derive ``key`` per
    step with ``jax.random.fold_in(base_key, step)`` for deterministic
    resumable masking.

    ``sigma_gain`` switches on the **σ-aware count-space loss**: masked
    residuals are scored in raw counts (``transform.inverse_float`` of
    the prediction vs the observed counts) and normalized by the local
    Poisson–Gaussian noise scale ``σ(c) = sqrt(gain·c + read² + 1)``.
    Plain transform-domain N2V underweights rare bright voxels exactly
    where a compressive transform (asinh) shrinks them, so blind-spot
    nets undershoot peaks and the error explodes through the inverse
    map; whitening by σ makes every voxel's residual unit-variance, so
    bright foreground is trained at the same statistical weight as
    background instead of ~1/f'(c) below it. Requires ``transform``
    (the step must see raw counts to compute σ).
    """
    if sigma_gain is not None and transform is None:
        raise ValueError(
            "sigma_gain requires a transform: the sigma-aware loss is "
            "computed in count space, so the step must receive raw "
            "counts (not transform-domain floats)."
        )

    def step(state, x, key):
        counts = x.astype(jnp.float32)
        if transform is not None:
            x = transform.forward(counts)
        x3 = x[..., 0]
        mask, shifts = make_blind_spots(
            key, x3.shape, mask_rate=mask_rate, max_shift=max_shift
        )
        x_in = _substitute(x3, mask, shifts)[..., None]
        m = mask.astype(jnp.float32)

        if sigma_gain is not None:
            c3 = counts[..., 0]
            sigma = jnp.sqrt(
                sigma_gain * jnp.maximum(c3, 0.0)
                + sigma_read * sigma_read + 1.0
            )

        def loss_fn(params):
            pred = state.apply_fn({"params": params}, x_in)[..., 0]
            if sigma_gain is not None:
                # inverse_float_smooth: the *exact* inverse of some
                # transforms clamps (Anscombe clips y at 0), which
                # zeroes the gradient wherever the net predicts below
                # the floor — roughly half the masked sites at init.
                # The smooth variant agrees on the valid range and
                # sign-extends below it.
                pred_c = transform.inverse_float_smooth(pred)
                err = charbonnier((pred_c - c3) / sigma, eps=eps)
            else:
                err = charbonnier(pred - x3, eps=eps)
            return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())
