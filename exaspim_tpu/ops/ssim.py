"""3D structural similarity (SSIM) on device.

Uniform-filter SSIM matching the reference formula (reference
img_util.py:953-1003): window 16 mean filters for local moments,
C1=(0.01*L)², C2=(0.03*L)², with the reference's denominator guard.
The reference promotes to float64 to avoid uint16 overflow; here inputs are
cast to float32 once up front (counts ≤ 65535 are exact in float32 and all
moments are means), which keeps the whole computation on the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from exaspim_tpu.ops.filters import uniform_filter


@functools.partial(jax.jit, static_argnames=("window_size",))
def ssim3d(img1, img2, data_range=None, window_size=16):
    """Mean SSIM between two 3D images (returns a device scalar).

    ``data_range=None`` computes ``max(ptp(img1), ptp(img2))`` like the
    reference. Pass an explicit value to jit once per shape.
    """
    img1 = jnp.asarray(img1, dtype=jnp.float32)
    img2 = jnp.asarray(img2, dtype=jnp.float32)

    if data_range is None:
        data_range = jnp.maximum(
            jnp.max(img1) - jnp.min(img1), jnp.max(img2) - jnp.min(img2)
        )

    mu1 = uniform_filter(img1, window_size)
    mu2 = uniform_filter(img2, window_size)

    sigma1_sq = uniform_filter(img1 * img1, window_size) - mu1 * mu1
    sigma2_sq = uniform_filter(img2 * img2, window_size) - mu2 * mu2
    sigma12 = uniform_filter(img1 * img2, window_size) - mu1 * mu2

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2 * mu1 * mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1 * mu1 + mu2 * mu2 + c1) * (sigma1_sq + sigma2_sq + c2)
    ssim_map = num / (jnp.maximum(den, 1e-8) + 1e-6)
    return jnp.mean(ssim_map)


def psnr(img1, img2, data_range=65535.0):
    """Peak signal-to-noise ratio in dB (device scalar)."""
    img1 = jnp.asarray(img1, dtype=jnp.float32)
    img2 = jnp.asarray(img2, dtype=jnp.float32)
    mse = jnp.mean((img1 - img2) ** 2)
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-12))


def compute_mae(img1, img2):
    """Mean absolute error (device scalar; reference img_util.py:1006)."""
    a = jnp.asarray(img1, dtype=jnp.float32)
    b = jnp.asarray(img2, dtype=jnp.float32)
    return jnp.mean(jnp.abs(a - b))


def compute_lmax(img1, img2):
    """Max absolute error (device scalar; reference img_util.py:1027)."""
    a = jnp.asarray(img1, dtype=jnp.float32)
    b = jnp.asarray(img2, dtype=jnp.float32)
    return jnp.max(jnp.abs(a - b))
