"""3D structural similarity (SSIM) on device.

Uniform-filter SSIM matching the reference formula (reference
img_util.py:953-1003): window 16 mean filters for local moments,
C1=(0.01*L)², C2=(0.03*L)², with the reference's denominator guard.
The reference promotes to float64 to avoid uint16 overflow; float64 is
slow on the TPU VPU, so instead both images are shifted by a shared global
mean before the moment computation. Variance and covariance are shift
invariant, and the shift keeps E[x²] small enough that the
``E[x²] − µ²`` cancellation stays benign in float32 (µ² for bright
uint16 data reaches ~4e9, past float32's 24-bit mantissa; after the
shift it is on the order of the local contrast squared). The luminance
term uses the true means (shifted means + offset).
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

    shift = 0.5 * (jnp.mean(img1) + jnp.mean(img2))
    a = img1 - shift
    b = img2 - shift

    mu1s = uniform_filter(a, window_size)
    mu2s = uniform_filter(b, window_size)
    sigma1_sq = uniform_filter(a * a, window_size) - mu1s * mu1s
    sigma2_sq = uniform_filter(b * b, window_size) - mu2s * mu2s
    sigma12 = uniform_filter(a * b, window_size) - mu1s * mu2s
    mu1 = mu1s + shift
    mu2 = mu2s + shift

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
