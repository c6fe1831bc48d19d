"""Synthetic phantoms standing in for real neurites and artifacts.

The reference's de-facto fake-data backend (reference tests/test_metrics.py)
is a pair of procedural generators: a PSF-blurred smooth blob (real signal)
and a salt-and-pepper block (processing artifact). Shared by metric, gate,
BM4D, and training tests.
"""

import numpy as np
from scipy import ndimage


def smooth_blob(shape=(48, 48, 48), center=None, sigma=4.0, peak=4000.0,
                noise=20.0, seed=0):
    """PSF-blurred Gaussian bump on a noisy background (real-signal stand-in)."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=np.float64) for s in shape], indexing="ij"
    )
    if center is None:
        center = [s / 2 for s in shape]
    r2 = (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
    img = peak * np.exp(-r2 / (2 * sigma**2))
    img += rng.normal(100.0, noise, shape)
    return np.clip(img, 0, 65535)


def salt_pepper_block(shape=(48, 48, 48), block=(16, 16, 16), origin=(8, 8, 8),
                      lo=0.0, hi=8000.0, seed=1):
    """Bright, spatially incoherent block (processing-artifact stand-in)."""
    rng = np.random.default_rng(seed)
    img = rng.normal(100.0, 10.0, shape)
    sl = tuple(slice(o, o + b) for o, b in zip(origin, block))
    img[sl] = rng.choice([lo, hi], size=block)
    return np.clip(img, 0, 65535)


def tube_phantom(shape=(64, 64, 64), radius=2.0, value=3000.0, noise=30.0,
                 background=120.0, seed=2):
    """A PSF-blurred tube along z (neurite stand-in) + Gaussian noise."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.meshgrid(
        *[np.arange(s, dtype=np.float64) for s in shape], indexing="ij"
    )
    cy, cx = shape[1] / 2, shape[2] / 2
    r2 = (yy - cy) ** 2 + (xx - cx) ** 2
    img = value * (r2 <= radius**2).astype(np.float64)
    img = ndimage.gaussian_filter(img, sigma=1.2)
    img += background + rng.normal(0.0, noise, shape)
    return np.clip(img, 0, 65535)
