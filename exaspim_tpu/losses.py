"""Signal-preserving denoising losses (pure JAX).

Foreground-weighted Charbonnier loss matching the reference semantics
(reference: src/aind_exaspim_image_compression/machine_learning/losses.py).
Operates in the transform domain: a compressive transform shrinks the
bright tail, so a fixed error here is a larger error in counts — i.e. the
loss enforces relative (Weber) precision.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def charbonnier(diff, eps=1e-3):
    """Smooth-L1 Charbonnier penalty ``sqrt(diff² + eps²)``, elementwise."""
    return jnp.sqrt(diff * diff + eps * eps)


def signal_preserving_loss(pred, target, fg_mask, fg_weight=20.0, eps=1e-3):
    """Foreground-weighted Charbonnier mean.

    ``fg_weight=0`` reduces to a plain Charbonnier mean. ``fg_mask`` is a
    0/1 tensor broadcastable to ``pred``.
    """
    weight = 1.0 + fg_weight * fg_mask
    return jnp.mean(weight * charbonnier(pred - target, eps))


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class SignalPreservingLoss:
    """Callable config object mirroring the reference's loss module API."""

    fg_weight: float = 20.0
    eps: float = 1e-3

    def __call__(self, pred, target, fg_mask):
        return signal_preserving_loss(
            pred, target, fg_mask, fg_weight=self.fg_weight, eps=self.eps
        )
