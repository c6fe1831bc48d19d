"""TPU-resident batched validation metrics.

The reference deliberately computes validation metrics on CPU with a
GPU→host sync per batch (reference train.py:331-374). On TPU that sync is
the expensive part, so the in-loop path here evaluates the whole batch on
device in one jitted call; only the final scalar dict crosses to host.
The host oracle (:mod:`exaspim_tpu.ops.metrics`) defines the semantics;
parity is pinned by tests on shared phantoms.

Device notes:
* medians/percentiles use ``jnp.percentile`` (full sort — fine at 64³).
* masks are float 0/1 tensors (as delivered by the data layer).
* everything is float32: count-space values ≤ 65535 are exactly
  representable and the means are over ≥ 4096 voxels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _robust_threshold(raw, k):
    med = jnp.median(raw)
    mad = jnp.median(jnp.abs(raw - med)) + 1e-6
    return med + k * 1.4826 * mad


def foreground_mask(raw, k=6.0):
    """Un-dilated robust intensity mask (device variant of the host oracle)."""
    raw = jnp.asarray(raw, dtype=jnp.float32)
    return raw > _robust_threshold(raw, k)


def _masked_mean(x, mask):
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(x * mask) / jnp.maximum(denom, 1), 0.0)


def evaluate_example_device(pred, raw, target, fg_mask, pct=0.1, k=6.0):
    """Single-example metric dict as device scalars (see host oracle)."""
    pred = jnp.asarray(pred, dtype=jnp.float32)
    raw = jnp.asarray(raw, dtype=jnp.float32)
    target = jnp.asarray(target, dtype=jnp.float32)
    fg = jnp.asarray(fg_mask, dtype=jnp.float32)
    bg = 1.0 - fg

    fg_mae = _masked_mean(jnp.abs(pred - raw), fg)
    bg_mae = _masked_mean(jnp.abs(pred - target), bg)

    q = 100.0 - pct
    raw_top = jnp.percentile(raw, q)
    pred_top = jnp.percentile(pred, q)

    thr = _robust_threshold(raw, k)
    false_bright = _masked_mean((pred > thr).astype(jnp.float32), bg)

    return {
        "fg_mae": fg_mae,
        "bg_mae": bg_mae,
        "top_pct_error": jnp.abs(pred_top - raw_top),
        "top_pct_preservation": pred_top / (raw_top + 1e-8),
        "mip_max_error": jnp.abs(jnp.max(pred) - jnp.max(raw)),
        "false_bright_rate": false_bright,
    }


@functools.partial(jax.jit, static_argnames=("pct", "k"))
def evaluate_batch(pred, raw, target, fg_mask, pct=0.1, k=6.0):
    """vmapped per-example metrics over a (B, ...) batch, fully on device.

    Returns a dict of (B,) arrays; aggregate on host (mean per key) exactly
    like the reference aggregates its per-example rows.
    """
    fn = functools.partial(evaluate_example_device, pct=pct, k=k)
    return jax.vmap(fn)(pred, raw, target, fg_mask)
