"""Data-parallel training over a device mesh.

The TPU replacement for the reference's single-GPU training loop
(reference train.py:196-222): the batch axis is sharded across the mesh,
params/optimizer state are replicated, and XLA inserts the gradient
all-reduce (psum) over ICI automatically from the sharding annotations —
no NCCL/DDP analogue needed (SURVEY §2.3).
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from exaspim_tpu.train.state import make_train_step

__all__ = ["make_dp_train_step", "shard_batch"]


def shard_batch(mesh, batch, axis="data"):
    """Place a host batch (tuple of arrays) with dim-0 sharded on mesh."""
    def put(a):
        spec = P(axis, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def make_dp_train_step(mesh, fg_weight=20.0, eps=1e-3, axis="data",
                       transform=None):
    """Jitted data-parallel step ``(state, x, y, fg) -> (state, loss)``.

    Same math as :func:`exaspim_tpu.train.state.make_train_step`
    (including the optional on-device count→transform mapping); the
    sharding constraints split the batch across ``mesh`` and keep the
    TrainState replicated. Loss is the global batch mean.
    """
    step = make_train_step(
        fg_weight=fg_weight, eps=eps, donate=False, transform=transform
    )
    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis, None, None, None, None))

    def dp_step(state, x, y, fg):
        x = jax.lax.with_sharding_constraint(x, bsh)
        y = jax.lax.with_sharding_constraint(y, bsh)
        fg = jax.lax.with_sharding_constraint(fg, bsh)
        state = jax.lax.with_sharding_constraint(
            state, jax.tree.map(lambda _: repl, state)
        )
        return step(state, x, y, fg)

    return jax.jit(dp_step)
