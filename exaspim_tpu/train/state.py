"""Train state and jitted train/eval steps.

The reference's training loop couples AdamW + cosine annealing + AMP
GradScaler + manual backward (reference train.py:110-233). The TPU-native
equivalent is a single jitted pure function per step:

* **optax AdamW** with a cosine-decay schedule over total steps,
* **bf16 compute** inside the model (``dtype=jnp.bfloat16``) with f32
  params and f32 loss — no GradScaler, bf16 has the exponent range of f32,
* gradients averaged across the batch by the loss mean; under a device
  mesh the same step runs data-parallel by sharding the batch axis
  (see :mod:`exaspim_tpu.parallel`) — XLA inserts the gradient psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from exaspim_tpu.losses import signal_preserving_loss

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_cached_train_step",
    "make_eval_step",
    "cosine_schedule",
]


class TrainState(train_state.TrainState):
    """flax TrainState; params f32, opt-state f32."""


def cosine_schedule(lr, total_steps, warmup_steps=0):
    """Cosine annealing to 0 over ``total_steps`` (reference train.py:155),
    with optional linear warmup (a TPU-friendly addition; 0 disables)."""
    if warmup_steps:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr, warmup_steps=warmup_steps,
            decay_steps=total_steps,
        )
    return optax.cosine_decay_schedule(lr, decay_steps=total_steps)


def create_train_state(model, patch_shape=(64, 64, 64), lr=1e-3,
                       total_steps=10_000, weight_decay=1e-2, seed=0,
                       warmup_steps=0, params=None):
    """Initialize params (unless given) and the AdamW optimizer state."""
    if params is None:
        x = jnp.zeros((1, *patch_shape, 1), jnp.float32)
        params = jax.jit(model.init)(jax.random.key(seed), x)["params"]
    tx = optax.adamw(
        cosine_schedule(lr, total_steps, warmup_steps),
        weight_decay=weight_decay,
    )
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx
    )


def make_train_step(fg_weight=20.0, eps=1e-3, donate=True,
                    transform=None):
    """Build the jitted training step ``(state, x, y, fg) -> (state, loss)``.

    With ``transform=None``, ``x``/``y`` are transform-domain
    ``(B, D, H, W, 1)`` float32. With a frozen transform, ``x``/``y``
    are **raw count** batches and the intensity mapping runs on-device
    inside the step — the host ships uint16 and does no float math
    (essential when the host is weak). ``fg`` is a boolean mask either
    way. The state is donated so the optimizer updates in place in HBM.
    """

    def step(state, x, y, fg):
        if transform is not None:
            x = transform.forward(x.astype(jnp.float32))
            y = transform.forward(y.astype(jnp.float32))

        def loss_fn(params):
            pred = state.apply_fn({"params": params}, x)
            return signal_preserving_loss(
                pred, y, fg, fg_weight=fg_weight, eps=eps
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_cached_train_step(fg_weight=20.0, eps=1e-3, donate=True,
                           transform=None, preserve_foreground=False):
    """Jitted step over an HBM-resident cache:
    ``(state, raw_all, teacher_all, fg_all, idx) -> (state, loss)``.

    ``raw_all``/``teacher_all``/``fg_all`` are the FULL cache arrays
    living in device memory (uint16/uint16/bool, shaped (N, D, H, W));
    ``idx`` is the (B,) int32 batch slice of the epoch permutation. The
    batch gather, the ``where(fg, raw, teacher)`` foreground-preserving
    target rule (reference data_handling.py:48-86), and the intensity
    transform all run inside the one XLA program — the host ships 4·B
    bytes of indices per step instead of ~5·B·D·H·W bytes of voxels, so
    a slow host↔device link stops bounding the training loop (see
    ``Trainer(device_cache=...)``).
    """

    def step(state, raw_all, teacher_all, fg_all, idx):
        raw = jnp.take(raw_all, idx, axis=0)
        teacher = jnp.take(teacher_all, idx, axis=0)
        fg = jnp.take(fg_all, idx, axis=0).astype(bool)[..., None]
        if preserve_foreground:
            target = jnp.where(fg[..., 0], raw, teacher)
        else:
            target = teacher
        x = raw[..., None].astype(jnp.float32)
        y = target[..., None].astype(jnp.float32)
        if transform is not None:
            x = transform.forward(x)
            y = transform.forward(y)

        def loss_fn(params):
            pred = state.apply_fn({"params": params}, x)
            return signal_preserving_loss(
                pred, y, fg, fg_weight=fg_weight, eps=eps
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(fg_weight=20.0, eps=1e-3, transform=None):
    """Build the jitted eval step ``(state, x, y, fg) -> (loss, pred)``.

    With a ``transform``, inputs are count-space batches and the
    returned prediction is inverse-mapped **uint16 counts** (ready for
    the compression metric) — the whole validation datapath stays on
    device.
    """

    def step(state, x, y, fg):
        if transform is not None:
            x = transform.forward(x.astype(jnp.float32))
            y = transform.forward(y.astype(jnp.float32))
        pred = state.apply_fn({"params": state.params}, x)
        loss = signal_preserving_loss(
            pred, y, fg, fg_weight=fg_weight, eps=eps
        )
        if transform is not None:
            return loss, transform.inverse(pred)
        return loss, pred

    return jax.jit(step)
