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
    "pack_fg_bits",
    "unpack_fg_bits",
    "orient_batch",
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


def pack_fg_bits(fg):
    """Host-side: pack an (N, D, H, W) bool mask to (N, ceil(DHW/8))
    uint8 — 8× less HBM residency for the foreground channel of a
    device cache (np.packbits bit order: MSB-first within each byte)."""
    import numpy as np

    n = fg.shape[0]
    return np.packbits(
        np.ascontiguousarray(fg, dtype=bool).reshape(n, -1), axis=1
    )


def unpack_fg_bits(packed, patch_shape):
    """Device-side inverse of :func:`pack_fg_bits` for a gathered
    (B, ceil(P/8)) uint8 batch → (B, *patch_shape) bool."""
    nvox = 1
    for s in patch_shape:
        nvox *= int(s)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB-first
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[0], -1)[:, :nvox].reshape(
        packed.shape[0], *patch_shape
    ).astype(bool)


#: the 6 axis permutations of a cubic (B, D, H, W) patch batch
_ORIENT_PERMS = (
    (0, 1, 2, 3), (0, 1, 3, 2), (0, 2, 1, 3),
    (0, 2, 3, 1), (0, 3, 1, 2), (0, 3, 2, 1),
)


def orient_batch(batch, code):
    """Apply one of the 48 cube orientations to a (…, D, D, D) batch.

    ``code`` is a traced int32 in [0, 48): code % 6 selects the axis
    permutation (``lax.switch`` — exactly one transpose executes per
    step), bits of code // 6 flip each spatial axis under ``lax.cond``.
    Used for on-device data augmentation inside the cached train step;
    the same code must be applied to raw/teacher/fg so they stay
    voxel-aligned.
    """
    from jax import lax

    perm_ix = code % 6
    flip_bits = code // 6
    batch = lax.switch(
        perm_ix,
        [lambda a, p=p: jnp.transpose(a, p) for p in _ORIENT_PERMS],
        batch,
    )
    for axis in (1, 2, 3):
        bit = (flip_bits >> (axis - 1)) & 1
        batch = lax.cond(
            bit == 1,
            lambda a, ax=axis: jnp.flip(a, axis=ax),
            lambda a: a,
            batch,
        )
    return batch


def make_cached_train_step(fg_weight=20.0, eps=1e-3, donate=True,
                           transform=None, preserve_foreground=False,
                           fg_packed=False, augment=False, seed=0,
                           patch_shape=None):
    """Jitted step over an HBM-resident cache:
    ``(state, raw_all, teacher_all, fg_all, idx) -> (state, loss)``.

    ``raw_all``/``teacher_all`` are the FULL cache arrays living in
    device memory (uint16, shaped (N, D, H, W)); ``idx`` is the (B,)
    int32 batch slice of the epoch permutation. The batch gather, the
    ``where(fg, raw, teacher)`` foreground-preserving target rule
    (reference data_handling.py:48-86), and the intensity transform all
    run inside the one XLA program — the host ships 4·B bytes of
    indices per step instead of ~5·B·D·H·W bytes of voxels, so a slow
    host↔device link stops bounding the training loop (see
    ``Trainer(device_cache=...)``).

    HBM-residency options (round 5 — these raised the trainable cache
    size past the 8 GB default budget):

    * when the loss never reads fg (``fg_weight == 0`` and not
      ``preserve_foreground``) the step accepts ``fg_all=None`` and the
      mask never occupies HBM at all (−20 % cache bytes);
    * ``fg_packed=True``: ``fg_all`` is the (N, ceil(DHW/8)) uint8
      bit-packed mask from :func:`pack_fg_bits`, unpacked on device
      after the gather (−17.5 % cache bytes when fg is needed);
    * ``augment=True``: each step applies one of the 48 cube
      orientations (random per step, deterministic in ``seed`` and the
      optimizer step number) to the gathered batch — free effective
      data scale with no extra residency. Requires cubic patches.
    """
    needs_fg = preserve_foreground or fg_weight != 0

    def step(state, raw_all, teacher_all, fg_all, idx):
        raw = jnp.take(raw_all, idx, axis=0)
        teacher = jnp.take(teacher_all, idx, axis=0)
        if needs_fg:
            if fg_packed:
                shape = patch_shape or raw_all.shape[1:]
                fg_b = unpack_fg_bits(
                    jnp.take(fg_all, idx, axis=0), shape
                )
            else:
                fg_b = jnp.take(fg_all, idx, axis=0).astype(bool)
        if augment:
            code = jax.random.randint(
                jax.random.fold_in(jax.random.key(seed), state.step),
                (), 0, 48,
            )
            # One transpose pass over both uint16 stacks via a single
            # stacked tensor (raw and teacher share dtype and shape).
            both = orient_batch(
                jnp.concatenate([raw, teacher], axis=0), code
            )
            raw, teacher = jnp.split(both, 2, axis=0)
            if needs_fg:
                fg_b = orient_batch(fg_b, code)
        if needs_fg:
            fg = fg_b[..., None]
            if preserve_foreground:
                target = jnp.where(fg_b, raw, teacher)
            else:
                target = teacher
        else:
            fg = jnp.float32(0.0)  # loss weight is identically 1
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
