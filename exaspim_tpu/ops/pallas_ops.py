"""Pallas elementwise-kernel PATTERN EXAMPLE — not a production path.

Status (explicit, round 5): every production consumer of the intensity
transform (train/eval steps, tiled inference, the streaming pipeline)
applies it *inside* a larger jitted program where XLA fuses the
identical chain into the neighboring op at full bandwidth — a
standalone fused kernel cannot beat that, and no standalone eager
transform pass exists in the production datapath. These kernels are
therefore kept as the framework's documented reference for the
elementwise Pallas pattern (flatten to (rows, 128) lanes, grid over
row tiles, VPU math, dtype-hop casts Mosaic requires), exercised by
tests/test_pallas_ops.py for parity against
:class:`exaspim_tpu.transforms.AsinhTransform`.

What they implement: the full forward/inverse asinh mapping — pedestal
subtract, scale, asinh (as its log form; ``asinh`` itself has no Mosaic
lowering), normalize, and on the inverse side sinh, de-normalize, clamp
and uint16 quantize — each as a single VMEM-tiled pass
(reference transforms.py:65-153 applies the same math on the host with
numpy, a full extra pass over each block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["asinh_forward", "asinh_inverse"]

_TILE = 256
_LANES = 128


def _pad_2d(x):
    """Flatten to (rows, 128) and pad rows to the tile multiple."""
    flat = x.reshape(-1)
    n = flat.shape[0]
    cols = _LANES
    rows = -(-n // cols)
    rows_padded = -(-rows // _TILE) * _TILE
    flat = jnp.pad(flat, (0, rows_padded * cols - n))
    return flat.reshape(rows_padded, cols), n


def _elementwise_call(kernel, x2d, out_dtype, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, cols = x2d.shape
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, cols), out_dtype),
        in_specs=[pl.BlockSpec(
            (_TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM,
        )],
        out_specs=pl.BlockSpec(
            (_TILE, cols), lambda i: (i, 0), memory_space=pltpu.VMEM,
        ),
        grid=(rows // _TILE,),
        interpret=interpret,
    )(x2d)


@functools.partial(
    jax.jit, static_argnames=("offset", "scale", "norm", "interpret")
)
def asinh_forward(x, offset=0.0, scale=1.0, norm=1.0, interpret=False):
    """Fused ``arcsinh((x − offset)/scale)/norm`` over any-shape input.

    Matches :class:`exaspim_tpu.transforms.AsinhTransform.forward`
    bit-for-bit up to the log-form identity
    ``asinh(v) = log(v + sqrt(v² + 1))``.
    """
    inv_scale = np.float32(1.0 / scale)
    inv_norm = np.float32(1.0 / norm)
    off = np.float32(offset)

    def kernel(x_ref, o_ref):
        # Mosaic can't cast uint16→f32 directly; hop through int32.
        xv = x_ref[...]
        if xv.dtype != jnp.float32:
            xv = xv.astype(jnp.int32).astype(jnp.float32)
        v = (xv - off) * inv_scale
        o_ref[...] = jnp.log(v + jnp.sqrt(v * v + 1.0)) * inv_norm

    x = jnp.asarray(x)
    x2d, n = _pad_2d(x)
    out = _elementwise_call(kernel, x2d, jnp.float32, interpret)
    return out.reshape(-1)[:n].reshape(x.shape)


@functools.partial(
    jax.jit,
    static_argnames=("offset", "scale", "norm", "max_count", "interpret"),
)
def asinh_inverse(y, offset=0.0, scale=1.0, norm=1.0, max_count=65535.0,
                  interpret=False):
    """Fused ``clip(round(sinh(y·norm)·scale + offset))`` → uint16."""
    sc = np.float32(scale)
    nm = np.float32(norm)
    off = np.float32(offset)
    mx = np.float32(max_count)

    def kernel(y_ref, o_ref):
        v = y_ref[...].astype(jnp.float32) * nm
        # sinh(v) = (exp(v) − exp(−v)) / 2 — no direct Mosaic lowering.
        s = 0.5 * (jnp.exp(v) - jnp.exp(-v))
        counts = s * sc + off
        counts = jnp.clip(counts, 0.0, mx)
        # f32→uint16 via int32 (direct cast unsupported in Mosaic).
        o_ref[...] = jnp.round(counts).astype(jnp.int32).astype(
            jnp.uint16
        )

    y = jnp.asarray(y)
    y2d, n = _pad_2d(y)
    out = _elementwise_call(kernel, y2d, jnp.uint16, interpret)
    return out.reshape(-1)[:n].reshape(y.shape)
