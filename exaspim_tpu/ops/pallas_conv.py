"""Pallas TPU kernel: 3×3×3 conv via space-to-depth blocked GEMM.

Why: the UNet's FLOP-dominant top stages run 3³ convs with 32-64
channels. XLA's conv emitter is bound by the channel dimensions there —
an MXU pass contracts K=C_in and produces N=C_out lanes, and with
C=32 both sit at 1/4 of the 128-wide systolic array (~15 TF/s measured
of 142 TF/s achievable on this chip). This kernel re-shapes the work so
the MXU runs full width:

* the volume is **space-to-depth blocked** over (y, x): each 2×2
  spatial block's 4 parities fold into the lane dimension, giving
  ``4·C_in`` input lanes and ``4·C_out`` output lanes (≥128 for C≥32);
* per (batch, z) the kernel builds a small **im2col panel in VMEM**
  (never in HBM — materializing it there costs more than the GEMM):
  12 shifted copies of the blocked slab, one per (t_z, Δq_y, Δq_x)
  tap group, giving a contraction depth ``K = 12·4·C_in``;
* one MXU GEMM ``(M=H/2·W/2, K) @ (K, 4·C_out)`` per (batch, z)
  computes all four output parities of a z-slice at once. The packed
  weight matrix carries each original tap exactly once per output
  parity, so FLOPs are inflated only by the tap-group padding
  (48/27 ≈ 1.8×) while MXU utilization rises ~5×.

The z axis stays unblocked: its three taps become three kernel operands
that are *views of the same HBM buffer* selected by BlockSpec index
maps offset by 0/1/2 — no data duplication.

Numerics: accumulation in float32 (``preferred_element_type``), output
cast to the input dtype. Exactly the same math as
``lax.conv_general_dilated`` with SAME padding and no bias (checked to
bf16 tolerance by tests/test_pallas_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

__all__ = ["blocked_conv3d", "supports_blocked_conv"]

_LANE = 128


def supports_blocked_conv(shape, cin, cout):
    """True when (B, D, H, W, cin) @ 3³ → cout qualifies for the kernel."""
    _, d, h, w = shape[0], shape[1], shape[2], shape[3]
    return (
        cin % 32 == 0
        and cout % 32 == 0
        and d % 2 == 0 and h % 2 == 0 and w % 2 == 0
        and (h // 2) * (w // 2) >= 256
    )


@functools.lru_cache(maxsize=64)
def _pack_weights_fn(cin, cout):
    def pack(k3):
        """(3,3,3,cin,cout) → (12·4·cin, 4·cout) blocked GEMM matrix."""
        li, lo = 4 * cin, 4 * cout
        bp = jnp.zeros((12 * li, lo), k3.dtype)
        for tz in range(3):
            for dqy in range(2):
                for dqx in range(2):
                    t = (tz * 2 + dqy) * 2 + dqx
                    for py in range(2):
                        for px in range(2):
                            for ry in range(2):
                                for rx in range(2):
                                    ty = 2 * dqy + py - ry - 1
                                    tx = 2 * dqx + px - rx - 1
                                    if not (-1 <= ty <= 1 and -1 <= tx <= 1):
                                        continue
                                    r0 = t * li + (py * 2 + px) * cin
                                    c0 = (ry * 2 + rx) * cout
                                    bp = bp.at[
                                        r0:r0 + cin, c0:c0 + cout
                                    ].set(k3[tz, ty + 1, tx + 1])
        return bp

    return jax.jit(pack)


def _pack_input(x):
    """(B,D,H,W,C) → zero-pad 1 → y/x space-to-depth, with the Δq_x
    tap shift pre-expanded into a doubled lane axis.

    Output ``(B, D+2, (H/2+1)·(W/2), 8C)``: row = g_y·(W/2) + q_x,
    lanes = (s, p_y, p_x, c) where ``s ∈ {0,1}`` selects the x-block at
    ``q_x + s``. Doubling the lanes costs 2× HBM for this temporary but
    makes every in-kernel tap copy a *static, tile-aligned* 2-D slice —
    Mosaic rejects dynamic sub-lane offsets that are not 8-row aligned,
    and the natural (q_y+Δq_y)·(W/2+1)+Δq_x offsets never are.
    """
    b, d, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    h2p, w2p = (h + 2) // 2, (w + 2) // 2
    xp = xp.reshape(b, d + 2, h2p, 2, w2p, 2, c)
    xp = xp.transpose(0, 1, 2, 4, 3, 5, 6)  # (B, D+2, h2p, w2p, 2, 2, C)
    w2 = w // 2
    aug = jnp.stack([xp[:, :, :, :w2], xp[:, :, :, 1:w2 + 1]],
                    axis=4)  # (B, D+2, h2p, w2, 2(s), 2(py), 2(px), C)
    return aug.reshape(b, d + 2, h2p * w2, 8 * c)


def _unpack_output(y, b, d, h, w, cout):
    """(B, D, H/2·W/2, 4·cout) → (B, D, H, W, cout)."""
    h2, w2 = h // 2, w // 2
    y = y.reshape(b, d, h2, w2, 2, 2, cout)
    y = y.transpose(0, 1, 2, 4, 3, 5, 6)
    return y.reshape(b, d, h, w, cout)


def _kernel(h2, w2, li, x0, x1, x2, bp, out, acc):
    """Build the im2col panel in VMEM (12 static tile-aligned copies),
    then one full-width MXU GEMM."""
    m = h2 * w2
    for tz, xr in enumerate((x0, x1, x2)):
        for dqy in (0, 1):
            for dqx in (0, 1):
                col = ((tz * 2 + dqy) * 2 + dqx) * li
                acc[:, col:col + li] = xr[
                    0, 0, dqy * w2:dqy * w2 + m, dqx * li:(dqx + 1) * li
                ]
    out[0, 0] = jnp.dot(
        acc[...], bp[...], preferred_element_type=jnp.float32
    ).astype(out.dtype)


@functools.partial(
    jax.jit, static_argnames=("interpret",)
)
def _blocked_conv_fwd(x, k3, interpret=False):
    b, d, h, w, cin = x.shape
    cout = k3.shape[-1]
    h2, w2 = h // 2, w // 2
    li, lo = 4 * cin, 4 * cout
    m, k = h2 * w2, 12 * li
    rp = (h2 + 1) * w2

    xb = _pack_input(x)
    bp = _pack_weights_fn(cin, cout)(k3).astype(x.dtype)

    in_spec = [
        pl.BlockSpec(
            (1, 1, rp, 2 * li),
            (lambda bi, zi, _v=v: (bi, zi + _v, 0, 0)),
            memory_space=pltpu.VMEM,
        )
        for v in range(3)
    ]
    yb = pl.pallas_call(
        functools.partial(_kernel, h2, w2, li),
        out_shape=jax.ShapeDtypeStruct((b, d, m, lo), x.dtype),
        grid=(b, d),
        in_specs=in_spec + [
            pl.BlockSpec((k, lo), lambda bi, zi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, m, lo), lambda bi, zi: (bi, zi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((m, k), x.dtype)],
        interpret=interpret,
    )(xb, xb, xb, bp)
    return _unpack_output(yb, b, d, h, w, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def blocked_conv3d(x, k3, interpret=False):
    """3³ SAME conv (no bias), NDHWC × DHWIO — MXU-blocked Pallas path.

    Drop-in equal to ``lax.conv_general_dilated(x, k3, (1,1,1), "SAME")``
    for shapes passing :func:`supports_blocked_conv`.
    """
    return _blocked_conv_fwd(x, k3, interpret)


def _ref_conv(x, k3):
    return jax.lax.conv_general_dilated(
        x, k3, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _vjp_fwd(x, k3, interpret):
    return _blocked_conv_fwd(x, k3, interpret), (x, k3)


def _vjp_bwd(interpret, res, g):
    x, k3 = res
    # dL/dx is itself a 3³ conv (flipped taps, in/out channels swapped) —
    # reuse the blocked kernel; dL/dW is a huge-K contraction XLA already
    # runs at full MXU width, so take it from the reference conv's vjp.
    k3_t = jnp.flip(k3, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = _blocked_conv_fwd(g, k3_t, interpret)
    dw = jax.grad(
        lambda kk: jnp.vdot(
            _ref_conv(x, kk).astype(jnp.float32), g.astype(jnp.float32)
        )
    )(k3)
    return dx, dw


blocked_conv3d.defvjp(_vjp_fwd, _vjp_bwd)
