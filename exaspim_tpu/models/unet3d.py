"""3D U-Net denoiser ("BM4DNet") — TPU-native Flax implementation.

Capability parity with the reference model family (reference unet3d.py:20-571):
a 4-down/4-up residual U-Net over 64³ patches with GroupNorm(gcd(8, C)) +
LeakyReLU(0.01) double-conv blocks, trilinear (or transposed-conv)
upsampling, a 1×1×1 output head, and ``output = input + logits``; plus the
Noise2Void2 variant (anti-aliased MaxBlurPool downsampling with a separable
binomial 3³ kernel, no highest-resolution skip).

TPU-first design decisions (not a port):

* **NDHWC (channels-last) layout** — XLA's TPU conv emitter tiles
  channels onto the 128-wide lane dimension, so the channel axis lives
  last; the reference's NCDHW torch layout would force relayouts.
* **bf16 compute / f32 params** — ``dtype=jnp.bfloat16`` runs every conv
  on the MXU at full rate with f32 accumulation (``GroupNorm`` statistics
  stay f32). This replaces CUDA AMP + GradScaler (reference train.py:116);
  bf16 needs no loss scaling.
* **Static shapes, pure functions** — the whole model jits to a single
  XLA program; conv+GroupNorm+LeakyReLU fuse into MXU epilogues.
* **MaxBlurPool** = stride-1 ``reduce_window`` max → separable depthwise
  binomial blur at stride 2, all XLA-native.

``UNet.config`` round-trips through checkpoints exactly like the
reference's ``model.config`` (reference unet3d.py:93-100, train.py:453).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["UNet", "N2V2UNet", "build_model", "MODEL_REGISTRY"]


def _norm_groups(channels: int) -> int:
    return math.gcd(8, channels)


class DoubleConv(nn.Module):
    """(Conv3D 3³ → GroupNorm(gcd(8,C)) → LeakyReLU 0.01) × 2.

    Mirrors reference unet3d.py:137-208 semantics with an optional
    narrower mid-channel (used on the decoder path).
    """

    out_channels: int
    mid_channels: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = self.mid_channels or self.out_channels
        for channels in (mid, self.out_channels):
            x = nn.Conv(
                channels, (3, 3, 3), padding="SAME", use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
            # Flax computes GroupNorm mean/var in float32 internally even
            # under a bf16 compute dtype, so no explicit f32 round-trip is
            # needed — that cast pair cost 2 full-tensor HBM passes per
            # block. Epsilon matches torch.nn.GroupNorm (reference blocks).
            x = nn.GroupNorm(
                num_groups=_norm_groups(channels), dtype=self.dtype,
                param_dtype=jnp.float32, epsilon=1e-5,
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


def max_pool3d(x, window=2, stride=None):
    """3D max pool over NDHWC input."""
    stride = stride or window
    return nn.max_pool(
        x, (window,) * 3, strides=(stride,) * 3, padding="VALID"
    )


def _binomial_kernel(n=3, dtype=jnp.float32):
    """1D binomial (Pascal-row) kernel, normalized — e.g. [1,2,1]/4."""
    row = jnp.asarray(
        [math.comb(n - 1, k) for k in range(n)], dtype=dtype
    )
    return row / row.sum()


def blur_pool3d(x, stride=2, dtype=jnp.float32):
    """Separable depthwise binomial 3³ blur at ``stride`` (anti-aliasing).

    Equivalent capability to the reference's MaxBlurPool3D blur stage
    (reference unet3d.py:493-535) expressed as three 1D depthwise convs —
    each is a tiny stencil XLA fuses; replicate ("edge") padding matches
    the reference's ``F.pad(mode="replicate")``.
    """
    k = _binomial_kernel(3, dtype=x.dtype)
    # Replicate-pad once for the 3-wide window, then valid depthwise convs.
    x = jnp.pad(x, [(0, 0)] + [(1, 1)] * 3 + [(0, 0)], mode="edge")
    c = x.shape[-1]
    for axis in range(1, 4):
        shape = [1, 1, 1]
        shape[axis - 1] = 3
        kern = k.reshape(shape + [1, 1]) * jnp.ones(
            (1, 1, 1, 1, c), dtype=x.dtype
        )
        strides = [1, 1, 1]
        strides[axis - 1] = stride
        x = jax.lax.conv_general_dilated(
            x, kern,
            window_strides=strides,
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=c,
        )
    return x


def max_blur_pool3d(x, dtype=jnp.float32):
    """Anti-aliased downsampling: stride-1 max → binomial blur stride 2."""
    x = max_pool3d(x, window=2, stride=1)
    return blur_pool3d(x, stride=2, dtype=dtype)


@functools.lru_cache(maxsize=128)
def _linear_resize_matrix(n_in, n_out, align_corners):
    """(n_out, n_in) 1-D linear-interpolation matrix as a host constant.

    ``align_corners=False`` uses half-pixel centers with edge clamp —
    numerically identical to ``jax.image.resize(method="trilinear")``.
    ``align_corners=True`` matches ``torch.nn.Upsample(align_corners=True)``
    (the reference's upsampler, reference unet3d.py:289-291).
    """
    import numpy as np

    if n_in == 0 or n_out == 0:
        return np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    if align_corners:
        src = np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
    else:
        src = np.clip(
            (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5, 0, n_in - 1
        )
    i0 = np.minimum(np.floor(src).astype(int), n_in - 2)
    w = (src - i0).astype(np.float32)
    mat = np.zeros((n_out, n_in), np.float32)
    mat[np.arange(n_out), i0] = 1.0 - w
    mat[np.arange(n_out), i0 + 1] = w
    return mat


def resize_trilinear(x, target_spatial, align_corners=False):
    """Trilinear resize of an NDHWC volume to ``target_spatial`` (D,H,W).

    Trilinear interpolation is separable, so this is three small dense
    matmuls (one per spatial axis) — they run on the MXU in the compute
    dtype, unlike the gather-based ``jax.image.resize`` lowering.
    """
    mats = [
        jnp.asarray(
            _linear_resize_matrix(x.shape[ax + 1], t, bool(align_corners)),
            dtype=x.dtype,
        )
        for ax, t in enumerate(target_spatial)
    ]
    x = jnp.einsum("ij,bjhwc->bihwc", mats[0], x)
    x = jnp.einsum("ij,bdjwc->bdiwc", mats[1], x)
    x = jnp.einsum("ij,bdhjc->bdhic", mats[2], x)
    return x


class Up(nn.Module):
    """Upsample ×2, pad to skip's spatial shape, concat skip, DoubleConv.

    Trilinear path keeps channels and halves them in the mid conv;
    transposed-conv path halves channels in the upsample (reference
    unet3d.py:258-343).
    """

    out_channels: int
    trilinear: bool = True
    skip: bool = True
    dtype: jnp.dtype = jnp.float32
    align_corners: bool = False

    @nn.compact
    def __call__(self, x, skip_x=None):
        if self.trilinear:
            target = tuple(2 * s for s in x.shape[1:4])
            x = resize_trilinear(x, target, self.align_corners)
        else:
            x = nn.ConvTranspose(
                x.shape[-1] // 2, (2, 2, 2), strides=(2, 2, 2),
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        if skip_x is not None and self.skip:
            # Pad (never crop — encoder sizes are >= after //2 rounding)
            # to the skip connection's spatial shape, centered.
            pads = [(0, 0)]
            for axis in range(1, 4):
                diff = skip_x.shape[axis] - x.shape[axis]
                pads.append((diff // 2, diff - diff // 2))
            pads.append((0, 0))
            x = jnp.pad(x, pads)
            x = jnp.concatenate([skip_x, x], axis=-1)
        mid = x.shape[-1] // 2 if self.trilinear else None
        return DoubleConv(
            self.out_channels, mid_channels=mid, dtype=self.dtype
        )(x)


class UNet(nn.Module):
    """Residual 3D U-Net denoiser (flagship model).

    Input/output: ``(B, D, H, W, 1)`` in the transform domain. Returns
    ``x + logits`` — the net predicts a residual correction
    (reference unet3d.py:131-133).
    """

    width_multiplier: float = 1.0
    trilinear: bool = True
    base_channels: Sequence[int] = (32, 64, 128, 256, 512)
    dtype: jnp.dtype = jnp.float32
    #: "zeros" starts the residual net as the identity (best for
    #: teacher-supervised training); "normal" is needed for
    #: self-supervised (N2V) training, where a zero head blocks all
    #: interior gradients at init.
    head_init: str = "zeros"
    #: Upsampling grid convention. False = half-pixel centers (the
    #: jax.image.resize convention, production default); True matches
    #: the reference's torch Upsample(align_corners=True) exactly (used
    #: by the torch↔Flax parity oracle).
    align_corners: bool = False

    def _head_kernel_init(self):
        if self.head_init == "zeros":
            return nn.initializers.zeros
        if self.head_init == "normal":
            return nn.initializers.lecun_normal()
        raise ValueError(f"unknown head_init {self.head_init!r}")

    def _channels(self):
        chans = [int(c * self.width_multiplier) for c in self.base_channels]
        for c in chans:
            if c <= 0:
                raise ValueError(
                    f"width_multiplier={self.width_multiplier} collapses a "
                    f"stage to {c} channels"
                )
        return chans

    @property
    def config(self):
        """Constructor kwargs for checkpoint round-trip."""
        return {
            "model": type(self).__name__,
            "width_multiplier": self.width_multiplier,
            "trilinear": self.trilinear,
            "base_channels": list(self.base_channels),
            "head_init": self.head_init,
            "align_corners": self.align_corners,
        }

    @nn.compact
    def __call__(self, x):
        c1, c2, c3, c4, c5 = self._channels()
        factor = 2 if self.trilinear else 1
        dt = self.dtype
        xin = x
        x = x.astype(dt)
        s1 = DoubleConv(c1, dtype=dt)(x)
        s2 = DoubleConv(c2, dtype=dt)(max_pool3d(s1))
        s3 = DoubleConv(c3, dtype=dt)(max_pool3d(s2))
        s4 = DoubleConv(c4, dtype=dt)(max_pool3d(s3))
        x = DoubleConv(c5 // factor, dtype=dt)(max_pool3d(s4))
        ac = self.align_corners
        x = Up(c4 // factor, self.trilinear, dtype=dt, align_corners=ac)(x, s4)
        x = Up(c3 // factor, self.trilinear, dtype=dt, align_corners=ac)(x, s3)
        x = Up(c2 // factor, self.trilinear, dtype=dt, align_corners=ac)(x, s2)
        x = Up(c1, self.trilinear, dtype=dt, align_corners=ac)(x, s1)
        # Zero-init head: the residual net starts as the identity map, so
        # an untrained model is a no-op denoiser (stable early training).
        logits = nn.Conv(
            1, (1, 1, 1), dtype=dt, param_dtype=jnp.float32,
            kernel_init=self._head_kernel_init(),
        )(x)
        return xin + logits.astype(xin.dtype)


class N2V2UNet(UNet):
    """Noise2Void2 variant: MaxBlurPool downsampling, no top-level skip.

    Capability parity with reference unet3d.py:392-571. The highest-
    resolution skip connection is removed (checkerboard-artifact fix) and
    all poolings are anti-aliased.
    """

    @nn.compact
    def __call__(self, x):
        c1, c2, c3, c4, c5 = self._channels()
        factor = 2 if self.trilinear else 1
        dt = self.dtype
        xin = x
        x = x.astype(dt)
        s1 = DoubleConv(c1, dtype=dt)(x)
        s2 = DoubleConv(c2, dtype=dt)(max_blur_pool3d(s1, dtype=dt))
        s3 = DoubleConv(c3, dtype=dt)(max_blur_pool3d(s2, dtype=dt))
        s4 = DoubleConv(c4, dtype=dt)(max_blur_pool3d(s3, dtype=dt))
        x = DoubleConv(c5 // factor, dtype=dt)(max_blur_pool3d(s4, dtype=dt))
        ac = self.align_corners
        x = Up(c4 // factor, self.trilinear, dtype=dt, align_corners=ac)(x, s4)
        x = Up(c3 // factor, self.trilinear, dtype=dt, align_corners=ac)(x, s3)
        x = Up(c2 // factor, self.trilinear, dtype=dt, align_corners=ac)(x, s2)
        # Final upsample without the s1 skip (reference unet3d.py:538-571).
        x = Up(c1, self.trilinear, skip=False, dtype=dt, align_corners=ac)(x, None)
        # Re-pad to input spatial size if rounding shrank it.
        pads = [(0, 0)]
        for axis in range(1, 4):
            diff = xin.shape[axis] - x.shape[axis]
            pads.append((diff // 2, diff - diff // 2))
        pads.append((0, 0))
        x = jnp.pad(x, pads)
        logits = nn.Conv(
            1, (1, 1, 1), dtype=dt, param_dtype=jnp.float32,
            kernel_init=self._head_kernel_init(),
        )(x)
        return xin + logits.astype(xin.dtype)


MODEL_REGISTRY = {"UNet": UNet, "N2V2UNet": N2V2UNet}


def build_model(config, dtype=jnp.float32):
    """Rebuild a model from its ``config`` dict (checkpoint round-trip).

    Unlike the reference's loader (which NameErrors on N2V2UNet
    checkpoints, reference inference.py:291), every registered model
    class dispatches correctly.
    """
    cfg = dict(config)
    name = cfg.pop("model", "UNet")
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    if "base_channels" in cfg:
        cfg["base_channels"] = tuple(cfg["base_channels"])
    return MODEL_REGISTRY[name](dtype=dtype, **cfg)
