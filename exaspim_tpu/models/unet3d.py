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


def _seg_info(x):
    """(is_blocked, cin_splits, (h, w)) for array | Blocked | segments."""
    from exaspim_tpu.ops.nb_conv import Blocked

    if isinstance(x, (tuple, list)):
        return True, tuple(s.channels for s in x), (x[0].h, x[0].w)
    if isinstance(x, Blocked):
        return True, (x.channels,), (x.h, x.w)
    return False, (int(x.shape[-1]),), (int(x.shape[2]), int(x.shape[3]))


def _ensure_array(x):
    """Collapse a Blocked (or segment tuple) back to NDHWC."""
    from exaspim_tpu.ops.nb_conv import Blocked

    if isinstance(x, (tuple, list)):
        return jnp.concatenate([_ensure_array(s) for s in x], axis=-1)
    if isinstance(x, Blocked):
        return x.unblock()
    return x


def _nb_ok(h, w, cin_splits, cout, mode, isz=2):
    """Trace-time gate: use the MXU-blocked Pallas conv here?

    Measured on the real chip (scripts/nb_bench.py): the nb kernel wins
    where XLA's conv emitter is channel-bound — 64³×C32 conv 29 ms (XLA)
    → 15.4 ms (nb) — but at 32³×C64 XLA already runs at 44 TF/s, hence
    the ≥ 64×64 spatial gate. Off-TPU the XLA conv is always used
    (mode "force" runs the kernel interpreted, for equivalence tests).
    """
    from exaspim_tpu.ops.nb_conv import nb_conv_vmem_ok, supports_nb_conv

    if mode == "never":
        return False
    if jax.default_backend() != "tpu" and mode != "force":
        return False
    return (
        cout % 32 == 0
        and supports_nb_conv(h, w, cin_splits)
        and (h // 2) * (w // 2) >= 1024
        # Large planes (patch ≥ 96 inference) must leave a z-block that
        # fits VMEM or the kernel cannot compile at all.
        and nb_conv_vmem_ok(h, w, cin_splits, cout, isz)
    )


def _leaky(x):
    from exaspim_tpu.ops.nb_conv import Blocked

    fn = functools.partial(nn.leaky_relu, negative_slope=0.01)
    return x.map(fn) if isinstance(x, Blocked) else fn(x)


def max_pool3d_blocked(xb):
    """2³ stride-2 max pool consuming a Blocked input → NDHWC at ½ res.

    In blocked layout the 2×2 y/x window is the four parity lane groups
    and the z window is two consecutive slabs — one cheap reduction, no
    relayout of the full-resolution tensor.
    """
    data = xb.interior()
    b, d, m, l4 = data.shape
    c = l4 // 4
    d2 = d // 2  # odd trailing z slab is dropped, like VALID pooling
    data = data[:, :2 * d2]
    # Parity max via four contiguous lane slices (lanes are (p_y,p_x,c);
    # splitting the minor-most lane dim with a reshape forces cross-lane
    # shuffles), then a z-pair max on the sublane-major axis.
    par = jnp.maximum(
        jnp.maximum(data[..., 0:c], data[..., c:2 * c]),
        jnp.maximum(data[..., 2 * c:3 * c], data[..., 3 * c:4 * c]),
    )
    y = par.reshape(b, d2, 2, m, c).max(axis=2)
    return y.reshape(b, d2, xb.h // 2, xb.w // 2, c)


class Conv(nn.Module):
    """3³ SAME conv, no bias — layout-polymorphic.

    Given an NDHWC array, applies ``lax.conv_general_dilated``. Given a
    ``Blocked`` activation (or a tuple of them — a skip concat expressed
    as lane segments), applies the natural-phase blocked Pallas kernel
    (ops/nb_conv.py) and returns a ``Blocked``: inside a blocked stage
    no layout conversion ever happens.

    Param layout (``kernel``: (3,3,3,cin,cout), lecun-normal init) and
    the auto-generated module name ("Conv_N") match ``nn.Conv`` exactly,
    so checkpoints are interchangeable with the plain-XLA variant and
    the torch parity oracle is unaffected.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    #: 3 → 3³ SAME conv, no bias (DoubleConv body). 1 → 1×1×1 pointwise
    #: conv with bias (the output head); on a Blocked input this is a
    #: lane-tiled GEMM (kron(I₄, W)) — reshaping the big tensor to
    #: (…, 4, C) instead costs a ~6 ms layout copy (profiled).
    window: int = 3
    use_bias: bool = False
    kernel_init: object = nn.initializers.lecun_normal()
    #: emit per-lane (Σy, Σy²) from the blocked conv epilogue so the
    #: following GroupNorm skips its stats read pass (ops/nb_conv.py
    #: ``nb_conv3d_stats``). Only the blocked 3³ path can emit; other
    #: paths return ``(y, None)`` when this is set.
    emit_stats: bool = False

    @nn.compact
    def __call__(self, x):
        from exaspim_tpu.ops.nb_conv import (
            Blocked,
            nb_conv3d,
            nb_conv3d_stats,
        )

        blocked_in, cin_splits, (h, w) = _seg_info(x)
        cin = sum(cin_splits)
        kw = (self.window,) * 3
        kernel = self.param(
            "kernel", self.kernel_init,
            kw + (cin, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        k = kernel.astype(self.dtype)
        if blocked_in and self.window == 1:
            from exaspim_tpu.ops.nb_conv import zero_row_halos

            wtile = jnp.kron(
                jnp.eye(4, dtype=self.dtype),
                k.reshape(cin, self.features),
            )
            y = jnp.einsum(
                "bdml,lf->bdmf", x.data.astype(self.dtype), wtile
            )
            if bias is not None:
                # Re-zero the resident halo rows the bias just filled —
                # the Blocked contract every consumer relies on (fused
                # into the einsum epilogue, no extra pass).
                y = zero_row_halos(
                    y + jnp.tile(bias, 4).astype(self.dtype), w // 2
                )
            yb = Blocked(y, h, w)
            return (yb, None) if self.emit_stats else yb
        if blocked_in:
            from exaspim_tpu.ops.nb_conv import zero_row_halos

            segs = x if isinstance(x, (tuple, list)) else (x,)
            xds = tuple(s.data.astype(self.dtype) for s in segs)
            interp = jax.default_backend() != "tpu"
            if self.emit_stats:
                yb, s1, s2 = nb_conv3d_stats(
                    xds, k, h, w, cin_splits, interp
                )
                if bias is not None:
                    # Shift the fused sums by the bias algebraically
                    # (Σ(y+β) = Σy + n·β; Σ(y+β)² = Σy² + 2βΣy + n·β²)
                    # on the tiny (B, lanes) tensors instead of
                    # re-reading the activation.
                    bl = jnp.tile(bias, 4).astype(jnp.float32)[None, :]
                    n_lane = jnp.float32(
                        yb.shape[1] * (h // 2) * (w // 2)
                    )
                    s2 = s2 + 2.0 * bl * s1 + n_lane * bl * bl
                    s1 = s1 + n_lane * bl
                    yb = zero_row_halos(
                        yb + jnp.tile(bias, 4).astype(self.dtype),
                        w // 2,
                    )
                return Blocked(yb, h, w), (s1, s2)
            yb = nb_conv3d(xds, k, h, w, cin_splits, interp)
            if bias is not None:
                # Lanes hold 4 phase-interleaved channel copies; re-zero
                # the resident halo rows the broadcast add just filled.
                yb = zero_row_halos(
                    yb + jnp.tile(bias, 4).astype(self.dtype), w // 2
                )
            return Blocked(yb, h, w)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return (y, None) if self.emit_stats else y


class GroupNorm(nn.Module):
    """GroupNorm over the channel axis — layout-polymorphic.

    Matches ``nn.GroupNorm`` semantics (stats in f32 over all spatial
    positions and within-group channels; eps like torch.nn.GroupNorm,
    reference blocks) and its param names/shapes ("scale"/"bias", (C,)),
    and additionally normalizes ``Blocked`` activations in place: the
    four parity lane groups are spatial positions, so they join the
    reduction axes and the whole stage stays blocked.
    """

    num_groups: int
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, stats=None):
        from exaspim_tpu.ops.nb_conv import Blocked

        blocked = isinstance(x, Blocked)
        data = x.data if blocked else x
        c = data.shape[-1] // 4 if blocked else data.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # TPU-shaped two-pass GroupNorm, numerically flax-style (f32
        # stats, var = E[x²] − E[x]²):
        #   1. one spatial reduction to per-channel sums — the lane dim
        #      stays intact (no (g, c/g) or parity reshapes of the big
        #      tensor: splitting the minor-most 128 lanes forces
        #      cross-lane shuffles and was measured at ~10 ms/512 MB),
        #   2. fold parities/groups on the tiny (B, nc) result,
        #   3. one fused multiply-add ``x·a + b`` with a lane-aligned
        #      (B, 1, …, nc) broadcast.
        nc = data.shape[-1]
        xf = data.astype(jnp.float32)
        red = tuple(range(1, xf.ndim - 1))
        if blocked and stats is not None:
            # Stats fused into the conv epilogue (nb_conv3d_stats):
            # per-lane sums over the interior arrive precomputed, so
            # this layer's own full-tensor stats read pass disappears.
            n_true = data.shape[1] * x.m
            s1 = stats[0] / n_true
            s2 = stats[1] / n_true
        elif blocked:
            # Halo-resident rows: the zeros don't perturb the SUMS, but
            # the count must be the true interior voxel count.
            n_true = data.shape[1] * x.m
            s1 = xf.sum(axis=red) / n_true         # (B, nc)
            s2 = (xf * xf).sum(axis=red) / n_true  # (B, nc)
        else:
            s1 = xf.mean(axis=red)            # (B, nc)
            s2 = (xf * xf).mean(axis=red)     # (B, nc)
        if blocked:
            b_n = s1.shape[0]
            s1 = s1.reshape(b_n, 4, c).mean(axis=1)
            s2 = s2.reshape(b_n, 4, c).mean(axis=1)
        b_n = s1.shape[0]
        mean_g = s1.reshape(b_n, g, c // g).mean(axis=-1, keepdims=True)
        m2_g = s2.reshape(b_n, g, c // g).mean(axis=-1, keepdims=True)
        var_g = jnp.maximum(m2_g - mean_g * mean_g, 0.0)
        inv = jax.lax.rsqrt(var_g + self.epsilon)        # (B, g, 1)
        a_c = (inv * scale.reshape(1, g, c // g)).reshape(b_n, c)
        b_c = bias.reshape(1, c) - (mean_g * inv
                                    * scale.reshape(1, g, c // g)
                                    ).reshape(b_n, c)
        if blocked:
            a_c = jnp.tile(a_c, (1, 4))
            b_c = jnp.tile(b_c, (1, 4))
        bshape = (b_n,) + (1,) * (xf.ndim - 2) + (nc,)
        y = (xf * a_c.reshape(bshape) + b_c.reshape(bshape)).astype(
            self.dtype)
        if blocked:
            # The affine's ``b_c`` landed in the resident halo rows —
            # re-zero them (elementwise, fuses with the multiply-add;
            # also kills the halo cotangent path in the VJP).
            from exaspim_tpu.ops.nb_conv import zero_row_halos

            return Blocked(zero_row_halos(y, x.w // 2), x.h, x.w)
        return y


class DoubleConv(nn.Module):
    """(Conv3D 3³ → GroupNorm(gcd(8,C)) → LeakyReLU 0.01) × 2.

    Mirrors reference unet3d.py:137-208 semantics with an optional
    narrower mid-channel (used on the decoder path).

    Layout planning happens here: before each conv, the activation is
    packed into the MXU-blocked layout when the conv qualifies
    (:func:`_nb_ok`), or unpacked when it doesn't; GroupNorm/LeakyReLU
    follow the current layout. The return value may be a ``Blocked`` —
    callers either keep the blocked span going (pool, skip, head) or
    call :func:`_ensure_array`.
    """

    out_channels: int
    mid_channels: int | None = None
    dtype: jnp.dtype = jnp.float32
    blocked: str = "auto"
    #: True only for checkpoints imported from the reference torch
    #: format, whose convs carry a pre-GroupNorm bias (a per-channel
    #: shift GN cannot absorb exactly across a group). Native training
    #: stays bias-free (the bias is near-redundant and costs a fusion).
    use_bias: bool = False
    #: fuse GroupNorm's stats reduction into the blocked conv epilogue
    #: (execution detail, like ``blocked``): the conv emits per-lane
    #: Σy/Σy² and GN skips its full-tensor stats read pass.
    fuse_gn_stats: bool = False

    @nn.compact
    def __call__(self, x):
        from exaspim_tpu.ops.nb_conv import Blocked

        mid = self.mid_channels or self.out_channels
        for channels in (mid, self.out_channels):
            is_b, splits, (h, w) = _seg_info(x)
            ok = _nb_ok(h, w, splits, channels, self.blocked,
                        jnp.dtype(self.dtype).itemsize)
            if ok and not is_b:
                x = Blocked.block(x.astype(self.dtype))
            elif not ok and is_b:
                x = _ensure_array(x)
            emit = self.fuse_gn_stats and ok
            x = Conv(channels, dtype=self.dtype,
                     use_bias=self.use_bias, emit_stats=emit)(x)
            stats = None
            if emit:
                x, stats = x
            x = GroupNorm(
                num_groups=_norm_groups(channels), dtype=self.dtype,
                epsilon=1e-5,
            )(x, stats)
            x = _leaky(x)
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


def resize_trilinear_blocked(x, align_corners=False):
    """Trilinear ×2 upsample of an NDHWC volume, emitted directly in the
    natural-phase blocked layout (``Blocked`` at (2H, 2W), depth 2D).

    The four (p_y, p_x) output parities are separable row-subsets of the
    1-D interpolation matrices, so this is the same three MXU einsums as
    :func:`resize_trilinear` split into four quarter-outputs whose lane
    concat IS the blocked layout — no big relayout ever materializes.
    (Profiled: a 512 MB ``to_blocked`` transpose next to a Pallas call
    costs ~5.4 ms itself plus ~18 ms of collateral layout damage in the
    neighboring conv fusions.)
    """
    from exaspim_tpu.ops.nb_conv import Blocked

    b, d, h, w, c = x.shape
    mz = jnp.asarray(
        _linear_resize_matrix(d, 2 * d, bool(align_corners)), x.dtype
    )
    x = jnp.einsum("ij,bjhwc->bihwc", mz, x)
    my = _linear_resize_matrix(h, 2 * h, bool(align_corners))
    mx = _linear_resize_matrix(w, 2 * w, bool(align_corners))
    parts = []
    for py in (0, 1):
        ty = jnp.asarray(my[py::2], x.dtype)      # rows y_out = 2g_y+p_y
        t = jnp.einsum("ij,bdjwc->bdiwc", ty, x)
        for px in (0, 1):
            tx = jnp.asarray(mx[px::2], x.dtype)
            q = jnp.einsum("ij,bdhjc->bdhic", tx, t)
            parts.append(q.reshape(b, 2 * d, h * w, c))
    from exaspim_tpu.ops.nb_conv import _row_pad

    p = _row_pad(w)  # blocked at (2h, 2w) → w2 = w
    data = jnp.pad(
        jnp.concatenate(parts, axis=-1), ((0, 0), (0, 0), (p, p), (0, 0))
    )
    return Blocked(data, 2 * h, 2 * w)


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
    blocked: str = "auto"
    conv_bias: bool = False
    fuse_gn_stats: bool = False

    @nn.compact
    def __call__(self, x, skip_x=None):
        from exaspim_tpu.ops.nb_conv import Blocked

        x = _ensure_array(x)
        if self.trilinear:
            blocked_resize = False
            if skip_x is not None and self.skip and isinstance(
                skip_x, Blocked
            ):
                # Keep the blocked span end-to-end: upsample straight
                # into blocked layout and express the concat as lane
                # segments for the blocked conv — neither a relayout
                # nor a concat ever materializes.
                cat = skip_x.channels + int(x.shape[-1])
                shapes_match = (
                    skip_x.data.shape[1] == 2 * x.shape[1]
                    and (skip_x.h, skip_x.w)
                    == (2 * x.shape[2], 2 * x.shape[3])
                )
                blocked_resize = shapes_match and _nb_ok(
                    skip_x.h, skip_x.w,
                    (skip_x.channels, int(x.shape[-1])), cat // 2,
                    self.blocked, jnp.dtype(self.dtype).itemsize,
                )
            if blocked_resize:
                x = (
                    skip_x,
                    resize_trilinear_blocked(
                        x.astype(self.dtype), self.align_corners
                    ),
                )
            else:
                target = tuple(2 * s for s in x.shape[1:4])
                x = resize_trilinear(x, target, self.align_corners)
        else:
            x = nn.ConvTranspose(
                x.shape[-1] // 2, (2, 2, 2), strides=(2, 2, 2),
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        if skip_x is not None and self.skip and not isinstance(x, tuple):
            if isinstance(skip_x, Blocked):
                skip_x = skip_x.unblock()
            # Pad (never crop — encoder sizes are >= after //2 rounding)
            # to the skip's spatial shape, centered.
            pads = [(0, 0)]
            for axis in range(1, 4):
                diff = skip_x.shape[axis] - x.shape[axis]
                pads.append((diff // 2, diff - diff // 2))
            pads.append((0, 0))
            x = jnp.pad(x, pads)
            x = jnp.concatenate([skip_x, x], axis=-1)
        if isinstance(x, tuple):
            cat_channels = sum(s.channels for s in x)
        else:
            cat_channels = x.shape[-1]
        mid = cat_channels // 2 if self.trilinear else None
        return DoubleConv(
            self.out_channels, mid_channels=mid, dtype=self.dtype,
            blocked=self.blocked, use_bias=self.conv_bias,
            fuse_gn_stats=self.fuse_gn_stats,
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
    #: True (reference behavior, unet3d.py:131-133): ``output = input +
    #: logits``. False: the head's logits ARE the output — required for
    #: blind-spot (Noise2Void) training, where the residual form learns
    #: ``target − substituted_center`` and misfires on unmasked inputs
    #: at inference (measured: PSNR collapses 54 → 25 dB).
    residual: bool = True
    #: True for checkpoints imported from the reference torch format
    #: (``import_torch_checkpoint``): the reference's DoubleConv convs
    #: carry a pre-GroupNorm bias (reference unet3d.py:149-208) that GN
    #: cannot absorb exactly. Natively trained models keep this False.
    conv_bias: bool = False
    #: Conv dispatch (execution detail, NOT part of ``config``):
    #: "auto" uses the MXU-blocked Pallas conv on TPU where it wins,
    #: "never" forces plain XLA convs, "force" runs the blocked kernel
    #: in interpret mode off-TPU (equivalence tests only — slow).
    blocked: str = "auto"
    #: GroupNorm stats fused into the blocked conv epilogue (execution
    #: detail, NOT part of ``config``; only affects the blocked path).
    #: Default on: measured faster and bitwise-stat-identical; the VJP
    #: folds stats cotangents so training is exact too (ops/nb_conv.py
    #: ``nb_conv3d_stats``; parity pinned by tests/test_nb_conv.py).
    fuse_gn_stats: bool = True

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
            "residual": self.residual,
            "conv_bias": self.conv_bias,
        }

    @nn.compact
    def __call__(self, x):
        c1, c2, c3, c4, c5 = self._channels()
        factor = 2 if self.trilinear else 1
        dt = self.dtype
        bk = self.blocked
        xin = x
        x = x.astype(dt)
        from exaspim_tpu.ops.nb_conv import Blocked

        def pool(s):
            return (max_pool3d_blocked(s) if isinstance(s, Blocked)
                    else max_pool3d(s))

        cb = self.conv_bias
        fs = self.fuse_gn_stats
        s1 = DoubleConv(c1, dtype=dt, blocked=bk, use_bias=cb,
                        fuse_gn_stats=fs)(x)
        s2 = DoubleConv(c2, dtype=dt, blocked=bk, use_bias=cb,
                        fuse_gn_stats=fs)(pool(s1))
        s3 = DoubleConv(c3, dtype=dt, blocked=bk, use_bias=cb,
                        fuse_gn_stats=fs)(pool(s2))
        s4 = DoubleConv(c4, dtype=dt, blocked=bk, use_bias=cb,
                        fuse_gn_stats=fs)(pool(s3))
        x = DoubleConv(
            c5 // factor, dtype=dt, blocked=bk, use_bias=cb,
            fuse_gn_stats=fs,
        )(pool(s4))
        ac = self.align_corners
        up = functools.partial(
            Up, trilinear=self.trilinear, dtype=dt, align_corners=ac,
            blocked=bk, conv_bias=cb, fuse_gn_stats=fs,
        )
        x = up(c4 // factor)(x, s4)
        x = up(c3 // factor)(x, s3)
        x = up(c2 // factor)(x, s2)
        x = up(c1)(x, s1)
        # Zero-init head: the residual net starts as the identity map, so
        # an untrained model is a no-op denoiser (stable early training).
        # On a blocked activation the head runs as a lane-tiled GEMM and
        # only the tiny single-channel logits tensor is ever unblocked.
        head = Conv(
            1, dtype=dt, window=1, use_bias=True,
            kernel_init=self._head_kernel_init(),
        )
        logits = head(x)
        if isinstance(logits, Blocked):
            logits = logits.unblock()
        if not self.residual:
            return logits.astype(xin.dtype)
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
        bk = self.blocked
        xin = x
        x = x.astype(dt)
        from exaspim_tpu.ops.nb_conv import Blocked

        def pool(s):
            return max_blur_pool3d(_ensure_array(s), dtype=dt)

        # Encoder stays unblocked: MaxBlurPool needs the NDHWC layout
        # (separable replicate-padded blur), and unblocking a 512 MB
        # stage mid-encoder costs more in relayouts than the blocked
        # convs save (see Conv/_nb_ok notes).
        enc = "never" if bk == "auto" else bk
        cb = self.conv_bias
        s1 = DoubleConv(c1, dtype=dt, blocked=enc, use_bias=cb)(x)
        s2 = DoubleConv(c2, dtype=dt, blocked=enc, use_bias=cb)(pool(s1))
        s3 = DoubleConv(c3, dtype=dt, blocked=enc, use_bias=cb)(pool(s2))
        s4 = DoubleConv(c4, dtype=dt, blocked=enc, use_bias=cb)(pool(s3))
        x = DoubleConv(
            c5 // factor, dtype=dt, blocked=enc, use_bias=cb
        )(pool(s4))
        ac = self.align_corners
        up = functools.partial(
            Up, trilinear=self.trilinear, dtype=dt, align_corners=ac,
            blocked=bk, conv_bias=cb, fuse_gn_stats=self.fuse_gn_stats,
        )
        x = up(c4 // factor)(x, s4)
        x = up(c3 // factor)(x, s3)
        x = up(c2 // factor)(x, s2)
        # Final upsample without the s1 skip (reference unet3d.py:538-571).
        x = up(c1, skip=False)(x, None)
        head = Conv(
            1, dtype=dt, window=1, use_bias=True,
            kernel_init=self._head_kernel_init(),
        )
        if isinstance(x, Blocked) and x.data.shape[1] == xin.shape[1] \
                and (x.h, x.w) == (xin.shape[2], xin.shape[3]):
            logits = head(x).unblock()
        else:
            # Re-pad to input spatial size if rounding shrank it.
            x = _ensure_array(x)
            pads = [(0, 0)]
            for axis in range(1, 4):
                diff = xin.shape[axis] - x.shape[axis]
                pads.append((diff // 2, diff - diff // 2))
            pads.append((0, 0))
            x = jnp.pad(x, pads)
            logits = head(x)
        if not self.residual:
            return logits.astype(xin.dtype)
        return xin + logits.astype(xin.dtype)


MODEL_REGISTRY = {"UNet": UNet, "N2V2UNet": N2V2UNet}


def build_model(config, dtype=jnp.float32, blocked="auto",
                fuse_gn_stats=True):
    """Rebuild a model from its ``config`` dict (checkpoint round-trip).

    Unlike the reference's loader (which NameErrors on N2V2UNet
    checkpoints, reference inference.py:291), every registered model
    class dispatches correctly.

    ``blocked`` is an execution detail (never stored in configs): "auto"
    uses the MXU-blocked conv path on TPU — a measured net win for both
    inference (106 vs 133 ms fwd) and training (326 vs 347 ms/step,
    batch-32 64³) since the rolling-z dL/dW kernel landed
    (see ops/nb_conv.py, scripts/step_bench.py).
    """
    cfg = dict(config)
    cfg["blocked"] = blocked
    cfg["fuse_gn_stats"] = fuse_gn_stats
    name = cfg.pop("model", "UNet")
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown model {name!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    if "base_channels" in cfg:
        cfg["base_channels"] = tuple(cfg["base_channels"])
    return MODEL_REGISTRY[name](dtype=dtype, **cfg)
