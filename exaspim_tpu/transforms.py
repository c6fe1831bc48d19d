"""Dynamic-range-preserving intensity transforms, TPU-native.

Maps raw uint16 microscopy counts to a bounded, network-friendly domain and
back. The transform suite mirrors the reference's capability set
(reference: src/aind_exaspim_image_compression/machine_learning/transforms.py):

* ``AsinhTransform``    - HDR-style asinh compression (log-like tail).
* ``AnscombeTransform`` - generalized Anscombe VST for Poisson-Gaussian noise.
* ``LinearClipTransform`` - linear normalize + hard clip baseline.
* ``OffsetTransform``   - composes a raw-count pedestal around a frozen base.

Design differences from the reference (which is numpy-only):

* Transforms are **frozen dataclasses registered as JAX static pytree
  nodes**, so they can be closed over or passed through ``jax.jit``
  boundaries; all parameters are Python floats baked into the trace.
* ``forward`` / ``inverse`` / ``inverse_float`` are **backend-polymorphic**:
  they dispatch on the input's array namespace, so the same object works on
  host numpy arrays (data layer) and inside jitted TPU programs (inference
  and training datapaths). Inside ``jit`` everything stays on device.
* The frozen-config discipline is identical: ``build_transform(cfg)`` stamps
  ``.cfg`` onto the instance, ``calibrate_transform`` freezes data-driven
  offsets, and training/validation/inference must construct bit-identical
  mappings (reference transforms.py:441-513).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _xp(x):
    """Selects the array namespace (jnp for jax arrays and tracers)."""
    if isinstance(x, jax.Array):  # tracers are jax.Array instances too
        return jnp
    return np


def _f32(xp, x):
    return xp.asarray(x, dtype=xp.float32)


class IntensityTransform:
    """Abstract base class for count <-> normalized intensity transforms."""

    #: frozen config dict stamped by :func:`build_transform`
    cfg: Optional[Dict[str, Any]] = None

    def forward(self, x):
        """Maps raw counts to the normalized (~[0, 1]) domain."""
        raise NotImplementedError

    def inverse(self, y):
        """Maps normalized values back to raw uint16 counts (clipped)."""
        raise NotImplementedError

    def inverse_float(self, y):
        """Maps normalized values to unclipped floating-point counts."""
        raise NotImplementedError

    def inverse_float_smooth(self, y):
        """Like :meth:`inverse_float`, but guaranteed smooth (nonzero
        gradient) over the whole real line — for use inside losses that
        differentiate through the inverse map (e.g. the σ-aware N2V
        count-space loss). Defaults to :meth:`inverse_float`; transforms
        whose exact inverse clamps (Anscombe clips y at 0) override
        this with a sign-extended variant that agrees on the valid
        range."""
        return self.inverse_float(y)

    # shared clamp-and-quantize tail for `inverse`
    def _quantize(self, counts):
        xp = _xp(counts)
        counts = xp.clip(counts, 0, self.max_count)
        return xp.rint(counts).astype(xp.uint16)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class AsinhTransform(IntensityTransform):
    """HDR-style asinh intensity transform.

    ``forward(x) = arcsinh((x - offset) / scale) / arcsinh((max - offset)/scale)``

    Approximately linear for ``(x - offset) << scale`` and logarithmic for
    ``(x - offset) >> scale``; monotone and invertible over the whole range
    with no bright plateau. Sub-background voxels map to small negative
    values by design (noise-floor symmetry).
    """

    offset: float = 0.0
    scale: float = 32.0
    max_count: float = 65535.0

    def __post_init__(self):
        object.__setattr__(self, "offset", float(self.offset))
        object.__setattr__(self, "scale", float(self.scale))
        object.__setattr__(self, "max_count", float(self.max_count))
        norm = float(np.arcsinh((self.max_count - self.offset) / self.scale))
        object.__setattr__(self, "_norm", norm)

    def forward(self, x):
        xp = _xp(x)
        x = _f32(xp, x)
        y = xp.arcsinh((x - self.offset) / self.scale) / self._norm
        return y.astype(xp.float32)

    def inverse_float(self, y):
        xp = _xp(y)
        y = _f32(xp, y)
        return self.offset + self.scale * xp.sinh(y * self._norm)

    def inverse(self, y):
        return self._quantize(self.inverse_float(y))


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class AnscombeTransform(IntensityTransform):
    """Generalized Anscombe variance-stabilizing transform (Makitalo & Foi).

    Models ``x = gain * Poisson + Normal(offset, read_noise^2)``; sqrt-like,
    so it compresses the bright tail more gently than asinh while making the
    noise approximately homoscedastic. Reduces to ``2*sqrt(x + 3/8)`` at
    ``gain=1, read_noise=0, offset=0``.

    ``unbiased_inverse=True`` uses the asymptotically unbiased constant (1/8),
    appropriate for inverting denoised (expectation) values; ``False`` uses
    the algebraic constant (3/8) which exactly round-trips ``forward``.
    """

    gain: float = 1.0
    read_noise: float = 0.0
    offset: float = 0.0
    max_count: float = 65535.0
    unbiased_inverse: bool = True

    def __post_init__(self):
        object.__setattr__(self, "gain", float(self.gain))
        object.__setattr__(self, "read_noise", float(self.read_noise))
        object.__setattr__(self, "offset", float(self.offset))
        object.__setattr__(self, "max_count", float(self.max_count))
        object.__setattr__(self, "unbiased_inverse", bool(self.unbiased_inverse))
        c_inv = 1.0 / 8.0 if self.unbiased_inverse else 3.0 / 8.0
        object.__setattr__(self, "_c_inv", c_inv)
        norm = float(self._gat(np.asarray(self.max_count, dtype=np.float32)))
        object.__setattr__(self, "_norm", norm)

    def _gat(self, x):
        """Unnormalized generalized Anscombe transform."""
        xp = _xp(x)
        arg = (
            self.gain * (x - self.offset)
            + (3.0 / 8.0) * self.gain**2
            + self.read_noise**2
        )
        return (2.0 / self.gain) * xp.sqrt(xp.maximum(arg, 0.0))

    def forward(self, x):
        xp = _xp(x)
        gat = self._gat(_f32(xp, x))
        return (gat / self._norm).astype(xp.float32)

    def inverse_float(self, y):
        xp = _xp(y)
        d = xp.clip(_f32(xp, y), 0.0, None) * self._norm
        arg = (d * self.gain / 2.0) ** 2
        return self.offset + (
            arg - self._c_inv * self.gain**2 - self.read_noise**2
        ) / self.gain

    def inverse_float_smooth(self, y):
        # Sign-extended inverse: d² → d·|d| keeps the map odd and
        # monotone below y=0 instead of the flat (zero-gradient) clamp,
        # so losses differentiating through it (σ-aware N2V) still
        # learn when the net predicts below the transform's floor.
        # Agrees exactly with inverse_float for y ≥ 0.
        xp = _xp(y)
        d = _f32(xp, y) * self._norm
        arg = d * xp.abs(d) * (self.gain / 2.0) ** 2
        return self.offset + (
            arg - self._c_inv * self.gain**2 - self.read_noise**2
        ) / self.gain

    def inverse(self, y):
        return self._quantize(self.inverse_float(y))


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class LinearClipTransform(IntensityTransform):
    """Linear normalization with a hard brightness clip (A/B baseline).

    Flattens the bright tail above ``clip`` into a non-invertible plateau;
    kept as the thing the compressive transforms are measured against.
    """

    mn: float = 0.0
    mx: float = 1000.0
    clip: float = 8.0
    max_count: float = 65535.0

    def __post_init__(self):
        for f in ("mn", "mx", "clip", "max_count"):
            object.__setattr__(self, f, float(getattr(self, f)))

    def forward(self, x):
        xp = _xp(x)
        x = _f32(xp, x)
        y = (x - self.mn) / (self.mx - self.mn + 1e-8)
        return xp.clip(y, 0.0, self.clip).astype(xp.float32)

    def inverse_float(self, y):
        xp = _xp(y)
        y = _f32(xp, y)
        return y * (self.mx - self.mn) + self.mn

    def inverse(self, y):
        return self._quantize(self.inverse_float(y))


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class OffsetTransform(IntensityTransform):
    """Applies a raw-count offset around a frozen trained transform.

    ``forward(x) = base.forward(x - offset)``;
    ``inverse(y) = base.inverse_float(y) + offset`` (then physical clamp).

    Deliberately leaves the base transform's normalization constants
    unchanged, so it reproduces the exact mapping used for offset-subtracted
    training patches (reference transforms.py:374-411).
    """

    base_transform: IntensityTransform = None
    offset: float = 0.0

    def __post_init__(self):
        object.__setattr__(self, "offset", float(self.offset))

    @property
    def max_count(self):
        return float(self.base_transform.max_count)

    def __getattr__(self, name):
        # Expose non-offset parameters such as scale and gain from the base.
        if name.startswith("__") or name in ("base_transform",):
            raise AttributeError(name)
        return getattr(self.base_transform, name)

    def forward(self, x):
        xp = _xp(x)
        return self.base_transform.forward(_f32(xp, x) - self.offset)

    def inverse_float(self, y):
        return self.base_transform.inverse_float(y) + self.offset

    def inverse_float_smooth(self, y):
        return self.base_transform.inverse_float_smooth(y) + self.offset

    def inverse(self, y):
        return self._quantize(self.inverse_float(y))


class IdentityTransform(IntensityTransform):
    """No-op transform for tests and raw-domain pipelines."""

    max_count = 65535.0

    def forward(self, x):
        xp = _xp(x)
        return _f32(xp, x)

    def inverse_float(self, y):
        xp = _xp(y)
        return _f32(xp, y)

    def inverse(self, y):
        return self._quantize(self.inverse_float(y))


def estimate_offset(sample, percentile=1.0, ignore_zeros=True):
    """Estimates a robust background / black-point in counts.

    Low percentile of the (optionally nonzero) sample; ``ignore_zeros``
    excludes exact zeros so zero-padding outside the imaged volume does not
    drag the estimate to 0 (reference transforms.py:414-438).
    """
    sample = np.asarray(sample, dtype=np.float32).reshape(-1)
    if ignore_zeros:
        nonzero = sample[sample > 0]
        if nonzero.size:
            sample = nonzero
    return float(np.percentile(sample, percentile))


_KINDS = {
    "asinh": AsinhTransform,
    "anscombe": AnscombeTransform,
    "linear": LinearClipTransform,
    "identity": IdentityTransform,
}


def build_transform(cfg):
    """Builds an intensity transform from a frozen config dict.

    ``cfg = {"kind": "asinh"|"anscombe"|"linear"|"identity", "params": {...}}``
    or an offset composition ``{"kind": "offset", "base": <cfg>, "params": {...}}``.
    The originating config is stamped onto the instance as ``.cfg`` so it can
    be serialized with a model checkpoint and rebuilt bit-identically
    (reference transforms.py:441-481).
    """
    kind = cfg["kind"]
    params = cfg.get("params", {})
    if kind == "offset":
        transform = OffsetTransform(build_transform(cfg["base"]), **params)
    elif kind in _KINDS:
        transform = _KINDS[kind](**params)
    else:
        raise ValueError(f"Unknown transform kind: {kind}")
    # dataclasses are frozen; cfg rides along via object.__setattr__
    object.__setattr__(transform, "cfg", {**cfg, "params": dict(params)})
    return transform


def calibrate_transform(cfg, sample):
    """Freezes data-driven params into a transform config, once, globally.

    Only the black-point ``offset`` is calibrated (low percentile of the
    sample). The input cfg is not mutated; the returned cfg is what should be
    serialized with the model and reused verbatim at inference
    (reference transforms.py:484-513).
    """
    cfg = {**cfg, "params": dict(cfg.get("params", {}))}
    calib = cfg.get("calibrate", {})
    if calib.get("offset", False):
        cfg["params"]["offset"] = estimate_offset(
            sample, percentile=calib.get("offset_percentile", 1.0)
        )
    return cfg


def with_offset(transform, offset):
    """Composes a raw-count background offset around a trained transform.

    The returned mapping is exactly ``transform.forward(x - offset)``; the
    inverse restores the offset. Linear transforms shift both bounds instead
    of wrapping (equivalent mapping, and inverse restores the offset);
    compressive transforms wrap in :class:`OffsetTransform` so the
    normalization denominator is untouched (reference transforms.py:516-562).
    """
    if isinstance(transform, OffsetTransform):
        transform = transform.base_transform
    cfg = getattr(transform, "cfg", None)
    if cfg is None:
        raise ValueError("transform has no cfg; construct it via build_transform")
    offset = float(offset)
    if cfg["kind"] == "linear":
        params = dict(cfg.get("params", {}))
        params["mn"] = float(transform.mn) + offset
        params["mx"] = float(transform.mx) + offset
        return build_transform({**cfg, "params": params})
    return build_transform(
        {"kind": "offset", "base": cfg, "params": {"offset": offset}}
    )
