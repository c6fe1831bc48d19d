"""Device-mesh construction helpers.

The reference has no device-level parallelism at all (SURVEY §2.2); in
this framework a :class:`jax.sharding.Mesh` is the substrate for both
data-parallel training (batch axis) and spatially-sharded inference
(volume z-axis with ICI halo exchange).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicated", "sharded_along", "P"]


def make_mesh(n_devices=None, axis="data", devices=None):
    """1D mesh over ``n_devices`` (default: all available)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def replicated(mesh):
    """Sharding that replicates an array on every mesh device."""
    return NamedSharding(mesh, P())


def sharded_along(mesh, axis_name, dim=0, ndim=1):
    """Sharding that splits array dim ``dim`` across mesh axis ``axis_name``."""
    spec = [None] * ndim
    spec[dim] = axis_name
    return NamedSharding(mesh, P(*spec))
