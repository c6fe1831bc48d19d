"""Flax model zoo: residual 3D U-Net denoisers (BM4DNet family)."""

from exaspim_tpu.models.unet3d import (
    MODEL_REGISTRY,
    N2V2UNet,
    UNet,
    build_model,
)

__all__ = ["UNet", "N2V2UNet", "build_model", "MODEL_REGISTRY"]
