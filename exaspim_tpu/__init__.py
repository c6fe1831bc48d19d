"""exaspim_tpu — TPU-native ExaSPIM image denoise-then-compress framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``AllenNeuralDynamics/aind-exaspim-image-compression``: classical BM4D
teacher generation, a learned 3D U-Net denoiser ("BM4DNet"), signal-
preserving training, tiled whole-volume inference with overlap-average
stitching, and Zarr/blosc compression-ratio evaluation — designed for TPU
meshes (pjit/shard_map + ICI halo exchange) instead of a single CUDA GPU.

Layer map (mirrors reference SURVEY §1, redesigned TPU-first):

* ``exaspim_tpu.transforms``   — intensity transforms (host + device).
* ``exaspim_tpu.ops``          — device compute: filters, SSIM, metrics, BM4D.
* ``exaspim_tpu.models``       — Flax UNet3D / N2V2UNet.
* ``exaspim_tpu.losses``       — signal-preserving Charbonnier loss.
* ``exaspim_tpu.compression``  — blosc/zstd chunked codecs + cratio metric.
* ``exaspim_tpu.inference``    — jitted tiled inference engine.
* ``exaspim_tpu.parallel``     — mesh, sharding, halo-exchange inference.
* ``exaspim_tpu.data``         — datasets, prefetching loader, SWC reader.
* ``exaspim_tpu.train``        — trainer, checkpoints.
* ``exaspim_tpu.utils``        — image IO (Zarr/OME-Zarr), cloud helpers.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: exaspim_tpu.predict, .Trainer, .bm4d, …

    Submodules import JAX and friends; deferring keeps
    ``import exaspim_tpu`` instant for tooling.
    """
    lazy = {
        "predict": ("exaspim_tpu.inference", "predict"),
        "predict_patch": ("exaspim_tpu.inference", "predict_patch"),
        "denoise_volume": ("exaspim_tpu.pipeline", "denoise_volume"),
        "Trainer": ("exaspim_tpu.train", "Trainer"),
        "build_transform": ("exaspim_tpu.transforms", "build_transform"),
        "bm4d": ("exaspim_tpu.ops.bm4d", "bm4d"),
        "UNet": ("exaspim_tpu.models", "UNet"),
        "N2V2UNet": ("exaspim_tpu.models", "N2V2UNet"),
        "compute_cratio": ("exaspim_tpu.compression", "compute_cratio"),
        "ssim3d": ("exaspim_tpu.ops.ssim", "ssim3d"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'exaspim_tpu' has no attribute {name!r}")
