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
