"""Data layer: patch caches, prefetching loader, synthetic phantoms.

Live cloud-backed sampling datasets live in
:mod:`exaspim_tpu.data.live`; the on-disk cache contract in
:mod:`exaspim_tpu.data.cache` matches the reference byte-for-byte
(raw/teacher/fg ``.npy`` + ``transform.json``).
"""

from exaspim_tpu.data.cache import (
    CACHE_FILES,
    CachedPatchDataset,
    CachedValidateDataset,
    allocate_cache,
    load_cache_transform,
    write_cache,
)
from exaspim_tpu.data.loader import (
    DataLoader,
    make_count_train_collate,
    make_count_val_collate,
    make_train_collate,
    make_val_collate,
    prefetch_to_device,
)
from exaspim_tpu.data.synthetic import (
    SyntheticPatchDataset,
    make_synthetic_cache,
    neurite_phantom,
    noisy_observation,
)

__all__ = [
    "CACHE_FILES",
    "CachedPatchDataset",
    "CachedValidateDataset",
    "DataLoader",
    "SyntheticPatchDataset",
    "allocate_cache",
    "load_cache_transform",
    "make_synthetic_cache",
    "make_count_train_collate",
    "make_count_val_collate",
    "make_train_collate",
    "make_val_collate",
    "neurite_phantom",
    "noisy_observation",
    "prefetch_to_device",
    "write_cache",
]
