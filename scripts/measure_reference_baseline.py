"""Measure the CPU reference path to anchor ``bench.py``'s vs_baseline.

Runs the upstream package's own tiled inference (torch-CPU UNet, the
production config: patch 64, overlap 12, trim 5, batch 32 — reference
inference.py:28-36) on a synthetic 256³ uint16 block and records
voxels/sec into ``baseline_cpu.json`` at the repo root.

The reference is imported from /root/reference (read-only) — it is
executed for measurement, never vendored.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference/src")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# voxels/sec is block-size invariant for tiled inference; 128³ keeps the
# torch-CPU measurement under ten minutes (256³ needs >10 min).
BLOCK = int(os.environ.get("BASELINE_BLOCK", "128"))


def main():
    import torch

    from aind_exaspim_image_compression.inference import predict
    from aind_exaspim_image_compression.machine_learning.transforms import (
        build_transform,
    )
    from aind_exaspim_image_compression.machine_learning.unet3d import UNet

    from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation

    clean, _ = neurite_phantom((BLOCK, BLOCK, BLOCK), n_tubes=24, seed=0)
    img = noisy_observation(clean, seed=1)

    torch.set_num_threads(os.cpu_count() or 1)
    torch.manual_seed(0)
    model = UNet().to("cpu").eval()
    transform = build_transform(
        {"kind": "asinh", "params": {"offset": 100.0, "scale": 60.0}}
    )

    t0 = time.perf_counter()
    predict(
        img, model, transform, patch_size=64, overlap=12, trim=5,
        batch_size=32, verbose=True,
    )
    dt = time.perf_counter() - t0
    result = {
        "voxels_per_sec": img.size / dt,
        "seconds_per_block": dt,
        "block": [BLOCK] * 3,
        "backend": "torch-cpu reference (aind-exaspim-image-compression)",
        "threads": torch.get_num_threads(),
    }
    out = os.path.join(REPO, "baseline_cpu.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
