"""Capture a device trace of the headline tiled-inference program.

Builds the exact program bench.py times (256³ block, patch 64/overlap
12/trim 5/batch 32, trained checkpoint when present), runs it
device-resident, and writes a profiler trace; read with
``python scripts/xplane_top.py <out_dir>``.

Usage: python scripts/tiled_profile.py [never|auto] [out_dir] [block]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/prof_tiled_{mode}"
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    patch, overlap, trim, batch = 64, 12, 5, 32

    from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
    from exaspim_tpu.inference import (
        _model_apply,
        _tiled_program,
        generate_patch_starts,
    )

    clean, _ = neurite_phantom((block,) * 3, n_tubes=24, seed=0)
    img = noisy_observation(clean, seed=1)

    ckpt_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "bm4dnet.msgpack",
    )
    if os.path.exists(ckpt_path):
        from exaspim_tpu.models import build_model
        from exaspim_tpu.train.checkpoint import load_checkpoint
        from exaspim_tpu.transforms import build_transform

        ckpt = load_checkpoint(ckpt_path)
        model = build_model(
            ckpt["model_config"], dtype=jnp.bfloat16, blocked=mode
        )
        params, transform = ckpt["params"], build_transform(
            ckpt["transform"])
    else:
        from exaspim_tpu.models import UNet
        from exaspim_tpu.transforms import build_transform

        model = UNet(width_multiplier=1.0, dtype=jnp.bfloat16, blocked=mode)
        params = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, patch, patch, patch, 1))
        )["params"]
        transform = build_transform(
            {"kind": "asinh", "params": {"offset": 100.0, "scale": 60.0}}
        )

    starts = generate_patch_starts(img.shape, patch, overlap)
    stride = patch - overlap
    grid_dims = tuple(
        len(range(0, max(d - patch + stride, 1), stride))
        for d in img.shape
    )
    padded = tuple(
        max(int(starts[:, d].max()) + patch, img.shape[d])
        for d in range(3)
    )
    n_pad = (-len(starts)) % batch
    if n_pad:
        starts = np.concatenate(
            [starts, np.repeat(starts[-1:], n_pad, axis=0)]
        )
    program = _tiled_program(
        _model_apply(model), transform, padded, img.shape, patch,
        stride, batch, trim, grid_dims, False,
    )
    from exaspim_tpu.inference import commit_params

    params = commit_params(params)
    dstarts = jnp.asarray(starts)
    dimg = jax.device_put(jnp.asarray(img))
    checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    float(checksum(program(params, dimg, dstarts)))  # compile + run
    t0 = time.perf_counter()
    for _ in range(3):
        float(checksum(program(params, dimg, dstarts)))
    dt = (time.perf_counter() - t0) / 3
    print(f"device_s per block: {dt:.4f}  "
          f"({img.size / dt / 1e6:.2f} Mvox/s)")

    with jax.profiler.trace(out):
        for _ in range(2):
            float(checksum(program(params, dimg, dstarts)))
    print(f"trace written to {out} (2 runs)")


if __name__ == "__main__":
    main()
