"""Device-resident tiled-inference rate at different patch sizes
(bench.py device_dt methodology). Usage: python scripts/patch_ab_dev.py [P...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
from exaspim_tpu.inference import (
    build_tiled_program,
    commit_params,
    plan_tiling,
)
from exaspim_tpu.models import build_model
from exaspim_tpu.train.checkpoint import load_checkpoint
from exaspim_tpu.transforms import build_transform

OVERLAP, TRIM = 12, 5


def main():
    patches = [int(a) for a in sys.argv[1:]] or [64, 96]
    clean, _ = neurite_phantom((256, 256, 256), n_tubes=24, seed=0)
    img = noisy_observation(clean, seed=1)

    ckpt = load_checkpoint("checkpoints/bm4dnet.msgpack")
    model = build_model(ckpt["model_config"], dtype=jnp.bfloat16,
                        blocked="auto")
    params = commit_params(ckpt["params"])
    transform = build_transform(ckpt["transform"])
    checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    dimg = jax.device_put(jnp.asarray(img))

    for P in patches:
        _, batch = plan_tiling(img.shape, OVERLAP, candidates=(P,))
        program, starts = build_tiled_program(
            model, transform, img.shape, P, OVERLAP, TRIM, batch
        )
        dstarts = jnp.asarray(starts)
        print(f"P={P} batch={batch} n={len(starts)} compiling...",
              flush=True)
        t0 = time.perf_counter()
        float(checksum(program(params, dimg, dstarts)))
        print(f"  warmup {time.perf_counter() - t0:.1f}s", flush=True)
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(checksum(program(params, dimg, dstarts)))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"  P={P}: device {dt:.3f}s = {img.size / dt / 1e6:.1f} "
              f"Mvox/s (times {['%.3f' % t for t in times]})", flush=True)


if __name__ == "__main__":
    main()
