"""Device-resident rate for whole-block (single 256-patch) inference
vs the planner's current choice. Usage: python scripts/patch256_ab.py [P]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
from exaspim_tpu.inference import build_tiled_program, commit_params
from exaspim_tpu.models import build_model
from exaspim_tpu.ops.ssim import psnr
from exaspim_tpu.train.checkpoint import load_checkpoint
from exaspim_tpu.transforms import build_transform

OVERLAP, TRIM = 12, 5


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    clean, _ = neurite_phantom((256, 256, 256), n_tubes=24, seed=0)
    img = noisy_observation(clean, seed=1)

    ckpt = load_checkpoint("checkpoints/bm4dnet.msgpack")
    model = build_model(ckpt["model_config"], dtype=jnp.bfloat16,
                        blocked="auto")
    params = commit_params(ckpt["params"])
    transform = build_transform(ckpt["transform"])
    checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    dimg = jax.device_put(jnp.asarray(img))

    program, starts = build_tiled_program(
        model, transform, img.shape, P, OVERLAP, TRIM, batch_size=1
    )
    dstarts = jnp.asarray(starts)
    print(f"P={P} n={len(starts)} compiling...", flush=True)
    t0 = time.perf_counter()
    out = program(params, dimg, dstarts)
    float(checksum(out))
    print(f"  warmup {time.perf_counter() - t0:.1f}s", flush=True)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(checksum(program(params, dimg, dstarts)))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"  P={P}: device {dt:.3f}s = {img.size / dt / 1e6:.1f} "
          f"Mvox/s (times {['%.3f' % t for t in times]})", flush=True)
    o = np.asarray(out).astype(np.float32)
    dr = float(clean.max())
    print("  psnr gain %.2f dB" % (
        float(psnr(o, clean, dr))
        - float(psnr(img.astype(np.float32), clean, dr))), flush=True)


if __name__ == "__main__":
    main()
