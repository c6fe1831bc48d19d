"""A/B: tiled inference at patch 64 vs planner-chosen patch on a 256³
block (real chip). Usage: python scripts/patch_ab.py [P1 P2 ...]"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
from exaspim_tpu.inference import commit_params, plan_tiling, predict
from exaspim_tpu.models import build_model
from exaspim_tpu.train.checkpoint import load_checkpoint
from exaspim_tpu.transforms import build_transform


def main():
    patches = [int(a) for a in sys.argv[1:]] or [64, 96]
    clean, _ = neurite_phantom((256, 256, 256), n_tubes=24, seed=0)
    img = noisy_observation(clean, seed=1)

    ckpt = load_checkpoint("checkpoints/bm4dnet.msgpack")
    model = build_model(ckpt["model_config"], dtype=jnp.bfloat16,
                        blocked="auto")
    params = commit_params(ckpt["params"])
    transform = build_transform(ckpt["transform"])

    print("plan_tiling(256^3, 12):", plan_tiling((256, 256, 256), 12))
    outs = {}
    for P in patches:
        _, batch = plan_tiling((256,) * 3, 12, candidates=(P,))
        kw = dict(patch_size=P, overlap=12, trim=5, batch_size=batch)
        print(f"P={P} batch={batch} compiling...", flush=True)
        t0 = time.perf_counter()
        out = predict(img, model, params, transform, **kw)
        print(f"  warmup {time.perf_counter() - t0:.1f}s", flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = predict(img, model, params, transform, **kw)
            times.append(time.perf_counter() - t0)
        best = min(times)
        outs[P] = out
        print(f"  P={P}: {best:.3f}s = {img.size / best / 1e6:.1f} Mvox/s "
              f"(times {['%.3f' % t for t in times]})", flush=True)
    if len(outs) == 2:
        a, b = (outs[p].astype(np.float32) for p in patches)
        print("mean |diff| counts:", float(np.abs(a - b).mean()),
              "max:", float(np.abs(a - b).max()))


if __name__ == "__main__":
    main()
