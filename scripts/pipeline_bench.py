"""End-to-end production Zarr→Zarr wall-clock measurement.

Re-measures ``pipeline.denoise_volume`` on a local Zarr v3 synthetic
volume (the round-1 number predates the 3-axis super-tiling rework and
two checkpoint swaps). Reports Mvox/s for:

* the default slab plan (full-plane z-slabs), and
* a forced-small ``--max-block-voxels`` run exercising 3-axis streaming
  on silicon,

plus a device-only re-run of the same blocks (so the IO-vs-device bound
is named, not guessed). Reference analogue: the whole production path,
reference scripts/evaluate_bm4dnet.py:51-181.

    python scripts/pipeline_bench.py [--n 512] [--out /tmp/pipe_bench]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=512)
    p.add_argument("--shape", type=int, nargs=3,
                   help="volume shape override (z y x); the 3-axis "
                        "streaming case is a wide-plane anisotropic "
                        "volume (ExaSPIM tiles are wide in y/x), not a "
                        "cube — on a cube the patch-wide halos dwarf "
                        "the cores")
    p.add_argument("--out", default="/tmp/pipe_bench")
    p.add_argument("--slab-z", type=int, default=256)
    p.add_argument("--max-block-voxels", type=int,
                   default=64 * 600 * 600,
                   help="forced block bound for the 3-axis streaming "
                        "run")
    p.add_argument("--skip-small", action="store_true")
    p.add_argument("--skip-slabs", action="store_true")
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    except Exception:
        pass
    import jax.numpy as jnp

    from exaspim_tpu.compression import best_codec, compute_cratio
    from exaspim_tpu.data.synthetic import (
        neurite_phantom,
        noisy_observation,
    )
    from exaspim_tpu.pipeline import denoise_volume
    from exaspim_tpu.train import restore_pipeline
    from exaspim_tpu.utils import img_io

    os.makedirs(args.out, exist_ok=True)
    shape = tuple(args.shape) if args.shape else (args.n,) * 3
    n = args.n
    nvox = shape[0] * shape[1] * shape[2]
    tag = "x".join(map(str, shape))
    src_path = os.path.join(args.out, f"noisy_{tag}.zarr")
    if not os.path.exists(src_path):
        print(f"# building {tag} phantom + local zarr …", flush=True)
        clean, _ = neurite_phantom(
            shape, n_tubes=max(4, 24 * nvox // 256 ** 3), seed=0
        )
        noisy = noisy_observation(clean, seed=1)
        del clean
        img_io.write_zarr(noisy[None, None], src_path)
        del noisy

    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "bm4dnet.msgpack",
    )
    model, params, transform = restore_pipeline(ckpt, dtype=jnp.bfloat16)

    results = {"shape": list(shape)}
    # default_slabs runs twice: the first pays XLA compiles (cold,
    # first-brain cost), the second is the steady-state production
    # number (a whole-brain run streams thousands of such volumes).
    runs = [] if args.skip_slabs else [
        ("default_slabs_cold", dict(slab_z=args.slab_z)),
        ("default_slabs_warm", dict(slab_z=args.slab_z))]
    if not args.skip_small:
        runs.append((
            "forced_3axis",
            dict(slab_z=args.slab_z,
                 max_block_voxels=args.max_block_voxels),
        ))
    for name, kw in runs:
        out_path = os.path.join(args.out, "denoised_" +
                                name.replace("_cold", "").replace(
                                    "_warm", "") + ".zarr")
        t0 = time.time()
        denoise_volume(
            src_path, model, params, transform, output_path=out_path,
            patch_size="auto", progress=True, **kw,
        )
        dt = time.time() - t0
        results[name] = {
            "wall_s": round(dt, 1),
            "mvox_per_s": round(nvox / dt / 1e6, 2),
        }
        print(json.dumps({name: results[name]}), flush=True)

    # Name the bound: device-resident rate on one representative block
    # of the default plan (same program), vs the end-to-end number.
    src = img_io.read(src_path)
    zb = min(args.slab_z + 64, shape[0])
    block = np.asarray(src[(Ellipsis, slice(0, zb))][0, 0]) \
        if len(src.shape) == 5 else np.asarray(src[:zb])
    if block.ndim == 5:
        block = block[0, 0]
    from exaspim_tpu.inference import (
        build_tiled_program, commit_params, plan_tiling,
    )

    patch, batch = plan_tiling(block.shape, 12)
    program, starts = build_tiled_program(
        model, transform, block.shape, patch, 12, 5, batch
    )
    dparams = commit_params(params)
    dstarts = jnp.asarray(starts)
    dblock = jax.device_put(jnp.asarray(block))
    checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    float(checksum(program(dparams, dblock, dstarts)))
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        float(checksum(program(dparams, dblock, dstarts)))
    ddt = (time.time() - t0) / reps
    results["device_only_block"] = {
        "block": list(block.shape),
        "mvox_per_s": round(block.size / ddt / 1e6, 2),
    }

    codec = best_codec(clevel=6)
    out_name = ("denoised_default_slabs.zarr" if not args.skip_slabs
                else "denoised_forced_3axis.zarr")
    out_path = os.path.join(args.out, out_name)
    den = np.asarray(img_io.read(out_path)[...])[0, 0]
    noisy = np.asarray(img_io.read(src_path)[...])[0, 0]
    results["cratio_noisy"] = compute_cratio(noisy, codec)
    results["cratio_denoised"] = compute_cratio(den, codec)
    results["cratio_gain"] = round(
        results["cratio_denoised"] / results["cratio_noisy"], 3
    )
    print(json.dumps(results), flush=True)
    with open(os.path.join(args.out, f"results_{tag}.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
