"""Evaluate checkpoint quality on the bench phantom (no timing).

Runs the exact quality protocol of ``bench.py`` (256³ neurite phantom,
seeds 0/1, blosc-zstd-6 chunked cratio, PSNR/SSIM vs clean) for one or
more checkpoints so candidates can be compared before swapping
``checkpoints/bm4dnet.msgpack``.

    python scripts/ckpt_quality.py ckptA.ckpt [ckptB.msgpack ...] \
        [--block 256] [--patch auto]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpts", nargs="+")
    p.add_argument("--block", type=int, default=256)
    p.add_argument("--family", choices=("a", "b"), default="a",
                   help="phantom family: a = bench default; b = denser/"
                        "dimmer/wider-PSF/low-pedestal generalization "
                        "probe (data/synthetic.py neurite_phantom_b)")
    p.add_argument("--seed-clean", type=int, default=0)
    p.add_argument("--seed-noise", type=int, default=1)
    p.add_argument("--volume-offset", choices=("none", "auto"),
                   default="none",
                   help="'auto' mirrors the production per-volume "
                        "pedestal calibration (reference "
                        "inference.py:302-339 / evaluate_bm4dnet "
                        "background_offset): the frozen transform is "
                        "composed with the DELTA between this volume's "
                        "estimated background and the estimate on the "
                        "family the transform was calibrated for")
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
        neurite_phantom_b,
        noisy_observation,
    )
    from exaspim_tpu.inference import predict
    from exaspim_tpu.models import build_model
    from exaspim_tpu.ops.ssim import psnr, ssim3d
    from exaspim_tpu.train.checkpoint import load_checkpoint
    from exaspim_tpu.transforms import build_transform

    b = args.block
    if args.family == "a":
        clean, _ = neurite_phantom(
            (b, b, b), n_tubes=24, seed=args.seed_clean
        )
    else:
        clean, _ = neurite_phantom_b((b, b, b), seed=args.seed_clean)
    img = noisy_observation(clean, seed=args.seed_noise)
    codec = best_codec(clevel=6)
    cr_noisy = compute_cratio(img, codec)
    drange = float(clean.max())
    base = {
        "family": args.family,
        "cratio_noisy": cr_noisy,
        "psnr_noisy_db": round(
            float(psnr(img.astype(np.float32), clean, drange)), 2
        ),
        "ssim_noisy": round(float(ssim3d(
            img.astype(np.float32), clean, data_range=drange
        )), 4),
    }
    print(json.dumps(base))

    for path in args.ckpts:
        ckpt = load_checkpoint(path)
        model = build_model(ckpt["model_config"], dtype=jnp.bfloat16)
        transform = build_transform(ckpt["transform"])
        if args.volume_offset == "auto":
            from exaspim_tpu.transforms import estimate_offset, with_offset

            # Calibration transfer: the same estimator on this volume
            # and on the training family's observation model; their
            # difference is the per-volume pedestal shift.
            ref_clean, _ = neurite_phantom(
                (64, 64, 64), n_tubes=2, seed=args.seed_clean
            )
            est_train = estimate_offset(
                noisy_observation(ref_clean, seed=args.seed_noise)
            )
            delta = estimate_offset(img) - est_train
            transform = with_offset(transform, delta)
        out = predict(
            img, model, ckpt["params"], transform, patch_size="auto"
        )
        cr = compute_cratio(out, codec)
        print(json.dumps({
            "ckpt": path,
            "cratio_denoised": cr,
            "cratio_gain": round(cr / cr_noisy, 3),
            "psnr_denoised_db": round(
                float(psnr(out.astype(np.float32), clean, drange)), 2
            ),
            "ssim_denoised": round(float(ssim3d(
                out.astype(np.float32), clean, data_range=drange
            )), 4),
        }))


if __name__ == "__main__":
    main()
