"""End-to-end production slice on synthetic data (no cloud needed).

Runs the complete pipeline the way a user would: precompute a cache with
real BM4D teachers → train BM4DNet → tiled-denoise a held-out block →
report compression-ratio gain and fidelity. Writes a JSON summary.

    python scripts/demo_end_to_end.py --out /tmp/demo \\
        [--n-train 256] [--steps cap via --epochs] [--width 1.0]
"""

import argparse
import glob
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
    p.add_argument("--out", required=True)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-val", type=int, default=16)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--width", type=float, default=1.0)
    p.add_argument("--fg-weight", type=float, default=0.0)
    p.add_argument("--loss-eps", type=float, default=1e-3)
    p.add_argument("--sigma-bm4d", type=float, default=24.0)
    p.add_argument("--bm4d-step", type=int, default=3,
                   help="BM4D reference-grid step for teacher generation "
                        "(3 = parity default; 4 = documented fast profile)")
    p.add_argument("--augment", action="store_true",
                   help="on-device 48-orientation augmentation during "
                        "training (device-cache mode)")
    p.add_argument("--device-cache-budget-gb", type=float, default=8.0)
    p.add_argument("--full-state-every", type=int, default=4,
                   help="write the full-state resume checkpoint every "
                        "Nth validation (slow device-to-host links)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/jax"
        )
    except Exception:
        pass

    import precompute as precompute_script
    import train_bm4dnet as train_script

    from exaspim_tpu.compression import best_codec, compute_cratio
    from exaspim_tpu.data.synthetic import (
        neurite_phantom,
        noisy_observation,
    )
    from exaspim_tpu.inference import predict
    from exaspim_tpu.ops.metrics import evaluate_example, \
        make_foreground_mask
    from exaspim_tpu.ops.ssim import psnr, ssim3d
    from exaspim_tpu.train import find_best_checkpoint, restore_pipeline

    os.makedirs(args.out, exist_ok=True)
    tcfg = {"kind": "asinh", "params": {"offset": 100.0, "scale": 60.0}}
    patch = (args.patch,) * 3

    # 1. Precompute caches with real BM4D teachers.
    t0 = time.time()
    train_cache = os.path.join(args.out, "cache_train")
    val_cache = os.path.join(args.out, "cache_val")
    if not os.path.exists(os.path.join(train_cache, "raw.npy")):
        precompute_script.precompute(
            train_cache, split="train", source="synthetic",
            n=args.n_train, patch=patch, sigma_bm4d=args.sigma_bm4d,
            seed=args.seed, transform_cfg=tcfg,
            bm4d_step=args.bm4d_step,
        )
        precompute_script.precompute(
            val_cache, split="val", source="synthetic", n=args.n_val,
            patch=patch, sigma_bm4d=args.sigma_bm4d, seed=args.seed,
            transform_cfg=tcfg, bm4d_step=args.bm4d_step,
        )
    t_cache = time.time() - t0

    # 2. Train.
    t0 = time.time()
    trainer = train_script.train(
        [train_cache], [val_cache], os.path.join(args.out, "run"),
        epochs=args.epochs, batch_size=args.batch_size, lr=1e-3,
        fg_weight=args.fg_weight, loss_eps=args.loss_eps,
        val_every=200, seed=args.seed,
        width_multiplier=args.width, max_val_examples=8,
        augment=args.augment,
        device_cache_budget=int(args.device_cache_budget_gb * (1 << 30)),
        full_state_every=args.full_state_every,
    )
    t_train = time.time() - t0

    # 3. Held-out block: tiled denoise + metrics.
    best = find_best_checkpoint(trainer.ckpt_dir)
    model, params, transform = restore_pipeline(best)
    clean, _ = neurite_phantom((128, 128, 128), n_tubes=16, seed=999)
    noisy = noisy_observation(clean, seed=1000)
    t0 = time.time()
    denoised = predict(noisy, model, params, transform)
    t_pred = time.time() - t0

    codec = best_codec(clevel=6)
    clean_u16 = np.clip(np.round(clean), 0, 65535).astype(np.uint16)
    fg = make_foreground_mask(clean_u16)
    metrics = evaluate_example(denoised, noisy, clean_u16, fg)
    summary = {
        "checkpoint": best,
        "cratio_raw": compute_cratio(noisy, codec),
        "cratio_denoised": compute_cratio(denoised, codec),
        "psnr_vs_clean_raw": round(float(psnr(
            noisy.astype(np.float32), clean, data_range=float(clean.max())
        )), 2),
        "psnr_vs_clean_denoised": round(float(psnr(
            denoised.astype(np.float32), clean,
            data_range=float(clean.max()),
        )), 2),
        "ssim_vs_clean_raw": round(float(ssim3d(
            noisy.astype(np.float32), clean, data_range=float(clean.max())
        )), 4),
        "ssim_vs_clean_denoised": round(float(ssim3d(
            denoised.astype(np.float32), clean,
            data_range=float(clean.max()),
        )), 4),
        **{k: round(float(v), 3) for k, v in metrics.items()},
        "cache_build_s": round(t_cache, 1),
        "train_s": round(t_train, 1),
        "predict_128c_s": round(t_pred, 2),
        "n_train": args.n_train,
        "epochs": args.epochs,
        "width": args.width,
        "loss_eps": args.loss_eps,
        "sigma_bm4d": args.sigma_bm4d,
        "bm4d_step": args.bm4d_step,
        "augment": args.augment,
    }
    summary["cratio_gain"] = round(
        summary["cratio_denoised"] / summary["cratio_raw"], 3
    )
    out_path = os.path.join(args.out, "summary.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
