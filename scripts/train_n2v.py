"""Self-supervised Noise2Void training — no teachers, noisy data only.

Completes the reference's N2V2 capability (it ships the architecture,
reference unet3d.py:392-571, but trains only against BM4D teachers):
train a blind-spot denoiser from noisy patches alone and report
PSNR/SSIM vs clean + compression gain on a held-out block.

    python scripts/train_n2v.py --out /tmp/n2v [--steps 6000]
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
    p.add_argument("--out", required=True)
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--n-patches", type=int, default=512)
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--width", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--mask-rate", type=float, default=0.005)
    p.add_argument("--sigma-gain", type=float, default=None,
                   help="enable the sigma-aware count-space loss with "
                        "this Poisson gain (try 1.0); see train/n2v.py")
    p.add_argument("--sigma-read", type=float, default=0.0,
                   help="read-noise std (counts) for the sigma model")
    p.add_argument("--model", default="N2V2UNet",
                   choices=["N2V2UNet", "UNet"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    from exaspim_tpu.compression import best_codec, compute_cratio
    from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
    from exaspim_tpu.inference import predict
    from exaspim_tpu.models import MODEL_REGISTRY
    from exaspim_tpu.ops.ssim import psnr, ssim3d
    from exaspim_tpu.train import create_train_state, save_checkpoint
    from exaspim_tpu.train.n2v import make_n2v_train_step
    from exaspim_tpu.transforms import build_transform

    os.makedirs(args.out, exist_ok=True)
    P = args.patch
    rng = np.random.default_rng(args.seed)

    # Noisy-only training pool (the N2V premise: no clean/teacher data).
    print(f"[n2v] generating {args.n_patches} noisy patches", flush=True)
    patches = np.empty((args.n_patches, P, P, P), np.uint16)
    for i in range(args.n_patches):
        clean, _ = neurite_phantom(
            (P, P, P), n_tubes=6, seed=args.seed * 100000 + i
        )
        patches[i] = noisy_observation(clean, seed=args.seed * 7 + i)

    t = build_transform(
        {"kind": "asinh", "params": {"offset": 100.0, "scale": 60.0}}
    )
    # Blind-spot training needs a non-identity start: zero head blocks
    # all masked-voxel gradients (models/unet3d.py head_init docs).
    # residual=False: blind-spot training must predict the VALUE — the
    # residual form learns `target − substituted_center`, which misfires
    # on unmasked inputs at inference (PSNR collapsed 54→25 dB when
    # this script used the residual head; see UNet.residual docs).
    model = MODEL_REGISTRY[args.model](
        width_multiplier=args.width, dtype=jnp.bfloat16,
        head_init="normal", residual=False,
        blocked="auto",  # rolling-z Pallas convs win fwd AND train

    )
    state = create_train_state(
        model, patch_shape=(P, P, P), lr=args.lr,
        total_steps=args.steps, seed=args.seed,
    )
    step_fn = make_n2v_train_step(
        transform=t, mask_rate=args.mask_rate, donate=True,
        sigma_gain=args.sigma_gain, sigma_read=args.sigma_read,
    )
    base_key = jax.random.key(args.seed)

    t0 = time.time()
    log = []
    for s in range(args.steps):
        idx = rng.integers(0, args.n_patches, args.batch_size)
        x = patches[idx][..., None]
        state, loss = step_fn(
            state, jnp.asarray(x), jax.random.fold_in(base_key, s)
        )
        if s % 200 == 0 or s == args.steps - 1:
            loss = float(loss)
            log.append({"step": s, "loss": loss,
                        "wall_s": round(time.time() - t0, 1)})
            print(f"[n2v] step {s} loss {loss:.5f}", flush=True)

    ckpt = os.path.join(args.out, "n2v.msgpack")
    save_checkpoint(ckpt, state.params, model.config, t.cfg,
                    step=args.steps, score=float(loss))

    # Held-out evaluation (clean known only to the evaluator).
    clean, _ = neurite_phantom((128, 128, 128), n_tubes=16, seed=991)
    noisy = noisy_observation(clean, seed=992)
    # output_clip: self-supervised predictions can overshoot in the
    # transform domain; an asinh inverse amplifies overshoot at bright
    # voxels into 65535 clamps (measured: PSNR 1.2 dB without the clamp).
    den = predict(noisy, model, state.params, t, patch_size=P,
                  overlap=12, trim=5, batch_size=8, output_clip="input")
    codec = best_codec(clevel=6)
    drange = float(clean.max())
    summary = {
        "model": args.model,
        "sigma_gain": args.sigma_gain,
        "steps": args.steps,
        "width": args.width,
        "checkpoint": ckpt,
        "cratio_noisy": compute_cratio(noisy, codec),
        "cratio_denoised": compute_cratio(den, codec),
        "psnr_noisy_db": round(float(psnr(
            noisy.astype(np.float32), clean, drange)), 2),
        "psnr_denoised_db": round(float(psnr(
            den.astype(np.float32), clean, drange)), 2),
        "ssim_noisy": round(float(ssim3d(
            noisy.astype(np.float32), clean, data_range=drange)), 4),
        "ssim_denoised": round(float(ssim3d(
            den.astype(np.float32), clean, data_range=drange)), 4),
        "train_log": log,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "train_log"}, indent=2))


if __name__ == "__main__":
    main()
