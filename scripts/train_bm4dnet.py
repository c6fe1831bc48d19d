"""Train BM4DNet from precomputed caches (the production training entry).

Capability parity with the reference's cache-only training script
(reference scripts/train_bm4dnet.py): the transform is loaded from the
cache contract (all cache dirs must agree), training never touches live
datasets, and the run config — cache paths, transform, hyperparameters —
is recorded next to the checkpoints.

Defaults are the reference's compression operating point: fg_weight 0,
preserve_foreground off, checkpoint weights with cratio 10
(reference train_bm4dnet.py:156-211).

Usage:
    python scripts/train_bm4dnet.py --train-cache /c/train \\
        --val-cache /c/val --out /runs/bm4dnet [--epochs 50] …
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax.numpy as jnp  # noqa: E402

from exaspim_tpu.data.cache import (  # noqa: E402
    CachedPatchDataset,
    CachedValidateDataset,
    load_cache_transform,
)
from exaspim_tpu.models import UNet, build_model  # noqa: E402
from exaspim_tpu.train import Trainer  # noqa: E402
from exaspim_tpu.transforms import build_transform  # noqa: E402

#: reference operating point (reference train_bm4dnet.py:206-208)
CHECKPOINT_WEIGHTS = {
    "fg_mae": 1.0, "bg_mae": 0.2, "top_pct_error": 0.5, "cratio": 10.0,
}


def train(train_cache, val_cache, output_dir, *, epochs=50, batch_size=32,
          lr=1e-3, fg_weight=0.0, loss_eps=1e-3,
          preserve_foreground=False,
          val_every=1000, seed=42, width_multiplier=1.0, model_cfg=None,
          resume=None, bf16=True, checkpoint_weights=None,
          max_val_examples=None, data_parallel=False,
          device_cache="auto", device_cache_budget=8 << 30,
          augment=False, full_state_every=1):
    """Run cache-only training; returns the Trainer."""
    transform_cfg = load_cache_transform(
        list(train_cache) + list(val_cache)
    )
    transform = build_transform(transform_cfg)
    train_ds = CachedPatchDataset(train_cache)
    val_ds = CachedValidateDataset(val_cache)

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if resume:
        # Warm-starting from a checkpoint (e.g. a self-supervised N2V
        # run being fine-tuned on BM4D teachers): load it ONCE, take
        # the architecture from it when none is given so the weights
        # always fit, and hand the loaded dict to the trainer.
        from exaspim_tpu.train.checkpoint import load_checkpoint

        resume = load_checkpoint(resume)
        if model_cfg is None:
            model_cfg = resume["model_config"]
    # blocked="auto": the rolling-z Pallas kernels (ops/nb_conv.py) win
    # for BOTH forward and training on TPU — measured 326 vs 347 ms per
    # batch-32 64^3 train step against XLA's fused conv gradients
    # (scripts/step_bench.py).
    model = build_model(
        model_cfg, dtype=dtype
    ) if model_cfg else UNet(
        width_multiplier=width_multiplier, dtype=dtype
    )
    mesh = None
    if data_parallel:
        from exaspim_tpu.parallel import initialize_multihost, make_mesh

        # No-op single-process; on a pod it joins the job first so
        # make_mesh sees the global device list.
        initialize_multihost()
        mesh = make_mesh(axis="data")
    trainer = Trainer(
        output_dir, model, transform, lr=lr, epochs=epochs,
        batch_size=batch_size, fg_weight=fg_weight, loss_eps=loss_eps,
        preserve_foreground=preserve_foreground, val_every=val_every,
        checkpoint_weights=checkpoint_weights or CHECKPOINT_WEIGHTS,
        seed=seed, max_val_examples=max_val_examples, mesh=mesh,
        device_cache=device_cache,
        device_cache_budget=device_cache_budget,
        augment=augment, full_state_every=full_state_every,
    )
    trainer.save_config({
        "train_cache": list(train_cache),
        "val_cache": list(val_cache),
        "bf16": bf16,
    })
    if resume:
        trainer.load_pretrained_weights(resume)
    trainer.run(train_ds, val_ds)
    return trainer


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-json",
                   help="TrainConfig JSON; when given it drives the "
                        "whole run and other flags are ignored")
    p.add_argument("--train-cache", nargs="+")
    p.add_argument("--val-cache", nargs="+")
    p.add_argument("--out")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--fg-weight", type=float, default=0.0)
    p.add_argument("--loss-eps", type=float, default=1e-3,
                   help="Charbonnier knee in the transform domain; "
                        "smaller is more L1-like and flattens residual "
                        "background toward the teacher (see Trainer)")
    p.add_argument("--preserve-foreground", action="store_true")
    p.add_argument("--val-every", type=int, default=1000)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--width-multiplier", type=float, default=1.0)
    p.add_argument("--resume", help="checkpoint to warm-start from")
    p.add_argument("--no-bf16", action="store_true")
    p.add_argument("--max-val-examples", type=int)
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch across all local devices")
    p.add_argument("--device-cache", choices=("auto", "on", "off"),
                   default="auto",
                   help="train from an HBM-resident cache (gather "
                        "batches on device; the host ships only batch "
                        "indices — see Trainer.device_cache)")
    p.add_argument("--device-cache-budget-gb", type=float, default=8.0,
                   help="HBM budget for the device-resident cache "
                        "(raise toward the chip's free HBM for bigger "
                        "caches; v5e has 16 GB)")
    p.add_argument("--augment", action="store_true",
                   help="on-device data augmentation: one of the 48 "
                        "cube orientations per train step "
                        "(device-cache mode, cubic patches)")
    p.add_argument("--full-state-every", type=int, default=1,
                   help="write the full-state resume checkpoint every "
                        "Nth validation (the ~155 MB device-to-host "
                        "fetch dominates validation on slow links)")
    args = p.parse_args(argv)
    if args.config_json:
        from exaspim_tpu.config import TrainConfig

        c = TrainConfig.from_json(args.config_json)
        return train(
            c.train_cache, c.val_cache, c.output_dir, epochs=c.epochs,
            batch_size=c.batch_size, lr=c.lr, fg_weight=c.fg_weight,
            preserve_foreground=c.preserve_foreground,
            val_every=c.val_every, seed=c.seed,
            width_multiplier=c.width_multiplier, resume=c.resume,
            bf16=c.bf16, checkpoint_weights=c.checkpoint_weights,
            data_parallel=c.data_parallel,
        )
    if not (args.train_cache and args.val_cache and args.out):
        p.error("--train-cache/--val-cache/--out (or --config-json) "
                "are required")
    train(
        args.train_cache, args.val_cache, args.out, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr, fg_weight=args.fg_weight,
        loss_eps=args.loss_eps,
        preserve_foreground=args.preserve_foreground,
        val_every=args.val_every, seed=args.seed,
        width_multiplier=args.width_multiplier, resume=args.resume,
        bf16=not args.no_bf16, max_val_examples=args.max_val_examples,
        data_parallel=args.data_parallel,
        device_cache={"auto": "auto", "on": True, "off": False}[
            args.device_cache
        ],
        device_cache_budget=int(args.device_cache_budget_gb * (1 << 30)),
        augment=args.augment, full_state_every=args.full_state_every,
    )


if __name__ == "__main__":
    main()
