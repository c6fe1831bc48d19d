"""Convert a reference torch checkpoint (.pt/.pth) to native msgpack.

Covers the migration path for users with checkpoints trained by the
reference package: both the current ckpt-dict format and legacy bare
state_dicts load (reference inference.py:255-299), and the port is
mathematically exact (conv biases kept via the model's ``conv_bias``
option, ``align_corners=True`` upsampling).

    python scripts/import_torch_checkpoint.py ref_model.pth out.msgpack \
        [--verify]

``--verify`` runs the original torch model and the ported Flax model on
the same random input and reports the max abs deviation (needs torch).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help="reference torch checkpoint (.pt/.pth)")
    p.add_argument("dst", help="output path for the msgpack checkpoint")
    p.add_argument(
        "--verify", action="store_true",
        help="forward both models on a random patch, report max |Δ|",
    )
    args = p.parse_args(argv)

    from exaspim_tpu.train.checkpoint import import_torch_checkpoint

    model, params, transform = import_torch_checkpoint(
        args.src, args.dst
    )
    print(f"wrote {args.dst}")
    print(f"  model:     {model.config}")
    print(f"  transform: {transform.cfg}")

    if args.verify:
        # Requires the reference package importable (the environment a
        # migrating user converts FROM).
        import jax.numpy as jnp
        import torch

        ckpt = torch.load(
            args.src, map_location="cpu", weights_only=False
        )
        state_dict = (
            ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt
            else ckpt
        )
        from aind_exaspim_image_compression.machine_learning.unet3d import (
            N2V2UNet as TorchN2V2UNet,
            UNet as TorchUNet,
        )

        cls = (
            TorchN2V2UNet
            if model.config["model"] == "N2V2UNet" else TorchUNet
        )
        tm = cls(
            width_multiplier=model.config["width_multiplier"],
            trilinear=model.config["trilinear"],
            residual=model.config["residual"],
        )
        tm.load_state_dict(state_dict)
        tm.eval()
        rng = np.random.default_rng(0)
        x = rng.normal(0.5, 0.2, (1, 32, 32, 32, 1)).astype(np.float32)
        with torch.no_grad():
            yt = tm(
                torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
            ).numpy().transpose(0, 2, 3, 4, 1)
        yf = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
        print(f"  verify max|Δ| = {np.abs(yf - yt).max():.2e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
