"""Average the params of several scored checkpoints into one (SWA-style).

Checkpoint averaging over the tail of a cosine-annealed run is a
zero-training-cost quality lever; whether it pays here is decided by
``ckpt_quality`` A/B (measure-first — see RESULTS.md for the recorded
outcome).

    python scripts/ckpt_average.py out.ckpt in1.ckpt in2.ckpt [...]
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
    p.add_argument("out")
    p.add_argument("ckpts", nargs="+")
    args = p.parse_args(argv)

    import jax

    from exaspim_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    loaded = [load_checkpoint(c) for c in args.ckpts]
    cfg0, t0 = loaded[0]["model_config"], loaded[0]["transform"]
    for c, d in zip(args.ckpts[1:], loaded[1:]):
        if d["model_config"] != cfg0 or d["transform"] != t0:
            raise ValueError(f"checkpoint {c} disagrees on config")
    n = len(loaded)
    avg = jax.tree_util.tree_map(
        lambda *leaves: (
            (sum(np.asarray(v, np.float64) for v in leaves) / n)
            .astype(np.asarray(leaves[0]).dtype)
            if np.issubdtype(np.asarray(leaves[0]).dtype, np.floating)
            else leaves[0]
        ),
        *[d["params"] for d in loaded],
    )
    save_checkpoint(
        args.out, avg, cfg0, t0,
        step=max(int(d.get("step") or 0) for d in loaded),
        score=float(np.mean([float(d.get("score") or 0.0)
                             for d in loaded])),
        extra={"averaged_from": [os.path.basename(c)
                                 for c in args.ckpts]},
    )
    print(f"averaged {n} checkpoints -> {args.out}")


if __name__ == "__main__":
    main()
