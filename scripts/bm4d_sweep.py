"""BM4D operating-point sweep: quality vs speed across parameters.

Validates the XLA BM4D against the reference's noise levels
(σ ∈ {10, 16, 24}, reference scripts/precompute.py:284,
data_handling.py:119, evaluate.py:202) over block/K/search/step
configurations, reporting RMSE/PSNR vs the clean phantom and solo
TPU runtime per 64³/128³ patch. Writes a JSON + markdown table used to
justify the teacher defaults in RESULTS.md.

    python scripts/bm4d_sweep.py --out /tmp/bm4d_sweep.json
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

CONFIGS = [
    # name, block, group(K), search, step
    ("b4_k8_s7_st3 (r1 default)", 4, 8, 7, 3),
    ("b4_k16_s7_st3", 4, 16, 7, 3),
    ("b4_k16_s9_st3", 4, 16, 9, 3),
    ("b4_k16_s11_st3", 4, 16, 11, 3),
    ("b4_k16_s9_st2", 4, 16, 9, 2),
    # TPU fast profile: step == block tiles the reference grid exactly
    # (single-tile matcher matmuls, 2.4× fewer latency-bound
    # gather/scatter rows) — ~2× throughput for ~−7 % RMSE gain.
    ("b4_k16_s9_st4 (fast)", 4, 16, 9, 4),
]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/bm4d_sweep.json")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--sigmas", type=float, nargs="+",
                   default=[10.0, 16.0, 24.0])
    p.add_argument("--time-size", type=int, default=128,
                   help="patch edge for the timing measurement")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

    from exaspim_tpu.data.synthetic import neurite_phantom
    from exaspim_tpu.ops.bm4d import bm4d

    S = args.size
    clean, _ = neurite_phantom((S, S, S), n_tubes=8, seed=3)
    clean = clean.astype(np.float32)
    rng = np.random.default_rng(0)

    rows = []
    for name, block, group, search, step in CONFIGS:
        row = {"config": name, "block": block, "K": group,
               "search": search, "step": step}
        for sigma in args.sigmas:
            noisy = clean + rng.normal(0, sigma, clean.shape).astype(
                np.float32
            )
            den = np.asarray(bm4d(
                noisy, sigma, block=block, group=group, step=step,
                search=search,
            ))
            rmse_in = float(np.sqrt(np.mean((noisy - clean) ** 2)))
            rmse = float(np.sqrt(np.mean((den - clean) ** 2)))
            row[f"rmse_s{int(sigma)}"] = round(rmse, 2)
            row[f"gain_s{int(sigma)}"] = round(rmse_in / rmse, 2)
        # Solo timing on a bigger patch (compile excluded).
        T = args.time_size
        big_clean, _ = neurite_phantom((T, T, T), n_tubes=12, seed=4)
        big = (
            big_clean + rng.normal(0, 24.0, (T, T, T))
        ).astype(np.float32)
        fn = lambda v: bm4d(  # noqa: E731
            v, 24.0, block=block, group=group, step=step, search=search
        )
        np.asarray(fn(big))  # warm-up/compile
        t0 = time.perf_counter()
        np.asarray(fn(big))
        row[f"sec_{T}c"] = round(time.perf_counter() - t0, 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
