"""A/B the BM4D overlap-add aggregation: chunked row scatter (current)
vs sort + segment-sum (the one untried structural alternative).

The step-3 two-stage budget at 128³ spends ~36 ms in the chunked row
scatter and ~36 ms in the row gather, both HBM random-access
latency-bound at ~14 ns/row (RESULTS.md round 4a/4b). A sorted
formulation replaces the random scatter with

    argsort(keys) → gather rows by permutation → segment_sum
    (indices_are_sorted=True) → reshape

trading one random scatter for (sort of R·K int32 keys) + (one random
row gather) + (a sorted segment reduction). This script measures both
on the REAL index/value distribution: it runs the production matcher at
128³ to get (sz, sy, sx) selections, builds the same (R·K, B³+1)
augmented value rows, and times each aggregation to the same
(rz, ry, rx, B³+1) accumulator (plus a numerical equality check).

    python scripts/agg_ab.py [--n 128] [--step 3]

Measure-first discipline: integration into ops/bm4d.py happens only if
B wins here (see RESULTS.md for the recorded outcome).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--step", type=int, default=3)
    p.add_argument("--reps", type=int, default=8)
    args = p.parse_args(argv)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
    except Exception:
        pass
    import jax.numpy as jnp

    import importlib

    # ops.__init__ re-exports the bm4d *function* under the same name,
    # shadowing the submodule attribute — resolve the module directly.
    bm = importlib.import_module("exaspim_tpu.ops.bm4d")

    N, B, K, step, search = args.n, 4, 16, args.step, 9
    rng = np.random.default_rng(0)
    vol = jnp.asarray(
        rng.normal(400.0, 24.0, (N, N, N)).astype(np.float32)
    )

    # Real selections from the production matcher (stage-1 path,
    # mirrors ops/bm4d.py bm4d_stage's grid regularization).
    half = search // 2
    pad = (-(N - B)) % step
    Z = Y = X = N + pad
    volp = jnp.pad(vol, ((0, pad),) * 3, mode="reflect")
    zs = ys = xs = np.arange(0, Z - B + 1, step, dtype=np.int32)
    if jax.default_backend() == "tpu":
        from exaspim_tpu.ops.pallas_bm4d import match_topk

        uz, uy, ux = match_topk(
            volp, block=B, group=K, step=step, search=search
        )
        sz = jnp.clip(uz, 0, Z - B).reshape(-1, K)
        sy = jnp.clip(uy, 0, Y - B).reshape(-1, K)
        sx = jnp.clip(ux, 0, X - B).reshape(-1, K)
    else:  # CPU smoke path: synthetic near-reference selections
        refs = np.stack([g.ravel() for g in np.meshgrid(
            zs, ys, xs, indexing="ij")], axis=-1)
        offs = rng.integers(-half, half + 1, (len(refs), K, 3))
        sel = np.clip(refs[:, None, :] + offs, 0, Z - B)
        sz, sy, sx = (jnp.asarray(sel[..., i].astype(np.int32))
                      for i in range(3))
    R = sz.shape[0]
    nb3 = B * B * B
    nrow = nb3 + 1
    rz = ry = rx = Z - B + 1
    print(f"# R={R} K={K} rows={R * K} grid={rz}^3", flush=True)

    filt_rows = jnp.asarray(
        rng.normal(size=(R, K, nrow)).astype(np.float32)
    )

    # --- A: the production chunked row scatter + (value-only) check.
    SC = getattr(bm, "_SCATTER_CHUNK_BYTES")

    @jax.jit
    def agg_scatter(sz, sy, sx, filt_rows):
        nchunks = max(
            1, int(np.ceil(rz * ry * rx * nrow * 4 / SC))
        )
        zchunk = int(np.ceil(rz / nchunks))
        gyx = len(ys) * len(xs)
        parts = []
        for ci in range(nchunks):
            z0 = ci * zchunk
            zc = min(zchunk, rz - z0)
            if zc <= 0:
                break
            g0 = max(0, (z0 - half) // step)
            g1 = min(len(zs), (z0 + zc + half) // step + 1)
            rs = slice(g0 * gyx, g1 * gyx)
            in_chunk = (sz[rs] >= z0) & (sz[rs] < z0 + zc)
            zi = jnp.where(in_chunk, sz[rs] - z0, zc)
            acc_c = jnp.zeros((zc, ry, rx, nrow), jnp.float32)
            parts.append(acc_c.at[zi, sy[rs], sx[rs]].add(
                filt_rows[rs], mode="drop", unique_indices=False
            ))
        return parts[0] if len(parts) == 1 else jnp.concatenate(
            parts, axis=0
        )

    # --- B: argsort keys → permuted gather → sorted segment-sum.
    @jax.jit
    def agg_sorted(sz, sy, sx, filt_rows):
        keys = (sz * ry + sy) * rx + sx  # (R, K) linearized rows
        keys = keys.reshape(-1)
        perm = jnp.argsort(keys)
        keys_sorted = keys[perm]
        rows_sorted = filt_rows.reshape(-1, nrow)[perm]
        acc = jax.ops.segment_sum(
            rows_sorted, keys_sorted, num_segments=rz * ry * rx,
            indices_are_sorted=True,
        )
        return acc.reshape(rz, ry, rx, nrow)

    def timed(fn, label):
        out = fn(sz, sy, sx, filt_rows)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        outs = [fn(sz, sy, sx, filt_rows) for _ in range(args.reps)]
        np.asarray(jnp.stack([o[0, 0, 0, 0] for o in outs]))
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{label}: {dt * 1e3:.1f} ms", flush=True)
        return out, dt

    a, ta = timed(agg_scatter, "A chunked-scatter")
    b, tb = timed(agg_sorted, "B sort+segment_sum")
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"max|A-B| = {err:.2e}")
    print(f"winner: {'B' if tb < ta else 'A'} "
          f"({min(ta, tb) / max(ta, tb):.2f}x of loser)")


if __name__ == "__main__":
    main()
