"""End-to-end model timings on the real chip: fwd + train step,
blocked Pallas conv dispatch vs plain XLA convs.

Timings chain REPS iterations inside one jit with data dependence
between iterations (no hoisting) and force a host scalar fetch.
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from exaspim_tpu.models import UNet  # noqa: E402
from exaspim_tpu.train import create_train_state  # noqa: E402
from exaspim_tpu.train.state import make_train_step  # noqa: E402

REPS = 8


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--modes", nargs="*", default=["never", "auto"])
    ap.add_argument("--fuse-gn", nargs="*", type=int, default=[1],
                    help="fuse_gn_stats settings to measure per mode "
                         "(e.g. --fuse-gn 0 1 for an A/B)")
    args = ap.parse_args()
    print("devices:", jax.devices())
    b, p = args.batch, args.patch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.5, 0.1, (b, p, p, p, 1)), jnp.float32)
    vox = b * p ** 3

    for mode in args.modes:
      for fuse in args.fuse_gn:
        model = UNet(width_multiplier=1.0, dtype=jnp.bfloat16, blocked=mode,
                     fuse_gn_stats=bool(fuse))
        params = jax.jit(model.init)(jax.random.key(0), x)["params"]

        @jax.jit
        def fwd_chain(params, x, model=model):
            def body(_, y):
                return model.apply({"params": params}, y)
            return jnp.sum(
                jax.lax.fori_loop(0, REPS, body, x)[0, 0, 0, 0]
            )

        t_fwd = timed(fwd_chain, params, x) / REPS

        state = create_train_state(
            model, patch_shape=(p,) * 3, lr=1e-4, total_steps=100, seed=0,
            params=params,
        )
        step = make_train_step(fg_weight=20.0, donate=False)
        y = x * 0.9
        fg = jnp.zeros(x.shape, bool)

        @jax.jit
        def train_chain(state, x, y, fg):
            def body(_, st):
                st2, _loss = step(st, x, y, fg)
                return st2
            st = jax.lax.fori_loop(0, REPS, body, state)
            # checksum over a real param leaf so nothing is DCE'd
            leaf = jax.tree_util.tree_leaves(st.params)[0]
            return jnp.sum(leaf.astype(jnp.float32)) + st.step

        t_tr = timed(train_chain, state, x, y, fg) / REPS
        print(f"blocked={mode:5s} fuse_gn={fuse}  fwd {t_fwd*1e3:7.1f} ms "
              f"({vox/t_fwd/1e6:6.2f} Mvox/s)   train {t_tr*1e3:7.1f} ms "
              f"({vox/t_tr/1e6:6.2f} Mvox/s)")


if __name__ == "__main__":
    main()
