"""Real-TPU microbenchmark: XLA conv vs blocked Pallas convs.

Times the UNet's hot conv shapes three ways on the real chip:

* ``lax.conv_general_dilated`` (XLA's emitter — channel-bound at C≤64),
* round-1 ``blocked_conv3d`` (augmented layout, pack/unpack inside),
* ``nb_conv3d`` (natural-phase blocked: no per-conv relayout), plus the
  one-off ``to_blocked``/``from_blocked`` cost so stage-level wins can
  be computed.

All timings chain ``REPS`` applications inside ONE jit (lax.fori_loop)
and fetch a scalar checksum — the axon tunnel's ~35-40 ms per-call sync
floor would otherwise dominate (see RESULTS.md environment notes).
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

from exaspim_tpu.ops.nb_conv import (  # noqa: E402
    from_blocked, nb_conv3d, to_blocked,
)
from exaspim_tpu.ops.pallas_conv import blocked_conv3d  # noqa: E402

REPS = 16


def timed(fn, *args, n=3):
    y = jax.block_until_ready(fn(*args))
    _ = float(np.asarray(y))  # force a real fetch once
    best = float("inf")
    for _i in range(n):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def chain(step):
    @jax.jit
    def run(x):
        def body(_, y):
            return step(y)
        y = jax.lax.fori_loop(0, REPS, body, x)
        return jnp.sum(y.astype(jnp.float32))
    return run


def bench_shape(b, d, h, w, cin, cout, dt=jnp.bfloat16):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.3, (b, d, h, w, cin)), dt)
    # scaled so chained convs neither vanish nor blow up in bf16
    k = jnp.asarray(rng.normal(0, 1.0, (3, 3, 3, cin, cout)), dt)
    k = (k / jnp.sqrt(
        jnp.sum(k.astype(jnp.float32) ** 2, (0, 1, 2, 3)))).astype(dt)
    assert cin == cout, "chained bench needs cin == cout"

    def xla_step(y):
        return jax.lax.conv_general_dilated(
            y, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def old_step(y):
        return blocked_conv3d(y, k)

    xb = to_blocked(x)

    def nb_step(yb):
        return nb_conv3d((yb,), k, h, w, (cin,))

    @jax.jit
    def pack_chain(y):
        def body(_, z):
            return to_blocked(from_blocked(z, h, w) + 0.0) * 0.999
        z = jax.lax.fori_loop(0, REPS, body, to_blocked(y))
        return jnp.sum(z.astype(jnp.float32))

    @jax.jit
    def noop_chain(y):
        def body(_, z):
            return z * 0.999
        z = jax.lax.fori_loop(0, REPS, body, to_blocked(y))
        return jnp.sum(z.astype(jnp.float32))

    label = f"B{b} {d}x{h}x{w} C{cin}->{cout}"
    t_xla = timed(chain(xla_step), x) / REPS
    t_old = timed(chain(old_step), x) / REPS
    t_nb = timed(chain(nb_step), xb) / REPS
    t_pk = (timed(pack_chain, x) - timed(noop_chain, x)) / REPS
    gflop = 2 * 27 * cin * cout * b * d * h * w / 1e9
    print(f"{label:28s} XLA {t_xla*1e3:7.2f} ms ({gflop/t_xla/1e3:5.1f} TF/s)"
          f" | old-blocked {t_old*1e3:7.2f}"
          f" | nb {t_nb*1e3:7.2f} ({gflop/t_nb/1e3:5.1f} TF/s)"
          f" | unpack+pack {t_pk*1e3:6.2f}")
    return dict(xla=t_xla, old=t_old, nb=t_nb, pack=t_pk)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    print("devices:", jax.devices())
    b = args.batch
    bench_shape(b, 64, 64, 64, 32, 32)    # encoder stage 1 / decoder top
    bench_shape(b, 32, 32, 32, 64, 64)    # encoder stage 2
    bench_shape(b, 16, 16, 16, 128, 128)  # stage 3 (XLA expected OK)


if __name__ == "__main__":
    main()
