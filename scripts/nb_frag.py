"""Fragment-level timings: where does the blocked span win/lose? (dev)"""

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

from exaspim_tpu.models.unet3d import (  # noqa: E402
    DoubleConv, GroupNorm, Up,
)
from exaspim_tpu.ops import nb_conv as N  # noqa: E402

REPS = 8
B = 32


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def chain(step, x0):
    @jax.jit
    def run(x):
        def body(_, y):
            return step(y)
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, x)[0, 0, 0]
                       .astype(jnp.float32))
    return run, x0


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())

    if which in ("all", "pack"):
        # honest pack: transpose cannot cancel (bf16, add const between)
        x = jnp.asarray(rng.normal(0, 1, (B, 64, 64, 64, 32)), jnp.bfloat16)

        def pk(y):
            return N.from_blocked(N.to_blocked(y) * 0.999 + 0.001, 64, 64)
        fn, x0 = chain(pk, x)
        print(f"pack+unpack roundtrip {timed(fn, x0)*1e3:7.2f} ms")

        def pd(y):
            return N._pad_blocked(y, 32)[:, 1:-1, 40:-40, :] * 0.999
        xb = N.to_blocked(x)
        fn2, _ = chain(pd, xb)
        print(f"pad+crop roundtrip    {timed(fn2, xb)*1e3:7.2f} ms")

    if which in ("all", "gn"):
        x = jnp.asarray(rng.normal(0, 1, (B, 64, 64, 64, 32)), jnp.bfloat16)
        gn = GroupNorm(num_groups=8, dtype=jnp.bfloat16)
        p = gn.init(jax.random.key(0), x)

        def g_arr(y):
            return gn.apply(p, y)
        fn, _ = chain(g_arr, x)
        print(f"GroupNorm unblocked   {timed(fn, x)*1e3:7.2f} ms")

        xb = N.Blocked.block(x)

        def g_blk(y):
            return gn.apply(p, N.Blocked(y, 64, 64)).data
        fn2, _ = chain(g_blk, xb.data)
        print(f"GroupNorm blocked     {timed(fn2, xb.data)*1e3:7.2f} ms")

    if which in ("all", "dc"):
        x = jnp.asarray(rng.normal(0, 0.3, (B, 64, 64, 64, 1)), jnp.float32)
        for mode in ("never", "auto"):
            dc = DoubleConv(32, dtype=jnp.bfloat16, blocked=mode)
            p = dc.init(jax.random.key(0), x)

            def f(y, dc=dc, p=p):
                from exaspim_tpu.models.unet3d import _ensure_array
                out = _ensure_array(dc.apply(p, y))
                return out[..., :1] * 0.2 + y * 0.8
            fn, _ = chain(f, x)
            print(f"DoubleConv(1->32) {mode:6s} {timed(fn, x)*1e3:7.2f} ms")

    if which in ("all", "up"):
        xlo = jnp.asarray(
            rng.normal(0, 0.3, (B, 32, 32, 32, 32)), jnp.bfloat16)
        skip = jnp.asarray(
            rng.normal(0, 0.3, (B, 64, 64, 64, 32)), jnp.bfloat16)
        for mode in ("never", "auto"):
            upm = Up(32, trilinear=True, dtype=jnp.bfloat16, blocked=mode)
            skip_in = (N.Blocked.block(skip) if mode == "auto"
                       and jax.default_backend() == "tpu" else skip)
            p = upm.init(jax.random.key(0), xlo, skip_in)

            @jax.jit
            def f(y, s, upm=upm, p=p):
                from exaspim_tpu.models.unet3d import _ensure_array

                def body(_, yy):
                    out = _ensure_array(upm.apply(p, yy, s))
                    return out[:, ::2, ::2, ::2, :] * 0.2 + yy * 0.8
                return jnp.sum(
                    jax.lax.fori_loop(0, REPS, body, y)[0, 0, 0]
                    .astype(jnp.float32))
            print(f"Up(64+32->32) {mode:6s}     "
                  f"{timed(f, xlo, skip_in)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
