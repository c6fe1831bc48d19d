"""Mosaic feasibility probe for the natural-blocked conv design.

Answers three questions on the real TPU (dev tool, not shipped API):

1. Do *static* sublane (second-minor) slices at non-8-aligned offsets
   (row shift ±1, ±w2±1) compile and produce correct copies?
2. Do static lane slices at 64- and 32-lane offsets compile/correct?
3. What do they cost relative to an aligned copy?

These determine whether `nb_conv3d` (natural-phase blocked conv: blocked
in, blocked out, no per-conv pack/unpack) can build its im2col panel
with 1.78x FLOP inflation (lane-sliced parity groups) or must fall back
to full-lane shifted copies (4x inflation).
"""

import functools
import time

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

M, L = 1024, 128
PAD = 64  # rows of padding so shifted reads stay in bounds


def _copy_kernel(shift, lane_lo, lane_n, x_ref, o_ref):
    o_ref[:, :lane_n] = x_ref[PAD + shift:PAD + shift + M,
                              lane_lo:lane_lo + lane_n]


def make_copy(shift=0, lane_lo=0, lane_n=L, reps=64):
    kern = functools.partial(_copy_kernel, shift, lane_lo, lane_n)
    call = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, lane_n), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def chained(x):
        def body(_, acc):
            return acc + call(x).astype(jnp.float32)
        out = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((M, lane_n), jnp.float32)
        )
        return out / reps

    return chained


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(M + 2 * PAD, L)).astype(np.float32), jnp.bfloat16
    )
    xh = np.asarray(x, np.float32)

    cases = [
        ("aligned copy", dict()),
        ("sublane shift +1", dict(shift=1)),
        ("sublane shift -1", dict(shift=-1)),
        ("sublane shift +33 (w2+1)", dict(shift=33)),
        ("lane slice [64:128]", dict(lane_lo=64, lane_n=64)),
        ("lane slice [32:64]", dict(lane_lo=32, lane_n=32)),
        ("shift+1 & lane[32:64]", dict(shift=1, lane_lo=32, lane_n=32)),
    ]
    for name, kw in cases:
        try:
            fn = make_copy(**kw)
            y = np.asarray(jax.block_until_ready(fn(x)), np.float32)
            sh, lo, n = kw.get("shift", 0), kw.get("lane_lo", 0), kw.get(
                "lane_n", L)
            want = xh[PAD + sh:PAD + sh + M, lo:lo + n]
            ok = np.allclose(y, want, atol=2e-2)
            t0 = time.perf_counter()
            np.asarray(fn(x))  # timed: 64 chained kernel calls + fetch
            dt = time.perf_counter() - t0
            print(f"{name:28s} OK={ok}  64-rep wall {dt*1e3:7.1f} ms")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:120]
            print(f"{name:28s} FAILED: {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
