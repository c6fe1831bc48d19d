"""Profile bm4d_stage on the real chip and dump a device-op breakdown.

Usage: python scripts/bm4d_profile.py [dim] [outdir]

Runs stage-1 (hard) and the two-stage pipeline on a random volume,
captures a jax.profiler trace of one warm call each, and prints
wall times. Parse the trace with scripts/xplane_top.py.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from exaspim_tpu.ops.bm4d import bm4d, bm4d_stage  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bm4d_prof"
    rng = np.random.default_rng(0)
    vol = jnp.asarray(
        rng.normal(100.0, 24.0, (dim,) * 3).astype(np.float32)
    )
    vol = jax.device_put(vol)
    sigma = jnp.float32(24.0)

    def stage1(v):
        return bm4d_stage(v, v, sigma, mode="hard")

    # Warm up (compile) then time.
    t0 = time.time()
    out = stage1(vol)
    np.asarray(out[:1, :1, :8])
    print(f"stage1 compile+run {time.time()-t0:.2f}s", flush=True)

    for _ in range(2):
        t0 = time.time()
        out = stage1(vol)
        np.asarray(out[:1, :1, :8])
        print(f"stage1 warm {time.time()-t0:.3f}s", flush=True)

    t0 = time.time()
    full = bm4d(vol, 24.0)
    np.asarray(full[:1, :1, :8])
    print(f"two-stage compile+run {time.time()-t0:.2f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        full = bm4d(vol, 24.0)
        np.asarray(full[:1, :1, :8])
        dt = time.time() - t0
        print(
            f"two-stage warm {dt:.3f}s = {dim**3/dt/1e6:.2f} Mvox/s",
            flush=True,
        )

    with jax.profiler.trace(outdir):
        full = bm4d(vol, 24.0)
        np.asarray(full[:1, :1, :8])
    print(f"trace written to {outdir}", flush=True)


if __name__ == "__main__":
    main()
