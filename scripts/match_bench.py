"""Time the BM4D Pallas matcher alone on the real chip.

Usage: python scripts/match_bench.py [dim] [K]

Amortizes over 5 chained calls with one host sync (the tunnel's
~38 ms per-sync RTT would dominate a single ~40 ms measurement).
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

from exaspim_tpu.ops.pallas_bm4d import match_topk  # noqa: E402


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.default_rng(0)
    vol = jax.device_put(
        jnp.asarray(rng.normal(100.0, 24.0, (dim,) * 3, ).astype(np.float32))
    )

    fn = jax.jit(lambda v: match_topk(v, group=K)[0])
    t0 = time.time()
    np.asarray(fn(vol)[:1, :1])
    print(f"compile+run {time.time()-t0:.2f}s", flush=True)

    nrep = 5
    for _ in range(2):
        t0 = time.time()
        outs = [fn(vol) for _ in range(nrep)]
        np.asarray(jnp.stack([o[0, :1] for o in outs]))
        dt = (time.time() - t0) / nrep
        print(f"warm {dt*1e3:.1f} ms/call (K={K})", flush=True)


if __name__ == "__main__":
    main()
