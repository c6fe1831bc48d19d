"""Bisect which blocked conv sites help/hurt the full UNet fwd (dev).

Patches models.unet3d._nb_ok with a call-order whitelist (trace order is
deterministic) and times the full forward for each subset.
"""

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
from exaspim_tpu.models import unet3d as U  # noqa: E402

REPS = 8
_real_nb_ok = U._nb_ok


def list_sites():
    calls = []

    def spy(h, w, splits, cout, mode):
        ok = _real_nb_ok(h, w, splits, cout, mode)
        calls.append((len(calls), h, w, splits, cout, ok))
        return ok

    U._nb_ok = spy
    model = UNet(width_multiplier=1.0, dtype=jnp.bfloat16, blocked="auto")
    x = jnp.zeros((1, 64, 64, 64, 1), jnp.float32)
    jax.eval_shape(model.init, jax.random.key(0), x)
    U._nb_ok = _real_nb_ok
    for c in calls:
        print("site", c)
    return calls


def timed_fwd(allow):
    idx = [0]

    def gate(h, w, splits, cout, mode):
        ok = _real_nb_ok(h, w, splits, cout, mode)
        i = idx[0]
        idx[0] += 1
        return ok and (allow == "all" or i in allow)

    U._nb_ok = gate
    model = UNet(width_multiplier=1.0, dtype=jnp.bfloat16, blocked="auto")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.5, 0.1, (32, 64, 64, 64, 1)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]

    @jax.jit
    def fwd_chain(params, x):
        def body(_, y):
            idx[0] = 0
            return model.apply({"params": params}, y)
        return jnp.sum(jax.lax.fori_loop(0, REPS, body, x)[0, 0, 0, 0])

    idx[0] = 0
    jax.block_until_ready(fwd_chain(params, x))
    best = float("inf")
    for _ in range(3):
        idx[0] = 0
        t0 = time.perf_counter()
        float(np.asarray(fwd_chain(params, x)))
        best = min(best, time.perf_counter() - t0)
    U._nb_ok = _real_nb_ok
    return best / REPS


if __name__ == "__main__":
    if sys.argv[1] == "sites":
        list_sites()
    else:
        allow = ("all" if sys.argv[1] == "all" else
                 set(int(a) for a in sys.argv[1].split(",")) if
                 sys.argv[1] != "none" else set())
        t = timed_fwd(allow)
        print(f"allow={sys.argv[1]:12s} fwd {t*1e3:7.1f} ms")
