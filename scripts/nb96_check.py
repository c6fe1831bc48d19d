"""Compile + parity check of the blocked conv at 96² planes (zb=1) on
the real chip. Usage: python scripts/nb96_check.py"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
import numpy as np

from exaspim_tpu.ops.nb_conv import Blocked, nb_conv3d


def main():
    rng = np.random.default_rng(0)
    for cin in (1, 32):
        x = rng.normal(size=(1, 96, 96, 96, cin)).astype(np.float32)
        k = (rng.normal(size=(3, 3, 3, cin, 32)) * 0.1).astype(np.float32)
        xb = Blocked.block(jnp.asarray(x, jnp.bfloat16))
        kd = jnp.asarray(k, jnp.bfloat16)

        @jax.jit
        def run(data, kd, cin=cin):
            return nb_conv3d((data,), kd, 96, 96, (cin,))

        t0 = time.perf_counter()
        out = np.asarray(run(xb.data, kd))
        print(f"cin={cin}: compile+run {time.perf_counter() - t0:.1f}s",
              flush=True)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(run(xb.data, kd))
            times.append(time.perf_counter() - t0)
        ref = jax.lax.conv_general_dilated(
            jnp.asarray(x, jnp.bfloat16), kd, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        got = Blocked(jnp.asarray(out), 96, 96).unblock()
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"cin={cin}: min {min(times) * 1e3:.1f} ms  max|err| {err}",
              flush=True)


if __name__ == "__main__":
    main()
