"""Capture a device trace of one fwd pass and print the top ops (dev).

Usage: python scripts/nb_profile.py <never|auto|SITES> [out_dir]
"""

import glob
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

_real_nb_ok = U._nb_ok


def main():
    mode = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/prof_{mode}"
    if mode not in ("never", "auto"):
        allow = set(int(a) for a in mode.split(",")) if mode != "none" \
            else set()
        idx = [0]

        def gate(h, w, splits, cout, m):
            ok = _real_nb_ok(h, w, splits, cout, m)
            i = idx[0]
            idx[0] += 1
            return ok and i in allow
        U._nb_ok = gate
        model_mode = "auto"
    else:
        model_mode = mode

    model = UNet(width_multiplier=1.0, dtype=jnp.bfloat16,
                 blocked=model_mode)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.5, 0.1, (32, 64, 64, 64, 1)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)["params"]

    if os.environ.get("NB_PROFILE_TRAIN") == "1":
        from exaspim_tpu.train import create_train_state
        from exaspim_tpu.train.state import make_train_step

        state = create_train_state(
            model, patch_shape=(64,) * 3, lr=1e-4, total_steps=100,
            seed=0, params=params,
        )
        step = make_train_step(fg_weight=20.0, donate=False)
        y = x * 0.9
        fg = jnp.zeros(x.shape, bool)

        @jax.jit
        def fwd(params, x):
            st, loss = step(state, x, y, fg)
            # checksum over EVERY param leaf so no gradient is DCE'd
            acc = loss.astype(jnp.float32)
            for leaf in jax.tree_util.tree_leaves(st.params):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc
    else:
        @jax.jit
        def fwd(params, x):
            if mode not in ("never", "auto"):
                idx[0] = 0  # reset the site counter at trace entry
            return model.apply({"params": params}, x)

    jax.block_until_ready(fwd(params, x))
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        for _ in range(3):
            y = fwd(params, x)
        jax.block_until_ready(y)
        _ = np.asarray(y[0, 0, 0, 0])
    print("trace written to", out)
    time.sleep(2)
    parse(out)


def parse(out):
    files = glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        print("no xplane files found")
        return
    f = max(files, key=os.path.getmtime)
    print("parsing", f)
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data([f], "framework_op_stats", {})
    # data is CSV-ish JSON; just dump the first chunk for inspection
    text = data if isinstance(data, str) else data.decode()
    print(text[:8000])


if __name__ == "__main__":
    if sys.argv[1] == "parse":
        parse(sys.argv[2])
    else:
        main()
