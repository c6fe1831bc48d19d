"""Worker process for the 2-process ``jax.distributed`` local-cluster test.

Run by tests/test_multihost.py as ``python _multihost_worker.py
<process_id> <coordinator_port>`` with JAX_PLATFORMS=cpu and
``--xla_force_host_platform_device_count=4`` so the 2-process cluster
exposes a global 8-device mesh (4 local CPU devices per controller).

Exercises, for real (not on a single-process virtual mesh):
* ``initialize_multihost`` joining a coordinator,
* a data-parallel train step over the global mesh (gradient psum
  crosses the process boundary),
* z-sharded inference with halo exchange + the multi-controller output
  all-gather.

Prints one JSON line the parent asserts on; both workers must print
identical numbers (replicated results are bitwise-identical across
controllers or the collectives are broken).
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]

    from exaspim_tpu.parallel import initialize_multihost, is_primary

    assert initialize_multihost(
        f"localhost:{port}", num_processes=2, process_id=pid
    )

    import jax
    import numpy as np

    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8
    assert is_primary() == (pid == 0)

    from exaspim_tpu.models import UNet
    from exaspim_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )
    from exaspim_tpu.train import create_train_state

    mesh = make_mesh()  # all 8 global devices
    model = UNet(width_multiplier=0.25)
    state = create_train_state(
        model, patch_shape=(8, 8, 8), lr=1e-3, total_steps=2, seed=0
    )
    step = make_dp_train_step(mesh, fg_weight=0.0)
    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 0.1, (8, 8, 8, 8, 1)).astype(np.float32)
    batch = shard_batch(mesh, (x, x * 0.9, np.zeros_like(x, bool)))
    state, loss = step(state, *batch)
    loss = float(loss)  # replicated scalar: addressable everywhere

    # z-sharded inference across both controllers.
    from exaspim_tpu.parallel.spatial import predict_sharded
    from exaspim_tpu.transforms import build_transform

    transform = build_transform(
        {"kind": "asinh", "params": {"offset": 100.0, "scale": 50.0}}
    )
    img = rng.integers(80, 400, (128, 24, 24)).astype(np.uint16)
    out = predict_sharded(
        img, model, state.params, transform, mesh,
        patch_size=16, overlap=6, trim=3, batch_size=4,
    )
    assert out.shape == img.shape and out.dtype == np.uint16

    print(json.dumps({
        "pid": pid,
        "loss": loss,
        "out_sum": int(np.sum(out, dtype=np.int64)),
        "out_head": np.asarray(out[0, 0, :4]).tolist(),
    }))


if __name__ == "__main__":
    main()
