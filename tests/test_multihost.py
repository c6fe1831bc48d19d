"""2-process ``jax.distributed`` local-cluster test (no hardware needed).

The reference has no distributed backend at all (SURVEY §2.3); this
framework claims multi-host via ``initialize_multihost`` + global meshes.
This test makes that claim real: two OS processes, each with 4 virtual
CPU devices, join one coordinator and run a data-parallel train step
(gradient psum across the process boundary) plus z-sharded inference
(halo ppermute + multi-controller output all-gather) over the global
8-device mesh. Both controllers must report identical results, and the
dp loss must equal the same step executed single-process on this test
runner's own 8-device mesh.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.medium]

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cluster_dp_and_sharded_inference():
    port = _free_port()
    # Hardware-plugin vars (axon/TPU tunnels) must not leak into the
    # CPU cluster: some register their own coordination endpoints.
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(
            ("JAX_", "XLA_", "AXON_", "PALLAS_", "TPU_", "PJRT_")
        )
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    a, b = sorted(outs, key=lambda r: r["pid"])
    assert a["pid"] == 0 and b["pid"] == 1
    # Replicated results must agree bitwise across controllers.
    assert a["loss"] == b["loss"]
    assert a["out_sum"] == b["out_sum"]
    assert a["out_head"] == b["out_head"]
    assert np.isfinite(a["loss"])

    # The 2-process global step must equal the same step run
    # single-process on this runner's own 8-device mesh.
    from exaspim_tpu.models import UNet
    from exaspim_tpu.parallel import (
        make_dp_train_step,
        make_mesh,
        shard_batch,
    )
    from exaspim_tpu.train import create_train_state

    mesh = make_mesh()
    model = UNet(width_multiplier=0.25)
    state = create_train_state(
        model, patch_shape=(8, 8, 8), lr=1e-3, total_steps=2, seed=0
    )
    step = make_dp_train_step(mesh, fg_weight=0.0)
    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 0.1, (8, 8, 8, 8, 1)).astype(np.float32)
    batch = shard_batch(mesh, (x, x * 0.9, np.zeros_like(x, bool)))
    _, loss = step(state, *batch)
    np.testing.assert_allclose(a["loss"], float(loss), rtol=1e-6)
