"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware. Multi-chip sharding paths (pjit /
shard_map halo exchange) are validated on a virtual 8-device CPU platform,
the TPU-framework analogue of the reference's single-host unittest strategy
(reference .github/workflows/test_and_lint.yml).
"""

import os
import sys

# Must run before jax initializes a backend. The environment may pin
# JAX_PLATFORMS to a hardware plugin (e.g. "axon"); tests always run on the
# virtual CPU mesh, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# Some hardware plugins force jax_platforms at import; pin it back to cpu.
jax.config.update("jax_platforms", "cpu")

assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"
