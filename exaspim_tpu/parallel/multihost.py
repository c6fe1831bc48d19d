"""Multi-host (TPU pod / multi-process) runtime initialization.

The reference is single-process single-GPU (reference train.py:41,
SURVEY §2.3 — no NCCL/MPI/distributed backend of any kind). On TPU the
multi-host story needs no external communication library either: after
``jax.distributed.initialize`` every process sees the full pod through
``jax.devices()``, and the existing mesh helpers
(:func:`exaspim_tpu.parallel.mesh.make_mesh`) plus ``shard_map``/XLA
collectives handle ICI (intra-slice) and DCN (inter-slice) traffic —
the same code paths exercised single-host on the virtual CPU mesh in
``tests/``.

Usage, one call at program start before any jax computation::

    from exaspim_tpu.parallel import initialize_multihost
    initialize_multihost()            # TPU pod: full auto-detect
    initialize_multihost("host0:1234", num_processes=4, process_id=i)

Then build meshes over the global device list as usual; data loading
should shard per process (``jax.process_index()``) and checkpointing
write from process 0 only (``save_checkpoint`` callers gate on
:func:`is_primary`).
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize_multihost", "is_primary"]


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None, local_device_ids=None):
    """Initialize the JAX distributed runtime (idempotent, safe solo).

    On Cloud TPU pods every argument auto-detects from the metadata
    server, so a bare call works. Off-pod (e.g. CPU/GPU clusters) pass
    ``coordinator_address``/``num_processes``/``process_id`` or set the
    standard env vars (``JAX_COORDINATOR_ADDRESS`` etc.).

    Returns True when the distributed runtime is (now) initialized,
    False when running single-process with nothing to do — calling
    this unconditionally at script start is always safe: a solo run
    with no coordinator configured is a no-op, and a second call on an
    initialized runtime is ignored.
    """
    # Already initialized → idempotent success.
    try:
        from jax._src.distributed import global_state

        if getattr(global_state, "client", None) is not None:
            return True
    except ImportError:  # private API moved; initialize() will raise
        pass             # its own "already initialized" if so

    # Cloud TPU pod: the runtime env lists every worker; a single
    # entry (or none) means there is no job to join.
    workers = [
        w for w in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")
        if w.strip()
    ]
    has_cfg = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
        or len(workers) > 1
    )
    if not has_cfg and num_processes is None:
        return False  # plain single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_primary():
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
