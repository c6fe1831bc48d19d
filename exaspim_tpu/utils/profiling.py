"""Profiling and step observability.

The reference has no tracing/profiling at all — only tqdm bars (SURVEY
§5). This module fills that gap TPU-natively:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace (XLA op timeline, HBM usage).
* :class:`StepTimer` — wall-clock step/throughput counters with EMA
  smoothing, reporting steps/sec and voxels/sec.
* :func:`device_memory_stats` — live HBM usage per device.
"""

from __future__ import annotations

import contextlib
import json
import time

__all__ = ["trace", "StepTimer", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir, enabled=True):
    """Capture a jax.profiler device trace into ``log_dir``.

    View with TensorBoard's profile plugin. No-op when disabled so call
    sites can leave it in production code paths.
    """
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Step-time / throughput counters with exponential smoothing.

    >>> timer = StepTimer(voxels_per_step=32 * 64**3)
    >>> for batch in loader:
    ...     train_step(...)
    ...     stats = timer.step()
    """

    def __init__(self, voxels_per_step=None, ema=0.9):
        self.voxels_per_step = voxels_per_step
        self.ema = float(ema)
        self._last = None
        self._smoothed = None
        self.count = 0

    def step(self):
        """Mark one step; returns a stats dict (None on the first call)."""
        now = time.perf_counter()
        self.count += 1
        if self._last is None:
            self._last = now
            return None
        dt = now - self._last
        self._last = now
        self._smoothed = (
            dt if self._smoothed is None
            else self.ema * self._smoothed + (1 - self.ema) * dt
        )
        stats = {
            "step": self.count,
            "step_time_s": round(dt, 5),
            "step_time_ema_s": round(self._smoothed, 5),
            "steps_per_sec": round(1.0 / max(self._smoothed, 1e-9), 3),
        }
        if self.voxels_per_step:
            stats["voxels_per_sec"] = round(
                self.voxels_per_step / max(self._smoothed, 1e-9), 1
            )
        return stats


def device_memory_stats():
    """Per-device HBM usage (bytes in use / limit), where supported."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            out[str(d)] = None
    return out


def log_jsonl(path, record):
    """Append one JSON record to a .jsonl file (shared logging helper)."""
    with open(path, "a") as f:
        f.write(json.dumps(record, default=float) + "\n")
