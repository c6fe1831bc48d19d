"""Profiling utilities tests."""

import os
import time

import pytest

from exaspim_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    log_jsonl,
    trace,
)


def test_step_timer_reports_throughput():
    timer = StepTimer(voxels_per_step=1000, ema=0.5)
    assert timer.step() is None
    time.sleep(0.01)
    stats = timer.step()
    assert stats["step"] == 2
    assert stats["step_time_s"] > 0
    assert stats["voxels_per_sec"] > 0


def test_trace_disabled_noop(tmp_path):
    with trace(tmp_path, enabled=False):
        pass
    assert not os.listdir(tmp_path)


@pytest.mark.slow
def test_trace_enabled_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    with trace(tmp_path, enabled=True):
        jnp.sum(jnp.ones(16)).block_until_ready()
    assert os.listdir(tmp_path)


def test_device_memory_stats_keys():
    stats = device_memory_stats()
    assert len(stats) >= 1


def test_log_jsonl(tmp_path):
    p = os.path.join(tmp_path, "log.jsonl")
    log_jsonl(p, {"a": 1})
    log_jsonl(p, {"b": 2.5})
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 2
