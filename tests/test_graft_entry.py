"""Regression tests for the driver entry point's dryrun dispatch.

Rounds 1 and 2 both produced a red ``MULTICHIP_r*.json``: the driver
invokes ``dryrun_multichip(8)`` with ``JAX_PLATFORMS=cpu`` +
``--xla_force_host_platform_device_count=8`` in the environment, but a
site hook (the axon sitecustomize) has already pinned jax.config and
initialized a 1-device hardware backend — so trusting the env and
running inline hit ``need 8 devices, have 1``. These tests pin the fix:
the env must never override a live too-small backend, and the
subprocess must strip site-hook dirs from PYTHONPATH by content, not by
name.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import __graft_entry__ as ge  # noqa: E402

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = [pytest.mark.slow, pytest.mark.medium]



class _FakeProc:
    returncode = 0


def test_env_never_overrides_small_backend(monkeypatch):
    """Backend initialized with fewer devices than requested + env
    claiming a big-enough CPU platform ⇒ MUST take the subprocess path
    (the exact round-1/round-2 driver failure)."""
    # pytest's conftest initializes an 8-device CPU backend; asking for
    # 16 makes that live backend "too small", mirroring the driver's
    # 1-device axon backend vs n_devices=8.
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=16"
    )
    monkeypatch.delenv("_EXASPIM_DRYRUN_INNER", raising=False)
    calls = {}

    def fake_run(cmd, env=None, **kw):
        calls["cmd"], calls["env"] = cmd, env
        return _FakeProc()

    monkeypatch.setattr(subprocess, "run", fake_run)
    ge.dryrun_multichip(16)  # inline would raise "need 16, have 8"
    assert calls, "must dispatch to a subprocess, not run inline"
    assert calls["env"]["_EXASPIM_DRYRUN_INNER"] == "1"
    assert calls["env"]["JAX_PLATFORMS"] == "cpu"
    assert (
        "xla_force_host_platform_device_count=16"
        in calls["env"]["XLA_FLAGS"]
    )


def test_subprocess_strips_site_hook_dirs(monkeypatch, tmp_path):
    """PYTHONPATH entries containing a sitecustomize.py are dropped from
    the subprocess env (by content, not by the substring 'axon')."""
    hook = tmp_path / "hookdir"
    hook.mkdir()
    (hook / "sitecustomize.py").write_text("# hardware plugin hook\n")
    plain = tmp_path / "plain"
    plain.mkdir()
    monkeypatch.setenv(
        "PYTHONPATH", os.pathsep.join([str(hook), str(plain)])
    )
    monkeypatch.delenv("_EXASPIM_DRYRUN_INNER", raising=False)
    calls = {}

    def fake_run(cmd, env=None, **kw):
        calls["env"] = env
        return _FakeProc()

    monkeypatch.setattr(subprocess, "run", fake_run)
    ge.dryrun_multichip(16)
    pyp = calls["env"]["PYTHONPATH"].split(os.pathsep)
    assert str(hook) not in pyp
    assert str(plain) in pyp


def test_inline_when_backend_is_big_enough():
    """With the pytest 8-device CPU backend live, dryrun(2) runs inline
    end-to-end (dp train step + sharded inference + sharded BM4D)."""
    ge.dryrun_multichip(2)


def test_subprocess_failure_raises(monkeypatch):
    monkeypatch.delenv("_EXASPIM_DRYRUN_INNER", raising=False)

    class _Fail:
        returncode = 3

    monkeypatch.setattr(
        subprocess, "run", lambda *a, **kw: _Fail()
    )
    with pytest.raises(RuntimeError, match="rc=3"):
        ge.dryrun_multichip(16)
