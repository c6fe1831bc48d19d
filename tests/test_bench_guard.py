"""The bench quality guard must enforce all three predicates.

Round-5 hardening: ``quality_ok`` previously required only
``cratio_gain >= MIN_CRATIO_GAIN`` and a non-degrading SSIM — on a
phantom whose noisy SSIM starts at 0.9982 a checkpoint could trade
several dB of PSNR for ratio and still pass. The guard now also
requires ``psnr_gain_db >= MIN_PSNR_GAIN_DB``, and a record whose
quality phase never completed carries an explicit ``quality_ran: false``
so it cannot read as silently green.
"""

import importlib.util
import os

import pytest

_BENCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
)


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _good_record(bench):
    return {
        "cratio_gain": bench.MIN_CRATIO_GAIN + 0.1,
        "ssim_noisy": 0.9982,
        "ssim_denoised": 0.9999,
        "psnr_gain_db": bench.MIN_PSNR_GAIN_DB + 1.0,
    }


def test_guard_passes_healthy_record(bench):
    assert bench.quality_ok(_good_record(bench)) is True


def test_guard_requires_cratio_gain(bench):
    rec = _good_record(bench)
    rec["cratio_gain"] = bench.MIN_CRATIO_GAIN - 0.01
    assert bench.quality_ok(rec) is False


def test_guard_requires_nondegrading_ssim(bench):
    rec = _good_record(bench)
    rec["ssim_denoised"] = rec["ssim_noisy"] - 1e-4
    assert bench.quality_ok(rec) is False


def test_guard_requires_psnr_floor(bench):
    """A checkpoint buying ratio with fidelity (5 dB PSNR loss, say)
    must fail even with excellent cratio and SSIM."""
    rec = _good_record(bench)
    rec["cratio_gain"] = 5.0
    rec["psnr_gain_db"] = bench.MIN_PSNR_GAIN_DB - 0.01
    assert bench.quality_ok(rec) is False


def test_guard_untrained_never_green(bench):
    assert bench.quality_ok(_good_record(bench), trained=False) is False


def test_initial_record_shape_marks_quality_unran(bench):
    """The headline record template must carry quality_ran=False until
    the quality phase completes (checked against the source so the
    field cannot silently disappear)."""
    with open(_BENCH) as f:
        src = f.read()
    assert '"quality_ran": False' in src
    assert 'record["quality_ran"] = True' in src
