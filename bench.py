"""Headline benchmark: BM4DNet tiled-inference voxels/sec/chip on a 256³
uint16 block (BASELINE.json config 3), with REAL quality guards.

Prints one or more JSON lines — the LAST line is always the most complete
record. The headline timing line is flushed the moment the device timing
loop finishes; quality, training-throughput, and classical-BM4D secondaries
each run under their own SIGALRM deadline afterward and re-emit the full
(cumulative) record. A driver timeout mid-secondaries therefore still
leaves the headline evidence on stdout (round 3 lost its entire artifact
to a single buffered print; this layout cannot).

``# phase: ...`` comment lines mark where wall time went so a truncated
tail is diagnosable.

The model is the TRAINED checkpoint committed at
``checkpoints/bm4dnet.msgpack`` (teacher-supervised on BM4D targets, see
RESULTS.md); quality fields measure actual denoising on a held-out
phantom, and the guards fail (quality_ok=false + exit 1) if the model
stops denoising:

* ``cratio_gain``  — blosc-zstd chunk ratio of denoised / noisy (must
  be ≥ MIN_CRATIO_GAIN; an identity model scores ~1.0, the shipped
  checkpoint ~2.03),
* ``ssim_denoised`` — SSIM vs the clean phantom must improve over the
  noisy input (an identity model ties, a degrading model fails),
* ``psnr_gain_db`` — PSNR vs clean must improve by ≥ MIN_PSNR_GAIN_DB
  (the shipped checkpoint gains ~+9.3 dB; this floor stops a
  checkpoint from buying ratio with fidelity).

If the quality phase itself times out, ``quality_ok`` is null,
``quality_ran`` stays false, and the bench exits 0 — a missing
measurement is reported as missing, not as a failure of the model —
while the explicit ``quality_ran: false`` keeps the gap visible to any
downstream consumer of the record.

``vs_baseline`` compares against the CPU reference path (torch UNet
tiled inference, reference inference.py:28-116) measured by
``scripts/measure_reference_baseline.py`` and cached in
``baseline_cpu.json``; a conservative recorded constant is used if the
cache is absent.
"""

import json
import os
import signal
import time

import numpy as np

# Reference CPU path measured on this host via
# scripts/measure_reference_baseline.py (torch-CPU UNet, patch 64,
# overlap 12, trim 5, batch 32). Updated when the measurement script runs.
DEFAULT_BASELINE_VOXSEC = 1.3e6

BLOCK = 256
# PATCH/BATCH are the reference operating point, used for the training
# step (its batch-32×64³ configuration) and as the fallback; the
# inference headline lets ``plan_tiling`` pick the (patch, batch) that
# minimizes overlap redundancy for the block (96³×9 on 256³ — measured
# 42.4 vs 34.5 Mvox/s device-resident, scripts/patch_ab_dev.py).
PATCH, OVERLAP, TRIM, BATCH = 64, 12, 5, 32
CKPT = os.path.join(os.path.dirname(__file__), "checkpoints",
                    "bm4dnet.msgpack")

# The shipped checkpoint scores ~2.03; the guard sits close below it so a
# quality regression actually trips (an identity model scores ~1.0).
MIN_CRATIO_GAIN = 1.9
# PSNR floor: the shipped checkpoint gains ~+9.3 dB on the bench phantom.
# Without this, SSIM (which starts at 0.9982 here) and cratio alone could
# pass a checkpoint that traded several dB of fidelity for ratio.
MIN_PSNR_GAIN_DB = 8.0


def quality_ok(record, trained=True):
    """The bench quality guard: all three predicates must hold.

    * ``cratio_gain``  ≥ MIN_CRATIO_GAIN  (product metric),
    * ``ssim_denoised`` ≥ ``ssim_noisy``  (no structural degradation),
    * ``psnr_gain_db`` ≥ MIN_PSNR_GAIN_DB (fidelity floor — ratio must
      not be bought with dB).
    """
    if not trained:
        return False
    return bool(
        record["cratio_gain"] >= MIN_CRATIO_GAIN
        and record["ssim_denoised"] >= record["ssim_noisy"]
        and record["psnr_gain_db"] >= MIN_PSNR_GAIN_DB
    )

_T0 = time.time()


def _phase(name):
    print(f"# phase: {name} t={time.time() - _T0:.0f}s", flush=True)


def _emit(record):
    print(json.dumps(record), flush=True)


class _PhaseTimeout(Exception):
    pass


def _run_phase(name, seconds, fn):
    """Run ``fn`` under a SIGALRM deadline; return (result, error|None).

    A timed-out or crashed secondary must never take the already-emitted
    headline with it — errors are returned, not raised.
    """
    _phase(f"{name} (deadline {seconds:.0f}s)")

    def _handler(signum, frame):
        raise _PhaseTimeout()

    old = signal.signal(signal.SIGALRM, _handler)
    signal.alarm(max(1, int(seconds)))
    try:
        return fn(), None
    except _PhaseTimeout:
        return None, "timeout"
    except Exception as e:  # noqa: BLE001 — secondary phases are best-effort
        return None, f"{type(e).__name__}: {e}"
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _baseline():
    """(voxels/sec, threads) of the measured CPU-reference anchor."""
    path = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        return float(d["voxels_per_sec"]), int(d.get("threads", 1))
    return DEFAULT_BASELINE_VOXSEC, 1


# The measurement host exposes a single CPU (nproc == 1), so the torch
# reference baseline can only be MEASURED single-threaded here. To keep
# the headline ratio unimpeachable against a realistic multi-core
# deployment, the bench also reports the ratio against a hypothetical
# perfectly-scaling 16-thread run of the same baseline (real torch-CPU
# conv scaling is sublinear, so this extrapolation favors the CPU).
EXTRAPOLATED_BASELINE_THREADS = 16


def _wait_for_backend(max_wait_s):
    """Block until a trivial jax op succeeds in a SUBPROCESS (bounded).

    A wedged TPU device service makes the first jax op in any process
    hang or raise Unavailable, sometimes for over an hour (device-
    service restarts observed on this harness). Probing in a subprocess
    keeps this process's jax uninitialized so the real run starts
    clean; on healthy hosts (including CPU-only ones) the first probe
    returns immediately and costs ~2 s.
    """
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp; "
            "print(float(jnp.sum(jnp.ones((8, 8)))))")
    deadline = time.time() + max_wait_s
    while True:
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               timeout=240, capture_output=True)
            if p.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            print("# backend still unavailable after "
                  f"{max_wait_s:.0f}s of retries", flush=True)
            return False
        print("# backend unavailable; retrying in 60s", flush=True)
        time.sleep(60)


def main():
    budget = float(os.environ.get("EXASPIM_BENCH_BUDGET", 2700))
    if not _wait_for_backend(
        float(os.environ.get("EXASPIM_BENCH_WAIT", 1500))
    ):
        # Emit a parseable artifact documenting the outage instead of
        # a traceback from the first jax op.
        _emit({
            "metric": "bm4dnet_tiled_inference_256c_uint16",
            "value": 0.0,
            "unit": "voxels/sec/chip",
            "vs_baseline": 0.0,
            "error": "device backend unavailable after bounded wait",
        })
        raise SystemExit(1)
    _phase("backend ok; importing jax")
    import jax

    # Persistent compile cache: the tiled program takes minutes to build
    # on the compile service; later bench runs hit the cache.
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/jax"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 10.0
        )
    except Exception:
        pass
    import jax.numpy as jnp

    from exaspim_tpu.data.synthetic import neurite_phantom, noisy_observation
    from exaspim_tpu.inference import predict

    clean, _ = neurite_phantom((BLOCK, BLOCK, BLOCK), n_tubes=24, seed=0)
    img = noisy_observation(clean, seed=1)

    trained = os.path.exists(CKPT)
    # Conv dispatch override for A/B runs ("auto" = blocked Pallas convs
    # where they win, "never" = plain XLA convs).
    blocked = os.environ.get("EXASPIM_BENCH_BLOCKED", "auto")
    if trained:
        from exaspim_tpu.models import build_model
        from exaspim_tpu.train.checkpoint import load_checkpoint
        from exaspim_tpu.transforms import build_transform

        ckpt = load_checkpoint(CKPT)
        model = build_model(
            ckpt["model_config"], dtype=jnp.bfloat16, blocked=blocked
        )
        params, transform = ckpt["params"], build_transform(
            ckpt["transform"])
    else:  # fresh clone without the checkpoint: identity model, no guards
        from exaspim_tpu.models import UNet
        from exaspim_tpu.transforms import build_transform

        model = UNet(width_multiplier=1.0, dtype=jnp.bfloat16)
        params = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, PATCH, PATCH, PATCH, 1))
        )["params"]
        transform = build_transform(
            {"kind": "asinh", "params": {"offset": 100.0, "scale": 60.0}}
        )

    # Commit params to the device ONCE — numpy checkpoint leaves fed to
    # a jitted program re-upload per call (~100 small transfers × the
    # tunnel's per-transfer latency ≈ 1.2 s/call; measured
    # scripts/tiled_profile.py: 1.65 s wall vs 0.49 s device compute).
    from exaspim_tpu.inference import commit_params

    params = commit_params(params)

    from exaspim_tpu.inference import plan_tiling

    inf_patch, inf_batch = plan_tiling(img.shape, OVERLAP)
    kwargs = dict(
        patch_size=inf_patch, overlap=OVERLAP, trim=TRIM,
        batch_size=inf_batch,
    )
    # Warm-up: compile. If the blocked Pallas path fails to build on
    # this toolchain (Mosaic versions differ across environments), fall
    # back to the XLA conv path — a slower headline beats a red bench.
    _phase("warm-up compile (tiled inference program)")
    try:
        out = predict(img, model, params, transform, **kwargs)
    except Exception as e:  # noqa: BLE001 — robustness of the artifact
        if blocked == "never" or not trained:
            raise
        print(f"# blocked conv path failed ({type(e).__name__}); "
              "falling back to blocked='never'", flush=True)
        blocked = "never"
        model = build_model(
            ckpt["model_config"], dtype=jnp.bfloat16, blocked="never"
        )
        out = predict(img, model, params, transform, **kwargs)
    # Single-block latency (includes host↔device transfers).
    _phase("timing: single-block latency")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = predict(img, model, params, transform, **kwargs)
        times.append(time.perf_counter() - t0)
    latency = min(times)

    # Pipelined throughput: production streams blocks, so transfers of
    # block i+1 overlap compute of block i (JAX async dispatch). This is
    # the deployment number; a whole-brain run processes thousands of
    # blocks back to back.
    from exaspim_tpu.inference import build_tiled_program

    _phase("timing: pipelined blocks")
    blocks = [img, noisy_observation(clean, seed=7)]
    program, starts = build_tiled_program(
        model, transform, img.shape, inf_patch, OVERLAP, TRIM, inf_batch
    )
    dstarts = jnp.asarray(starts)
    n_runs = 6
    t0 = time.perf_counter()
    outs = []
    for i in range(n_runs):
        dev = jax.device_put(blocks[i % len(blocks)])
        outs.append(program(params, dev, dstarts))
    results_np = [np.asarray(o) for o in outs]
    pipelined = (time.perf_counter() - t0) / n_runs
    del results_np

    # Device-resident block rate: the production number. On a real TPU
    # host the 2×33 MB block transfers ride PCIe (negligible); in this
    # harness they cross a ~25 MB/s tunnel that would otherwise dominate
    # and vary run to run. A device-side scalar fetch per block forces
    # the computation honestly (block_until_ready alone does not, see
    # timing notes in RESULTS.md).
    _phase("timing: device-resident blocks")
    checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    dimg = jax.device_put(jnp.asarray(img))
    float(checksum(program(params, dimg, dstarts)))
    t0 = time.perf_counter()
    for _ in range(n_runs):
        float(checksum(program(params, dimg, dstarts)))
    device_dt = (time.perf_counter() - t0) / n_runs

    dt = min(latency, pipelined, device_dt)
    voxsec = img.size / dt

    baseline, baseline_threads = _baseline()
    extrap = max(1, EXTRAPOLATED_BASELINE_THREADS // max(1, baseline_threads))
    record = {
        "metric": "bm4dnet_tiled_inference_256c_uint16",
        "value": round(voxsec, 1),
        "unit": "voxels/sec/chip",
        "vs_baseline": round(voxsec / baseline, 2),
        "baseline_threads": baseline_threads,
        "host_cpus": os.cpu_count(),
        "vs_baseline_16thread_extrapolated": round(
            voxsec / (baseline * extrap), 2
        ),
        "block": [BLOCK] * 3,
        "patch": inf_patch,
        "overlap": OVERLAP,
        "trim": TRIM,
        "batch": inf_batch,
        "seconds_per_block": round(dt, 4),
        "latency_s": round(latency, 4),
        "pipelined_s": round(pipelined, 4),
        "device_s": round(device_dt, 4),
        "trained_checkpoint": trained,
        "conv_path": blocked,
        "quality_ok": None,
        # Distinct from quality_ok=null: False until the quality phase
        # actually completes, so a timed-out guard can never read as a
        # silently-green record downstream.
        "quality_ran": False,
        "n_devices": len(jax.devices()),
    }
    # The headline is now evidence on stdout no matter what happens below.
    _emit(record)

    def _remaining():
        return budget - (time.time() - _T0)

    # --- Quality (not timed): real denoising evidence on the phantom.
    def _quality():
        from exaspim_tpu.compression import best_codec, compute_cratio
        from exaspim_tpu.ops.ssim import psnr, ssim3d

        codec = best_codec(clevel=6)
        cr_noisy = compute_cratio(img, codec)
        cr_denoised = compute_cratio(out, codec)
        drange = float(clean.max())
        return {
            "cratio_noisy": cr_noisy,
            "cratio_denoised": cr_denoised,
            "cratio_gain": round(cr_denoised / cr_noisy, 3),
            "psnr_noisy_db": round(
                float(psnr(img.astype(np.float32), clean, drange)), 2),
            "psnr_denoised_db": round(
                float(psnr(out.astype(np.float32), clean, drange)), 2),
            "ssim_noisy": round(float(ssim3d(
                img.astype(np.float32), clean, data_range=drange)), 4),
            "ssim_denoised": round(float(ssim3d(
                out.astype(np.float32), clean, data_range=drange)), 4),
        }

    q, q_err = _run_phase("quality", min(600, max(60, _remaining())),
                          _quality)
    if q is not None:
        record.update(q)
        record["psnr_gain_db"] = round(
            record["psnr_denoised_db"] - record["psnr_noisy_db"], 2)
        record["quality_ok"] = quality_ok(record, trained)
        record["quality_ran"] = True
    else:
        record["quality_error"] = q_err
    _emit(record)

    # --- Secondary: training throughput (voxels/sec through one jitted
    # train step, batch 32 × 64³, blocked Pallas conv path — the
    # training default since the rolling-z dL/dW kernel landed).
    def _train_throughput():
        from exaspim_tpu.models import UNet as _UNet
        from exaspim_tpu.train import create_train_state
        from exaspim_tpu.train.state import make_train_step

        tmodel = _UNet(width_multiplier=1.0, dtype=jnp.bfloat16,
                       blocked="auto")
        tstate = create_train_state(
            tmodel, patch_shape=(PATCH,) * 3, lr=1e-4, total_steps=100,
            seed=0,
        )
        tstep = make_train_step(fg_weight=20.0, donate=False)
        xb = jnp.asarray(
            np.random.default_rng(0).normal(
                0.5, 0.1, (BATCH, PATCH, PATCH, PATCH, 1)
            ),
            jnp.float32,
        )
        fgb = jnp.zeros(xb.shape, bool)

        @jax.jit
        def _chain(st, x, y, fg):
            def body(_, s):
                s2, _l = tstep(s, x, y, fg)
                return s2
            st = jax.lax.fori_loop(0, 8, body, st)
            return jnp.sum(
                jax.tree_util.tree_leaves(st.params)[0].astype(jnp.float32)
            )

        float(_chain(tstate, xb, xb * 0.9, fgb))  # compile + run
        t0 = time.perf_counter()
        float(_chain(tstate, xb, xb * 0.9, fgb))
        step_s = (time.perf_counter() - t0) / 8
        return BATCH * PATCH ** 3 / step_s

    if _remaining() > 90:
        tv, t_err = _run_phase(
            "train throughput", min(600, _remaining() - 30),
            _train_throughput)
        record["train_voxels_per_sec"] = round(tv, 1) if tv else None
        if t_err:
            record["train_error"] = t_err
        _emit(record)
    else:
        record["train_voxels_per_sec"] = None
        record["train_error"] = "budget exhausted"

    # Secondary: classical BM4D throughput (teacher generation /
    # unsupervised-eval GT path; Pallas matcher on TPU). Best-effort.
    # Measured at the parity default (step=3, the reference operating
    # point) AND the documented TPU fast profile (step=4: the reference
    # grid tiles exactly, the matcher's band matmuls become single-tile
    # contractions and the latency-bound gather/scatter row count
    # drops 2.4×; −7 % RMSE gain, pinned by
    # tests/test_bm4d.py::test_fast_profile_quality).
    def _bm4d_throughput(step):
        from exaspim_tpu.ops.bm4d import bm4d as _bm4d

        bvol = jnp.asarray(
            np.random.default_rng(1)
            .normal(400.0, 24.0, (128, 128, 128))
            .astype(np.float32)
        )
        np.asarray(_bm4d(bvol, 24.0, step=step)[:1, :1, :4])  # compile
        # Amortized throughput over a chain of async-dispatched calls
        # (one host sync at the end): the production shape of this op
        # is thousands of teacher patches back-to-back
        # (scripts/precompute.py), not a single synchronous call, and
        # the tunnel's ~38 ms per-sync RTT would otherwise dominate a
        # ~0.2 s measurement.
        nrep = 10
        t0 = time.perf_counter()
        outs = [_bm4d(bvol, 24.0, step=step) for _ in range(nrep)]
        np.asarray(jnp.stack([o[0, 0, 0] for o in outs]))
        return nrep * 128 ** 3 / (time.perf_counter() - t0)

    for key, step in (("bm4d_voxels_per_sec", 3),
                      ("bm4d_fast_voxels_per_sec", 4)):
        if _remaining() > 90:
            bv, b_err = _run_phase(
                f"bm4d throughput (step={step})",
                min(600, _remaining() - 30),
                lambda step=step: _bm4d_throughput(step))
            record[key] = round(bv, 1) if bv else None
            if b_err:
                record[key.replace("voxels_per_sec", "error")] = b_err
        else:
            record[key] = None
            record[key.replace("voxels_per_sec", "error")] = (
                "budget exhausted"
            )
    _emit(record)

    if trained and record["quality_ok"] is False:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
