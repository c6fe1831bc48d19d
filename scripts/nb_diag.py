"""Diagnose nb_conv3d cost split: panel build vs GEMM vs DMA (dev tool)."""

import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")

from exaspim_tpu.ops import nb_conv as N  # noqa: E402

REPS = 16


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    return best


def _slices(h2, w2, cin_splits, xrefs, masked=True):
    m = h2 * w2
    base = N._row_pad(w2)
    n_seg = len(cin_splits)
    qx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % w2
    mask_hi = qx < (w2 - 1)
    mask_lo = qx > 0
    out = []
    for tz, dy, dx, _py, _pxs, seg, lane0, width, row in N._iter_rows(
        cin_splits
    ):
        xr = xrefs[tz * n_seg + seg]
        r0 = base + dy * w2 + dx
        seg_data = xr[0, 0, r0:r0 + m, lane0:lane0 + width]
        if masked:
            if dx == 1:
                seg_data = jnp.where(mask_hi, seg_data, 0)
            elif dx == -1:
                seg_data = jnp.where(mask_lo, seg_data, 0)
        out.append((tz, row, width, seg_data))
    return out


def variant_kernel(h2, w2, cin_splits, mode, *refs):
    *xrefs, wp, out, acc = refs
    m = h2 * w2
    if mode in ("full", "aligned_only", "panel_only"):
        sl = _slices(h2, w2, cin_splits, xrefs, masked=(mode == "full"))
        for _tz, row, width, seg_data in sl:
            acc[:, row:row + width] = seg_data
        if mode == "panel_only":
            out[0, 0] = acc[:, :out.shape[-1]].astype(out.dtype)
        else:
            out[0, 0] = jnp.dot(
                acc[...], wp[...], preferred_element_type=jnp.float32
            ).astype(out.dtype)
    elif mode == "gemm_only":
        out[0, 0] = jnp.dot(
            acc[...], wp[...], preferred_element_type=jnp.float32
        ).astype(out.dtype)
    elif mode == "concat_panel":
        sl = _slices(h2, w2, cin_splits, xrefs)
        panel = jnp.concatenate([s for _, _, _, s in sl], axis=1)
        out[0, 0] = jnp.dot(
            panel, wp[...], preferred_element_type=jnp.float32
        ).astype(out.dtype)
    elif mode == "per_tz_dots":
        sl = _slices(h2, w2, cin_splits, xrefs)
        kc = N._k_dim(cin_splits) // 3
        res = jnp.zeros((m, out.shape[-1]), jnp.float32)
        for tz in range(3):
            chunk = jnp.concatenate(
                [s for t, _, _, s in sl if t == tz], axis=1
            )
            res = res + jnp.dot(
                chunk, wp[tz * kc:(tz + 1) * kc, :],
                preferred_element_type=jnp.float32,
            )
        out[0, 0] = res.astype(out.dtype)
    elif mode in ("wide_panel", "wide_tz_dots"):
        # Copies widened to 64/128 lanes at 64-aligned offsets; the px
        # (and extra py) restrictions would move into zero weight rows.
        base = N._row_pad(w2)
        qx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % w2
        mask_hi = qx < (w2 - 1)
        mask_lo = qx > 0
        groups = [
            (0, 0, 0, 128), (0, -1, 0, 128), (0, 1, 0, 128),
            (-1, 0, 64, 64), (1, 0, 0, 64),
            (-1, -1, 64, 64), (-1, 1, 64, 64),
            (1, -1, 0, 64), (1, 1, 0, 64),
        ]
        kc = 24 * 32  # K rows per tz in this scheme
        if mode == "wide_panel":
            col = 0
            for tz in range(3):
                xr = xrefs[tz]
                for dy, dx, lane0, width in groups:
                    r0 = base + dy * w2 + dx
                    s = xr[0, 0, r0:r0 + m, lane0:lane0 + width]
                    if dx == 1:
                        s = jnp.where(mask_hi, s, 0)
                    elif dx == -1:
                        s = jnp.where(mask_lo, s, 0)
                    acc[:, col:col + width] = s
                    col += width
            out[0, 0] = jnp.dot(
                acc[:, :3 * kc], wp[:3 * kc, :],
                preferred_element_type=jnp.float32,
            ).astype(out.dtype)
        else:
            res = jnp.zeros((m, out.shape[-1]), jnp.float32)
            for tz in range(3):
                xr = xrefs[tz]
                col = tz * kc
                for dy, dx, lane0, width in groups:
                    r0 = base + dy * w2 + dx
                    s = xr[0, 0, r0:r0 + m, lane0:lane0 + width]
                    if dx == 1:
                        s = jnp.where(mask_hi, s, 0)
                    elif dx == -1:
                        s = jnp.where(mask_lo, s, 0)
                    acc[:, col:col + width] = s
                    col += width
                res = res + jnp.dot(
                    acc[:, tz * kc:(tz + 1) * kc],
                    wp[tz * kc:(tz + 1) * kc, :],
                    preferred_element_type=jnp.float32,
                )
            out[0, 0] = res.astype(out.dtype)
    elif mode == "direct_dots":
        sl = _slices(h2, w2, cin_splits, xrefs)
        res = jnp.zeros((m, out.shape[-1]), jnp.float32)
        for _tz, row, width, seg_data in sl:
            res = res + jnp.dot(
                seg_data, wp[row:row + width, :],
                preferred_element_type=jnp.float32,
            )
        out[0, 0] = res.astype(out.dtype)


def bench(b, d, h, w, c, mode):
    h2, w2 = h // 2, w // 2
    m = h2 * w2
    k = 72 * c if mode.startswith("wide") else N._k_dim((c,))
    lo = 4 * c
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.normal(0, 0.3, (b, d, m, 4 * c)), jnp.bfloat16)
    wp = jnp.asarray(rng.normal(0, 0.01, (k, lo)), jnp.bfloat16)
    xp = N._pad_blocked(xb, w2)
    rp = m + 2 * N._row_pad(w2)
    specs = [
        pl.BlockSpec((1, 1, rp, 4 * c),
                     (lambda bi, zi, _v=v: (bi, zi + _v, 0, 0)),
                     memory_space=pltpu.VMEM)
        for v in range(3)
    ]
    call = pl.pallas_call(
        functools.partial(variant_kernel, h2, w2, (c,), mode),
        out_shape=jax.ShapeDtypeStruct((b, d, m, lo), jnp.bfloat16),
        grid=(b, d),
        in_specs=specs + [pl.BlockSpec((k, lo), lambda bi, zi: (0, 0),
                                       memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, m, lo),
                               lambda bi, zi: (bi, zi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((m, k), jnp.bfloat16)],
    )

    k3 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, c, c)), jnp.bfloat16)
    pack = N._pack_weights_fn((c,), c)

    @jax.jit
    def run(xb):
        # Feed the output back so the loop body cannot be hoisted;
        # includes the per-conv z/row pad, like the real fwd path.
        def body(_, z):
            zp = N._pad_blocked(z, w2)
            return call(zp, zp, zp, wp)
        z = jax.lax.fori_loop(0, REPS, body, xb)
        return jnp.sum(z[0, 0, 0, :8].astype(jnp.float32))

    @jax.jit
    def run_repack(xb):
        def body(_, z):
            zp = N._pad_blocked(z, w2)
            return call(zp, zp, zp, pack(k3).astype(jnp.bfloat16))
        z = jax.lax.fori_loop(0, REPS, body, xb)
        return jnp.sum(z[0, 0, 0, :8].astype(jnp.float32))

    t = timed(run, xb) / REPS
    if mode == "full":
        tr = timed(run_repack, xb) / REPS
        print(f"   repack-per-iter adds {(tr - t)*1e3:6.2f} ms")
    gflop = 2 * m * k * lo * b * d / 1e9
    print(f"{mode:14s} {t*1e3:7.2f} ms  (gemm would be {gflop:.0f} GFLOP"
          f" -> {gflop/t/1e3:5.1f} TF/s)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    import sys as _s
    modes = _s.argv[1:] or (
        "full", "concat_panel", "per_tz_dots", "direct_dots")
    for mode in modes:
        bench(32, 64, 64, 64, 32, mode)
