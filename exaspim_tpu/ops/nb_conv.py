"""Natural-phase blocked 3³ conv: blocked layout in, blocked layout out.

The second-generation MXU conv kernel (successor to
``ops/pallas_conv.py``). The UNet's FLOP mass sits in 3³ convs with
32-64 channels where XLA's conv emitter runs the MXU at 1/4-1/2 width
(it contracts K=C_in and emits N=C_out lanes). Folding the 2×2 y/x
spatial parities into lanes gives 4·C ≥ 128 lanes — but the round-1
kernel (`blocked_conv3d`) paid an XLA pack/unpack relayout *per conv*
(~25 ms/DoubleConv, transposes run far off HBM bandwidth on TPU), which
ate the GEMM win.

This kernel removes the boundary entirely by making the **blocked
tensor the resident activation layout**:

* layout ``(B, D, h2·w2, 4C)``, rows ``gy·w2 + qx``, lanes
  ``(py, px, c)`` — *natural phase*: block ``(gy, qx)`` holds pixels
  ``(2gy+py, 2qx+px)``. Input and output use the same convention, so
  convs (and GroupNorm / LeakyReLU / pooling, see ``unet3d.py``)
  compose without relayouts.
* the im2col panel is built in VMEM from 27 *static* slices (sublane
  shifts of ±1/±w2; 64/128-lane-aligned widths only). The ``Δq_y``
  parity restriction is applied by copying lane halves (``Δq_y=-1``
  only contributes via ``p_y=1``); the ``Δq_x`` restrictions are left
  as zero rows in the packed weights. ``K = 72·C`` (72/27 ≈ 2.67×
  FLOP inflation) — measured faster than the minimal ``K = 48·C``
  panel, whose 32-lane unaligned stores cost ~3× more than the extra
  MXU rows save (scripts/nb_diag.py: 15 ms vs 22 ms; XLA conv 29 ms).
* y out-of-range taps land in the RESIDENT zero halo rows (the blocked
  layout carries its row halo; producers keep it zero, so no per-conv
  pad copy is ever materialized — round-2e); x out-of-range taps are
  masked in-kernel (the ±1 row shift wraps across ``g_y`` boundaries);
  z taps are clamped BlockSpec views of the unpadded tensor whose dots
  are scaled by an in-kernel validity flag at the two z boundaries.
* concat-style inputs (decoder skip connections) are supported without
  materializing a re-ordered concat: ``cin_splits`` describes the lane
  segmentation ``[(py,px,c_a) | (py,px,c_b)]`` and both the panel build
  and the weight packing address segments directly.

Training: ``dL/dx`` is the same kernel with spatially flipped,
channel-transposed weights (the layout is self-adjoint); ``dL/dW`` is a
second Pallas kernel that rebuilds the panel and accumulates
``panelᵀ @ g`` in f32 across the grid, then folds the packed gradient
back onto the 3³ taps (the packing is linear, so its transpose is a sum
of slices).

Numerics: f32 accumulation (``preferred_element_type``), output cast to
the input dtype — exactly ``lax.conv_general_dilated(..., "SAME")``
with no bias, checked to tolerance by tests/test_nb_conv.py.

Reference context: replaces the hot path of the reference's torch/cuDNN
convs (reference unet3d.py:137-208); layout decisions per
/opt/skills/guides/pallas_guide.md (MXU 128-lane tiling, Mosaic slice
constraints).
"""

from __future__ import annotations

import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "Blocked",
    "to_blocked",
    "from_blocked",
    "zero_row_halos",
    "nb_conv3d",
    "nb_conv3d_stats",
    "supports_nb_conv",
    "nb_conv_vmem_ok",
]

# Tap groups per z-slab: (Δq_y, Δq_x, p_y half copied).
# Δq_y=-1 only reaches taps via p_y=1 (the upper half of the lane dim)
# and Δq_y=+1 only via p_y=0, so those copies are 2C-wide halves; all
# Δq_x restrictions are left to zero rows in the packed weights so that
# every VMEM copy is a 64/128-lane-aligned slice — narrow unaligned
# stores cost ~3x more than the extra MXU rows they save (measured,
# scripts/nb_diag.py: K=48C narrow panel 22 ms vs K=72C wide 15 ms).
_GROUPS = (
    (0, 0, None), (0, -1, None), (0, 1, None),
    (-1, 0, 1), (1, 0, 0),
    (-1, -1, 1), (-1, 1, 1), (1, -1, 0), (1, 1, 0),
)


@jax.tree_util.register_pytree_node_class
class Blocked:
    """A natural-phase blocked activation: ``data`` is (B, D, rp, 4C)
    with lanes (p_y, p_x, c) and ``rp = h/2·w/2 + 2·row_pad`` — the
    row-shift halo is RESIDENT (halo rows are zero) so convs read it
    directly instead of re-materializing a padded copy per call (a
    ~2 ms full-tensor HBM round trip each, measured round 2d).
    ``h``/``w`` are the unblocked y/x extents (static). Passed between
    model layers so a whole stage runs without layout round-trips — a
    512 MB relayout costs ~12 ms on this chip, which is the entire
    kernel win (measured, scripts/step_bench.py).
    """

    __slots__ = ("data", "h", "w")

    def __init__(self, data, h, w):
        self.data = data
        self.h = int(h)
        self.w = int(w)

    @property
    def channels(self):
        return self.data.shape[-1] // 4

    @property
    def m(self):
        """Interior rows: h/2 · w/2."""
        return (self.h // 2) * (self.w // 2)

    @property
    def base(self):
        """Halo rows per side."""
        return _row_pad(self.w // 2)

    def interior(self):
        """The (B, D, m, 4C) interior view (halo rows stripped)."""
        return self.data[:, :, self.base:self.base + self.m, :]

    def map(self, fn):
        """Apply an elementwise function in blocked layout.

        ``fn`` must map zero to zero (LeakyReLU, scaling, …) so the
        resident halo rows stay zero; affine ops (bias adds) must
        re-zero the halos afterwards (see ``zero_row_halos``).
        """
        return Blocked(fn(self.data), self.h, self.w)

    def unblock(self):
        return from_blocked(self.interior(), self.h, self.w)

    @classmethod
    def block(cls, x):
        h, w = x.shape[2], x.shape[3]
        p = _row_pad(w // 2)
        data = jnp.pad(to_blocked(x), ((0, 0), (0, 0), (p, p), (0, 0)))
        return cls(data, h, w)

    def tree_flatten(self):
        return (self.data,), (self.h, self.w)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def to_blocked(x):
    """(B, D, H, W, C) → (B, D, H/2·W/2, 4C), lanes (p_y, p_x, c)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, d, (h // 2) * (w // 2), 4 * c)


def from_blocked(xb, h, w):
    """Inverse of :func:`to_blocked`."""
    b, d, m, l4 = xb.shape
    c = l4 // 4
    xb = xb.reshape(b, d, h // 2, w // 2, 2, 2, c)
    xb = xb.transpose(0, 1, 2, 4, 3, 5, 6)
    return xb.reshape(b, d, h, w, c)


def zero_row_halos(data, w2):
    """Zero the resident halo rows of a (B, D, rp, L) blocked tensor.

    Elementwise (same shape), so XLA fuses it into the producer — unlike
    ``jnp.pad``, which materializes a copy. Used where an affine op put
    non-zeros into the halo (GroupNorm bias) and on cotangents entering
    the conv VJP (the conv's halo outputs are constant zeros, so their
    cotangents must not leak into the transpose operator's shifts).
    """
    rp = data.shape[2]
    base = _row_pad(w2)
    m = rp - 2 * base
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rp, 1), 2)
    return jnp.where((idx >= base) & (idx < base + m), data, 0)


def supports_nb_conv(h, w, cin_splits):
    """Kernel eligibility: 16-aligned y/x and either 32-multiple channel
    segments (wide lane-sliced panel) or a single tiny-channel input
    (full-group panel — covers the network's 1-channel entry conv, so a
    64³ stage never materializes an unblocked activation)."""
    ok_c = all(c % 32 == 0 for c in cin_splits) or (
        len(cin_splits) == 1 and cin_splits[0] < 32
    )
    return (
        h % 16 == 0
        and w % 16 == 0
        and ok_c
        and (h // 2) * (w // 2) >= 256
    )


def _small_mode(cin_splits):
    return len(cin_splits) == 1 and cin_splits[0] % 32 != 0


def _row_pad(w2):
    """Pad rows per side: covers shifts up to w2+1, 8-row aligned."""
    return w2 + 8


def _groups_for(cin_splits):
    """Tap groups: the wide lane-sliced scheme for 32-multiple channels;
    for a tiny single segment (e.g. the 1-channel entry conv) every
    group copies all four parities — lane slicing at sub-32 offsets is
    not worth it and the FLOP inflation is irrelevant at c < 32."""
    if _small_mode(cin_splits):
        return tuple(
            (dy, dx, None) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        )
    return _GROUPS


def _iter_rows(cin_splits):
    """Yield (tz, dy, dx, parities, seg, lane0, width, k_row) in panel
    order.

    ``lane0``/``width`` address the input lane slice *within its segment
    tensor* — always a 64/128-lane-aligned (p_y, p_x, c) run;
    ``parities`` lists the (p_y, p_x) pairs it contains, in lane order;
    ``k_row`` is the panel/packed-weight row offset.
    """
    row = 0
    for tz in range(3):
        for dy, dx, py_half in _groups_for(cin_splits):
            for seg, c in enumerate(cin_splits):
                if py_half is None:
                    lane0, width = 0, 4 * c
                    pars = [(0, 0), (0, 1), (1, 0), (1, 1)]
                else:
                    lane0, width = py_half * 2 * c, 2 * c
                    pars = [(py_half, 0), (py_half, 1)]
                yield tz, dy, dx, pars, seg, lane0, width, row
                row += width


def _k_dim(cin_splits):
    if _small_mode(cin_splits):
        return 108 * cin_splits[0]
    return 72 * sum(cin_splits)


def _n_chunks(cin_splits):
    """Panel chunks: (tz, Δq_y class) for the wide scheme (VMEM bound),
    one chunk per tz in small mode (tiny panels)."""
    return 3 if _small_mode(cin_splits) else 6


@functools.lru_cache(maxsize=64)
def _pack_weights_fn(cin_splits, cout):
    """jit-compiled (3,3,3,Σcin,cout) → (48·Σcin, 4·cout) packer."""
    csum = [0]
    for c in cin_splits:
        csum.append(csum[-1] + c)

    def pack(k3):
        wp = jnp.zeros((_k_dim(cin_splits), 4 * cout), k3.dtype)
        for tz, dy, dx, pars, seg, _l0, _w, row in _iter_rows(cin_splits):
            c = cin_splits[seg]
            ci0 = csum[seg]
            for j, (py, px) in enumerate(pars):
                r0 = row + j * c
                for ry in range(2):
                    ty = 2 * dy + py - ry
                    if not -1 <= ty <= 1:
                        continue
                    for rx in range(2):
                        tx = 2 * dx + px - rx
                        if not -1 <= tx <= 1:
                            continue
                        col = (ry * 2 + rx) * cout
                        wp = wp.at[r0:r0 + c, col:col + cout].set(
                            k3[tz, ty + 1, tx + 1, ci0:ci0 + c]
                        )
        return wp

    return jax.jit(pack)


@functools.lru_cache(maxsize=64)
def _unpack_wgrad_fn(cin_splits, cout):
    """jit-compiled transpose of the packer: (48·Σcin, 4·cout) → taps."""
    csum = [0]
    for c in cin_splits:
        csum.append(csum[-1] + c)
    cin = csum[-1]

    def unpack(dwp):
        dk = jnp.zeros((3, 3, 3, cin, cout), dwp.dtype)
        for tz, dy, dx, pars, seg, _l0, _w, row in _iter_rows(cin_splits):
            c = cin_splits[seg]
            ci0 = csum[seg]
            for j, (py, px) in enumerate(pars):
                r0 = row + j * c
                for ry in range(2):
                    ty = 2 * dy + py - ry
                    if not -1 <= ty <= 1:
                        continue
                    for rx in range(2):
                        tx = 2 * dx + px - rx
                        if not -1 <= tx <= 1:
                            continue
                        col = (ry * 2 + rx) * cout
                        dk = dk.at[tz, ty + 1, tx + 1, ci0:ci0 + c].add(
                            dwp[r0:r0 + c, col:col + cout]
                        )
        return dk

    return jax.jit(unpack)


def _build_panel_chunk(h2, w2, cin_splits, chunk, xrefs, acc):
    """Fill one im2col chunk: z-tap ``chunk // (n/3)``; in the wide
    scheme each tz splits further into the Δq_y=0 full-width groups and
    the Δq_y=±1 half-width groups (``_GROUPS`` lays K out in exactly
    this order).

    Chunking keeps the VMEM scratch at K/6 rows: a full K=72·64 panel
    plus double-buffered operands blows the 16 MB VMEM budget, and the
    chunked dots cost nothing extra (scripts/nb_diag.py: wide_tz_dots ≈
    wide_panel).
    """
    m = h2 * w2
    base = _row_pad(w2)
    kc = _k_dim(cin_splits) // _n_chunks(cin_splits)
    tz = chunk // (_n_chunks(cin_splits) // 3)
    lo_row, hi_row = chunk * kc, (chunk + 1) * kc
    qx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0) % w2
    mask_hi = qx < (w2 - 1)  # Δq_x = +1 valid
    mask_lo = qx > 0         # Δq_x = -1 valid
    n_seg = len(cin_splits)
    for tz_i, dy, dx, _pars, seg, lane0, width, row in _iter_rows(
        cin_splits
    ):
        if tz_i != tz or not lo_row <= row < hi_row:
            continue
        xr = xrefs[tz * n_seg + seg]
        r0 = base + dy * w2 + dx
        seg_data = xr[0, 0, r0:r0 + m, lane0:lane0 + width]
        if dx == 1:
            seg_data = jnp.where(mask_hi, seg_data, 0)
        elif dx == -1:
            seg_data = jnp.where(mask_lo, seg_data, 0)
        acc[:, row - lo_row:row - lo_row + width] = seg_data


def _fwd_kernel(h2, w2, cin_splits, zb, d, with_stats, *refs):
    """Slab-major forward: each input slab's im2col panel is built ONCE
    and contracted against the three z-tap weight sections, accumulating
    into the (up to three) output slices it influences — vs the naive
    output-major order that rebuilds shared slab panels per output slice
    (zb·3 builds per step instead of zb+2). Panel builds are the kernel's
    VMEM-copy bound; the dot FLOPs are identical.

    The input is UNPADDED in z: view ``v``'s global slab is
    ``zi·zb + v − 1`` (clamped in the BlockSpec index map), and every
    dot is scaled by that view's validity — boundary taps vanish
    without a host-side pad copy. Rows arrive halo-resident (rp rows,
    zero halos); the output is written halo-resident too.

    ``with_stats``: additionally emit per-lane Σy and Σy² of the
    interior output rows (reduced over rows while the slab is still in
    VMEM/registers), accumulated across the z grid into a tiny
    (1, 8, lanes) f32 block per batch element — rows 0/1 hold Σy/Σy².
    This is the GroupNorm stats-fusion epilogue: the normalization
    layer downstream then skips its own full-tensor HBM read pass
    (~1.4 ms per pass on the 64³ stages). Stats are computed from the
    dtype-rounded output so fused and unfused GroupNorm see bitwise
    identical statistics.
    """
    if with_stats:
        *xrefs, wp, out, sref, racc, acc = refs
    else:
        *xrefs, wp, out, racc, acc = refs
    m = h2 * w2
    base = _row_pad(w2)
    zi = pl.program_id(1)
    n_seg = len(cin_splits)
    nch = _n_chunks(cin_splits)
    nch3 = nch // 3
    k3 = _k_dim(cin_splits) // 3
    kc = _k_dim(cin_splits) // nch
    for v in range(zb + 2):
        # Views are laid out [v0_seg0, v0_seg1, …, v1_seg0, …]; output
        # slice zoff reads views zoff..zoff+2 (z-tap tz = v − zoff).
        views = xrefs[v * n_seg:(v + 1) * n_seg]
        z_src = zi * zb + v - 1
        vf = ((z_src >= 0) & (z_src < d)).astype(jnp.float32)
        for cls in range(nch3):
            _build_panel_chunk(h2, w2, cin_splits, cls, views, acc)
            for tz in range(3):
                zoff = v - tz
                if not 0 <= zoff < zb:
                    continue
                r0 = tz * k3 + cls * kc
                part = vf * jnp.dot(
                    acc[...], wp[r0:r0 + kc, :],
                    preferred_element_type=jnp.float32,
                )
                if tz == 0 and cls == 0:  # first contribution to zoff
                    racc[zoff] = part
                else:
                    racc[zoff] = racc[zoff] + part
                if tz == 2 and cls == nch3 - 1:  # last contribution
                    qc = racc[zoff].astype(out.dtype)
                    out[0, zoff, base:base + m] = qc
                    if with_stats:
                        qf = qc.astype(jnp.float32)
                        p1 = jnp.sum(qf, axis=0, keepdims=True)
                        p2 = jnp.sum(qf * qf, axis=0, keepdims=True)
                        if zoff == 0:
                            # First completed slab of this grid step.
                            @pl.when(zi == 0)
                            def _(p1=p1, p2=p2):
                                sref[0, 0:1] = p1
                                sref[0, 1:2] = p2

                            @pl.when(zi != 0)
                            def _(p1=p1, p2=p2):
                                sref[0, 0:1] = sref[0, 0:1] + p1
                                sref[0, 1:2] = sref[0, 1:2] + p2
                        else:
                            sref[0, 0:1] = sref[0, 0:1] + p1
                            sref[0, 1:2] = sref[0, 1:2] + p2
                    if v == zb + 1 and zoff == zb - 1:
                        # Once per grid step: zero the resident halos.
                        lo = out.shape[-1]
                        for z2 in range(zb):
                            out[0, z2, :base] = jnp.zeros(
                                (base, lo), out.dtype
                            )
                            out[0, z2, base + m:] = jnp.zeros(
                                (base, lo), out.dtype
                            )


def _dw_kernel(h2, w2, cin_splits, zb, d, *refs):
    """Rolling-z dL/dW: each grid step owns ``zb`` INPUT slabs; a slab's
    im2col panel is built ONCE and contracted against the three output-z
    gradient slabs it influences (``dwp[tz] = Σ_s panel(x[s])ᵀ g[s+1−tz]``,
    the z-transpose of the forward). The naive per-output-z layout
    rebuilds every panel three times — panel builds are the VMEM-copy
    bound of this kernel, so sharing them is the whole win; the dot FLOPs
    are identical (each tz section only contracts its own slab rows).

    ``g`` arrives UNPADDED in z: its views are clamped in the BlockSpec
    index map and each dot is scaled by the view's validity, so
    boundary taps vanish without a host-side pad copy. Both ``x`` and
    ``g`` rows arrive halo-resident (rp rows); the panel builds read
    the x halos, the g dots use the interior rows only.
    """
    *refs_in, dwp, acc = refs
    m = h2 * w2
    base = _row_pad(w2)
    zi = pl.program_id(1)
    n_seg = len(cin_splits)
    xrefs = refs_in[:zb * n_seg]
    grefs = refs_in[zb * n_seg:]
    k3 = _k_dim(cin_splits) // 3
    nch = _n_chunks(cin_splits) // 3
    kc = k3 // nch
    first = (pl.program_id(0) == 0) & (zi == 0)
    for zoff in range(zb):
        views = xrefs[zoff * n_seg:(zoff + 1) * n_seg]
        for chunk in range(nch):
            # tz=0 chunks address exactly rows [chunk·kc, (chunk+1)·kc)
            # built from views[seg] — the per-slab panel section.
            _build_panel_chunk(h2, w2, cin_splits, chunk, views, acc)
            for tz in range(3):
                gv = zoff + 2 - tz
                g_src = zi * zb + gv - 1
                vf = ((g_src >= 0) & (g_src < d)).astype(jnp.float32)
                part = vf * jax.lax.dot_general(
                    acc[...], grefs[gv][0, 0, base:base + m, :],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                r0 = tz * k3 + chunk * kc
                init = first & (zoff == 0)

                @pl.when(init)
                def _(r0=r0, part=part):
                    dwp[r0:r0 + kc, :] = part

                @pl.when(jnp.logical_not(init))
                def _(r0=r0, part=part):
                    dwp[r0:r0 + kc, :] = dwp[r0:r0 + kc, :] + part


def _interior(xb, w2):
    """Strip the resident halo rows of a raw (B, D, rp, L) tensor."""
    base = _row_pad(w2)
    return xb[:, :, base:xb.shape[2] - base, :]


def _vmem_bytes(zb, m, w2, cin_splits, cout, isz, for_dw):
    """Estimated VMEM footprint of one grid step.

    Streamed input/output blocks are counted twice (Mosaic
    double-buffers them across grid steps; the dw packed-gradient
    output is constant-index but counted twice anyway, erring
    conservative); the packed-weight block and scratch count once.
    The estimate still undercounts Mosaic's true scoped allocation (the
    compiler reported 17.56 MiB for a config this formula puts at
    11.47 MiB — extra stack copies the formula cannot see), which is
    why callers compare against the derated ``_EST_BUDGET`` rather
    than the ``_VMEM_REQUEST`` actually granted to the kernel."""
    def lanes(n):
        # VMEM blocks tile the minor dim to 128 lanes — a 4-lane view
        # (1-channel entry conv) still occupies 128 lanes per row.
        return -(-n // 128) * 128

    rp = m + 2 * _row_pad(w2)
    k = _k_dim(cin_splits)
    lo = lanes(4 * cout)
    views_per = sum(rp * lanes(4 * c) * isz for c in cin_splits)
    panel = m * lanes(k // _n_chunks(cin_splits)) * isz
    if for_dw:
        return (
            2 * zb * views_per          # x slab views
            + 2 * (zb + 2) * rp * lo * isz  # gradient slab views
            + 2 * k * lo * 4            # f32 packed-gradient output
            + panel
        )
    return (
        2 * (zb + 2) * views_per        # input z views
        + k * lo * isz                  # packed weights (constant map)
        + 2 * zb * rp * lo * isz        # output block (halo-resident)
        + zb * m * lo * 4               # f32 row accumulator scratch
        + panel
    )


# Mosaic's default scoped-VMEM limit is 16 MiB; v5e has 128 MiB of
# physical VMEM, so the kernels request a 100 MiB budget via
# ``CompilerParams(vmem_limit_bytes=...)`` and large-plane configs pick
# their z-block against a 40 MiB *estimated* budget. The estimate
# undercounts the compiler's true scoped allocation by a config-
# dependent 1.5–2.1× (two compiler reports: 17.56 MiB actual vs
# 11.47 MiB estimated at zb=2, 16.18 vs 8.04 at zb=1 on 96² planes), so
# 40 MiB estimated stays safely under the 100 MiB request. 64² planes
# with ≤32 channels skip the estimate entirely: their z-blocks were
# hand-tuned on the real chip (round 2b/2d).
_VMEM_REQUEST = 100 * 2**20
_EST_BUDGET = 40 * 2**20


def _compiler_params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_REQUEST)


def _fits(zb, m, w2, cin_splits, cout, isz, for_dw):
    est = _vmem_bytes(zb, m, w2, cin_splits, cout, isz, for_dw)
    return est <= _EST_BUDGET


def _validated_config(m, cin_splits, cout, isz):
    """64² planes / ≤32 channels / ≤bf16 — measured on the real chip
    (round 2b/2d); these skip the VMEM estimate."""
    return (m <= 1024 and isz <= 2 and cout <= 32
            and max(cin_splits) <= 32)


def nb_conv_vmem_ok(h, w, cin_splits, cout, isz=2):
    """True when every kernel the conv may trace fits VMEM — the
    trace-time gate large-plane callers (patch ≥ 96) must pass before
    dispatching to the blocked path.

    Checks the forward AND its dL/dx program (the same kernel with
    channels transposed, ``cout → Σcin`` — a wider ``cout`` makes dx
    the larger footprint); dL/dW is not checked here because
    ``_vjp_bwd`` falls back to the XLA contraction on its own when the
    dw kernel cannot fit.
    """
    m = (h // 2) * (w // 2)
    w2 = w // 2
    cin_splits = tuple(cin_splits)
    if _validated_config(m, cin_splits, cout, isz):
        return True
    return (
        _fits(1, m, w2, cin_splits, cout, isz, for_dw=False)
        and _fits(1, m, w2, (cout,), sum(cin_splits), isz, for_dw=False)
    )


def _dw_vmem_ok(d, m, w2, cin_splits, cout, isz):
    """True when the Pallas dL/dW kernel has a fitting z-block."""
    if _validated_config(m, cin_splits, cout, isz):
        return True
    return any(
        d % zb == 0 and _fits(zb, m, w2, cin_splits, cout, isz, True)
        for zb in (4, 2, 1)
    )


def _z_block(d, cin_splits, cout, m, w2, isz, for_dw=False,
             interpret=False):
    """Output z-slices per grid step. Amortizes the ~6 µs fixed cost of
    a Pallas grid step (measured: a 2048-step conv pays ~12 ms of pure
    step overhead) and cuts the z-halo re-reads from 3× to (zb+2)/zb.

    The configs validated on the real chip — 64² planes, ≤32 channels,
    bf16 (round 2b/2d) — keep their hand-tuned z-blocks (fwd 4; dw 4,
    or 2 for two-segment convs); interpret mode (tests, no VMEM limit)
    uses the same caps. Anything else (patch ≥ 96 inference, wider
    channels) backs off via the calibrated VMEM estimate so the kernel
    fits Mosaic's 16 MiB scoped limit."""
    if _validated_config(m, cin_splits, cout, isz) or interpret:
        cap = (2 if len(cin_splits) > 1 else 4) if for_dw else 4
        for zb in (cap, 2, 1):
            if d % zb == 0:
                return zb
        return 1
    for zb in (4, 2, 1):
        if d % zb:
            continue
        if _fits(zb, m, w2, cin_splits, cout, isz, for_dw):
            return zb
    raise ValueError(
        f"no z-block fits VMEM for m={m} cin={cin_splits} cout={cout}; "
        "gate callers with nb_conv_vmem_ok"
    )


def _x_specs(m, w2, lanes_per_seg, n_seg, zb, d):
    """zb+2 single-slab z-views per input segment; the source slab
    index ``zi·zb + v − 1`` is clamped into range (the kernel scales
    out-of-range views' dots to zero)."""
    rp = m + 2 * _row_pad(w2)
    specs = []
    for v in range(zb + 2):
        for s in range(n_seg):
            specs.append(
                pl.BlockSpec(
                    (1, 1, rp, lanes_per_seg[s]),
                    (lambda bi, zi, _v=v, _zb=zb: (
                        bi, jnp.clip(zi * _zb + _v - 1, 0, d - 1), 0, 0
                    )),
                    memory_space=pltpu.VMEM,
                )
            )
    return specs


def _grid_call(kernel, h2, w2, cin_splits, xbs, tail_in, out_shape,
               out_spec, acc_dtype, interpret, zb, with_stats=False):
    b, d = xbs[0].shape[0], xbs[0].shape[1]
    m = h2 * w2
    k = _k_dim(cin_splits)
    n_seg = len(xbs)
    lanes = [4 * c for c in cin_splits]
    lo = out_shape.shape[-1]
    # z-views, v-major / segment-minor (matches the kernels' lookup).
    ins = []
    for _v in range(zb + 2):
        ins.extend(xbs)
    out_shapes, out_specs = out_shape, out_spec
    if with_stats:
        out_shapes = (out_shape,
                      jax.ShapeDtypeStruct((b, 8, lo), jnp.float32))
        out_specs = (out_spec, pl.BlockSpec(
            (1, 8, lo), lambda bi, zi: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ))
    return pl.pallas_call(
        functools.partial(kernel, h2, w2, cin_splits, zb, d, with_stats),
        out_shape=out_shapes,
        grid=(b, d // zb),
        in_specs=_x_specs(m, w2, lanes, n_seg, zb, d) + [tail_in[0]],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((zb, m, lo), jnp.float32),
            pltpu.VMEM((m, k // _n_chunks(cin_splits)), acc_dtype),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*ins, tail_in[1])


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "cin_splits", "interpret", "with_stats"),
)
def _nb_conv_fwd(xs, k3, h, w, cin_splits, interpret=False,
                 with_stats=False):
    h2, w2 = h // 2, w // 2
    m = h2 * w2
    rp = m + 2 * _row_pad(w2)
    b, d = xs[0].shape[0], xs[0].shape[1]
    cout = k3.shape[-1]
    lo = 4 * cout
    k = _k_dim(cin_splits)
    dt = xs[0].dtype
    zb = _z_block(d, cin_splits, cout, m, w2, dt.itemsize,
                  interpret=interpret)
    wp = _pack_weights_fn(cin_splits, cout)(k3).astype(dt)
    wspec = pl.BlockSpec((k, lo), lambda bi, zi: (0, 0),
                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, zb, rp, lo), lambda bi, zi: (bi, zi, 0, 0),
                            memory_space=pltpu.VMEM)
    res = _grid_call(
        _fwd_kernel, h2, w2, cin_splits, xs, (wspec, wp),
        jax.ShapeDtypeStruct((b, d, rp, lo), dt), out_spec, dt, interpret,
        zb, with_stats=with_stats,
    )
    if not with_stats:
        return res
    out, sraw = res
    return out, sraw[:, 0, :], sraw[:, 1, :]


@functools.partial(
    jax.jit, static_argnames=("h", "w", "cin_splits", "interpret")
)
def _nb_conv_dw(xs, g, h, w, cin_splits, interpret=False):
    h2, w2 = h // 2, w // 2
    m = h2 * w2
    rp = m + 2 * _row_pad(w2)
    cout = g.shape[-1] // 4
    lo = 4 * cout
    k = _k_dim(cin_splits)
    dt = xs[0].dtype
    b, d = xs[0].shape[0], xs[0].shape[1]
    zb = _z_block(d, cin_splits, cout, m, w2, dt.itemsize, for_dw=True,
                  interpret=interpret)
    n_seg = len(cin_splits)
    # x slab views are in-range by construction (rolling layout, panels
    # never cross z); g views are clamped and their dots scaled by
    # validity in-kernel, so no host-side pad copies are needed.
    gd = g.astype(dt)
    in_specs, ins = [], []
    for v in range(zb):
        for s in range(n_seg):
            in_specs.append(pl.BlockSpec(
                (1, 1, rp, 4 * cin_splits[s]),
                (lambda bi, zi, _v=v, _zb=zb: (bi, zi * _zb + _v, 0, 0)),
                memory_space=pltpu.VMEM,
            ))
            ins.append(xs[s])
    for v in range(zb + 2):
        in_specs.append(pl.BlockSpec(
            (1, 1, rp, lo),
            (lambda bi, zi, _v=v, _zb=zb: (
                bi, jnp.clip(zi * _zb + _v - 1, 0, d - 1), 0, 0
            )),
            memory_space=pltpu.VMEM,
        ))
        ins.append(gd)
    dwp = pl.pallas_call(
        functools.partial(_dw_kernel, h2, w2, cin_splits, zb, d),
        out_shape=jax.ShapeDtypeStruct((k, lo), jnp.float32),
        grid=(b, d // zb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((k, lo), lambda bi, zi: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((m, k // _n_chunks(cin_splits)), dt)
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*ins)
    return _unpack_wgrad_fn(cin_splits, cout)(dwp)


def nb_conv3d(xs, k3, h, w, cin_splits, interpret=False):
    """3³ SAME conv (no bias) in natural-phase blocked layout.

    Accepts halo-resident ``(B, D, rp, 4c)`` tensors (``Blocked.data``,
    the zero-copy hot path) or bare ``(B, D, h/2·w/2, 4c)`` blocked
    tensors (convenience; padded here, and the output is returned
    bare to match). See :func:`_nb_conv3d_core` for the layout contract.
    """
    m = (h // 2) * (w // 2)
    if xs[0].shape[2] == m:  # bare m-row inputs → pad, slice back
        p = _row_pad(w // 2)
        xs = tuple(
            jnp.pad(xb, ((0, 0), (0, 0), (p, p), (0, 0))) for xb in xs
        )
        return _interior(
            _nb_conv3d_core(xs, k3, h, w, cin_splits, interpret), w // 2
        )
    return _nb_conv3d_core(xs, k3, h, w, cin_splits, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _nb_conv3d_core(xs, k3, h, w, cin_splits, interpret=False):
    """3³ SAME conv (no bias) in natural-phase blocked layout.

    Args:
      xs: tuple of halo-resident blocked tensors ``(B, D, rp, 4·c_i)``
        with ``rp = h/2·w/2 + 2·(w/2+8)`` and ZERO halo rows
        (``Blocked.data`` — more than one element expresses a channel
        concat without relayout).
      k3: ``(3, 3, 3, Σc_i, cout)`` taps (DHWIO, the lax convention).
      h, w: the unblocked y/x extent (static).
      cin_splits: static tuple of the per-tensor channel counts.

    Returns the halo-resident blocked output ``(B, D, rp, 4·cout)``
    (zero halos) whose interior equals
    ``to_blocked(lax.conv_general_dilated(from_blocked(x), k3, "SAME"))``.
    """
    return _nb_conv_fwd(xs, k3, h, w, cin_splits, interpret)


def _vjp_fwd(xs, k3, h, w, cin_splits, interpret):
    return _nb_conv_fwd(xs, k3, h, w, cin_splits, interpret), (xs, k3)


def _dw_xla(xs, g, k3, h, w, cin_splits):
    """dL/dW via XLA's conv-gradient contraction on unblocked tensors.

    Fallback path (``EXASPIM_NB_DW=xla``). Historically this won while
    the Pallas dw kernel rebuilt each slab's panel three times; the
    rolling-z dw kernel builds each panel once and now wins by ~100 ms
    per batch-32 64³ train step (the XLA path additionally pays
    ``from_blocked`` relayouts on every activation; measured
    scripts/step_bench.py: 326 ms pallas-dw vs 433 ms xla-dw).
    """
    w2 = w // 2
    xu = jnp.concatenate(
        [from_blocked(_interior(xb, w2), h, w) for xb in xs], axis=-1
    ).astype(jnp.float32)
    gu = from_blocked(_interior(g, w2), h, w).astype(jnp.float32)

    def fwd_ref(kk):
        y = jax.lax.conv_general_dilated(
            xu, kk, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.vdot(y, gu)

    return jax.grad(fwd_ref)(jnp.zeros_like(k3, jnp.float32))


def _bwd_from_g(h, w, cin_splits, interpret, xs, k3, g):
    """Shared VJP tail: halo-masked cotangent ``g`` → (dxs, dk3)."""
    import os

    cout = k3.shape[-1]
    # dL/dx: same operator, flipped taps, channels transposed. The
    # blocked layout is self-adjoint so dx comes out blocked, then is
    # split back onto the input segments.
    k3_t = jnp.flip(k3, axis=(0, 1, 2)).swapaxes(3, 4)
    dx_all = _nb_conv_fwd((g,), k3_t, h, w, (cout,), interpret)
    # dx_all lanes are (p_y, p_x, c) over the *combined* channels;
    # split back onto per-segment (p_y, p_x, c_i) lane layouts — row
    # dim stays halo-resident (rp), matching the primal x layouts.
    b, d, rp, _ = dx_all.shape
    cin = sum(cin_splits)
    dx5 = dx_all.reshape(b, d, rp, 4, cin)
    dxs = []
    o = 0
    for c in cin_splits:
        dxs.append(dx5[..., o:o + c].reshape(b, d, rp, 4 * c))
        o += c
    pallas_dw = (
        os.environ.get("EXASPIM_NB_DW", "pallas") == "pallas"
        and (interpret or _dw_vmem_ok(
            xs[0].shape[1], (h // 2) * (w // 2), w // 2,
            tuple(cin_splits), cout, xs[0].dtype.itemsize,
        ))
    )
    if pallas_dw:
        dk3 = _nb_conv_dw(xs, g, h, w, cin_splits, interpret)
    else:
        dk3 = _dw_xla(xs, g, k3, h, w, cin_splits)
    return tuple(dxs), dk3.astype(k3.dtype)


def _vjp_bwd(h, w, cin_splits, interpret, res, g):
    xs, k3 = res
    # The conv's halo-row outputs are constant zeros, so cotangents
    # arriving there (e.g. through GroupNorm's global stats) have a
    # zero Jacobian path — mask them before the transpose operator's
    # shifted reads can ingest them. Elementwise → fuses upstream.
    g = zero_row_halos(g, w // 2)
    return _bwd_from_g(h, w, cin_splits, interpret, xs, k3, g)


_nb_conv3d_core.defvjp(_vjp_fwd, _vjp_bwd)


def nb_conv3d_stats(xs, k3, h, w, cin_splits, interpret=False):
    """3³ SAME conv in blocked layout that ALSO emits per-lane output
    statistics ``(out, s1, s2)``: ``s1[b, l] = Σ out[b, :, interior, l]``
    and ``s2`` the matching Σout² (f32, computed from the dtype-rounded
    output inside the kernel epilogue, reduced while the slab is in
    VMEM).

    The consumer is GroupNorm stats fusion (models/unet3d.py): the
    normalization after each conv needs exactly these sums and
    otherwise pays a full-tensor HBM read pass to recompute them —
    ~15 ms of a 98 ms forward across the 64³ stages (RESULTS.md round
    4b xplane breakdown; reference hot path being replaced:
    reference unet3d.py:102-134/137-208).

    Differentiable: the VJP folds the stats cotangents into the output
    cotangent (``∂s1/∂y = 1``, ``∂s2/∂y = 2y``) before the shared
    transpose, so training may use the fused path too. Accepts
    halo-resident inputs only (``Blocked.data``, the production path).
    """
    m = (h // 2) * (w // 2)
    if xs[0].shape[2] == m:  # bare m-row inputs → pad, slice back
        p = _row_pad(w // 2)
        xs = tuple(
            jnp.pad(xb, ((0, 0), (0, 0), (p, p), (0, 0))) for xb in xs
        )
        out, s1, s2 = _nb_conv3d_stats_core(
            xs, k3, h, w, cin_splits, interpret
        )
        return _interior(out, w // 2), s1, s2
    return _nb_conv3d_stats_core(xs, k3, h, w, cin_splits, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _nb_conv3d_stats_core(xs, k3, h, w, cin_splits, interpret=False):
    return _nb_conv_fwd(xs, k3, h, w, cin_splits, interpret,
                        with_stats=True)


def _stats_vjp_fwd(xs, k3, h, w, cin_splits, interpret):
    out, s1, s2 = _nb_conv_fwd(xs, k3, h, w, cin_splits, interpret,
                               with_stats=True)
    # ``out`` is saved for the 2·y·ḡ_s2 term; it is the same tensor the
    # downstream GroupNorm/activation consume, so XLA shares the buffer
    # and the residual costs no extra HBM in a real training graph.
    return (out, s1, s2), (xs, k3, out)


def _stats_vjp_bwd(h, w, cin_splits, interpret, res, cots):
    xs, k3, out = res
    g_out, g_s1, g_s2 = cots
    # Fold the stats cotangents into the output cotangent:
    # ∂s1/∂y = 1 and ∂s2/∂y = 2y per interior element, broadcast over
    # lanes. The broadcast would also land in the halo rows (whose
    # primal is constant zero), so mask afterwards — zero_row_halos is
    # elementwise and fuses with the adds.
    gf = (
        g_out.astype(jnp.float32)
        + g_s1.astype(jnp.float32)[:, None, None, :]
        + 2.0 * out.astype(jnp.float32)
        * g_s2.astype(jnp.float32)[:, None, None, :]
    )
    g = zero_row_halos(gf.astype(g_out.dtype), w // 2)
    return _bwd_from_g(h, w, cin_splits, interpret, xs, k3, g)


_nb_conv3d_stats_core.defvjp(_stats_vjp_fwd, _stats_vjp_bwd)
