"""Natural-phase blocked conv vs lax.conv_general_dilated (interpret).

Pins the panel/packing algebra of exaspim_tpu/ops/nb_conv.py on the CPU
interpreter; the real-TPU path is exercised by scripts/nb_bench.py and
the model-level blocked tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exaspim_tpu.ops.nb_conv import (
    from_blocked,
    nb_conv3d,
    supports_nb_conv,
    to_blocked,
)

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = pytest.mark.slow


def _ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def test_blocked_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 3, 32, 48, 5)).astype(np.float32))
    xb = to_blocked(x)
    assert xb.shape == (2, 3, 16 * 24, 20)
    np.testing.assert_array_equal(np.asarray(from_blocked(xb, 32, 48)),
                                  np.asarray(x))


@pytest.mark.parametrize("cin,cout,shape", [
    (32, 32, (1, 4, 32, 32)),
    (32, 64, (2, 2, 32, 48)),
    (64, 32, (1, 2, 48, 32)),
    # d=8 runs a multi-step z grid (zb=4): interior steps read only
    # clamped-in-range views while the first/last steps exercise the
    # z-boundary validity masking on both edges.
    (32, 32, (1, 8, 32, 32)),
])
def test_nb_conv_matches_lax(cin, cout, shape):
    b, d, h, w = shape
    assert supports_nb_conv(h, w, (cin,))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, cin)).astype(np.float32))
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, cout)) * 0.05).astype(np.float32)
    )
    got = from_blocked(
        nb_conv3d((to_blocked(x),), k, h, w, (cin,), True), h, w
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_ref(x, k)), atol=1e-4, rtol=1e-4
    )


def test_nb_conv_concat_segments_match_lax():
    """Two blocked inputs = conv of their channel concat, no relayout."""
    b, d, h, w, ca, cb, cout = 1, 2, 32, 32, 32, 32, 32
    rng = np.random.default_rng(1)
    xa = jnp.asarray(rng.normal(size=(b, d, h, w, ca)).astype(np.float32))
    xc = jnp.asarray(rng.normal(size=(b, d, h, w, cb)).astype(np.float32))
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, ca + cb, cout)) * 0.05).astype(np.float32)
    )
    got = from_blocked(
        nb_conv3d((to_blocked(xa), to_blocked(xc)), k, h, w, (ca, cb), True),
        h, w,
    )
    want = _ref(jnp.concatenate([xa, xc], axis=-1), k)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("d", [2, 8])
def test_nb_conv_grads_match_lax(d):
    # d=8 → multi-step z grids in BOTH backward kernels (dx via the
    # clamped forward, dw via clamped gradient views).
    b, h, w, cin, cout = 1, 32, 32, 32, 32
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, cin)).astype(np.float32))
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, cout)) * 0.05).astype(np.float32)
    )

    def loss_p(x, k):
        y = nb_conv3d((to_blocked(x),), k, h, w, (cin,), True)
        return jnp.sum(from_blocked(y, h, w) ** 2)

    def loss_r(x, k):
        return jnp.sum(_ref(x, k) ** 2)

    gx_p, gk_p = jax.grad(loss_p, argnums=(0, 1))(x, k)
    gx_r, gk_r = jax.grad(loss_r, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(
        np.asarray(gx_p), np.asarray(gx_r), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(gk_p), np.asarray(gk_r), atol=1e-3, rtol=1e-3
    )


def test_nb_conv_concat_grads_split_correctly():
    b, d, h, w, ca, cb, cout = 1, 2, 32, 32, 32, 64, 32
    rng = np.random.default_rng(3)
    xa = jnp.asarray(rng.normal(size=(b, d, h, w, ca)).astype(np.float32))
    xc = jnp.asarray(rng.normal(size=(b, d, h, w, cb)).astype(np.float32))
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, ca + cb, cout)) * 0.05).astype(np.float32)
    )

    def loss_p(xa, xc, k):
        y = nb_conv3d(
            (to_blocked(xa), to_blocked(xc)), k, h, w, (ca, cb), True
        )
        return jnp.sum(from_blocked(y, h, w) ** 2)

    def loss_r(xa, xc, k):
        return jnp.sum(_ref(jnp.concatenate([xa, xc], axis=-1), k) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(xa, xc, k)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(xa, xc, k)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3
        )


def test_conv_module_blocked_matches_xla():
    """models.unet3d.Conv: Blocked input == array input, same params."""
    import jax.numpy as jnp

    from exaspim_tpu.models.unet3d import Conv
    from exaspim_tpu.ops.nb_conv import Blocked

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 2, 64, 64, 32)).astype(np.float32))
    m = Conv(32)
    params = m.init(jax.random.key(0), x)
    y_x = m.apply(params, x)
    y_b = m.apply(params, Blocked.block(x))
    np.testing.assert_allclose(
        np.asarray(y_b.unblock()), np.asarray(y_x), atol=1e-4, rtol=1e-4
    )


def test_groupnorm_module_blocked_matches_flax():
    """Custom layout-polymorphic GroupNorm == nn.GroupNorm numerics."""
    import flax.linen as fnn
    import jax.numpy as jnp

    from exaspim_tpu.models.unet3d import GroupNorm
    from exaspim_tpu.ops.nb_conv import Blocked

    rng = np.random.default_rng(5)
    x = jnp.asarray(
        rng.normal(2.0, 3.0, (2, 3, 8, 12, 16)).astype(np.float32)
    )
    ref = fnn.GroupNorm(num_groups=8, epsilon=1e-5,
                        param_dtype=jnp.float32)
    mine = GroupNorm(num_groups=8, epsilon=1e-5)
    params = ref.init(jax.random.key(0), x)
    params = jax.tree_util.tree_map(
        lambda v: v + 0.1, params
    )  # non-trivial scale/bias
    want = ref.apply(params, x)
    got = mine.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    got_b = mine.apply(params, Blocked.block(x))
    np.testing.assert_allclose(
        np.asarray(got_b.unblock()), np.asarray(want),
        atol=1e-5, rtol=1e-5,
    )


def test_unet_forward_blocked_force_matches_never():
    """Full flagship UNet: blocked span == plain XLA execution.

    Covers pack placement, blocked GroupNorm/LeakyReLU, blocked pool,
    the segment-concat decoder conv, and the blocked 1×1 head.
    """
    import jax.numpy as jnp

    from exaspim_tpu.models import UNet

    rng = np.random.default_rng(6)
    x = jnp.asarray(
        rng.normal(0.5, 0.1, (1, 16, 64, 64, 1)).astype(np.float32)
    )
    m_n = UNet(width_multiplier=1.0, head_init="normal", blocked="never")
    m_f = UNet(width_multiplier=1.0, head_init="normal", blocked="force")
    params = m_n.init(jax.random.key(0), x)
    y_n = m_n.apply(params, x)
    y_f = m_f.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_n), atol=2e-4, rtol=2e-4
    )


def test_resize_trilinear_blocked_matches_plain():
    import jax.numpy as jnp

    from exaspim_tpu.models.unet3d import (
        resize_trilinear, resize_trilinear_blocked,
    )
    from exaspim_tpu.ops.nb_conv import to_blocked

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 12, 5)).astype(np.float32))
    for ac in (False, True):
        got = resize_trilinear_blocked(x, ac)
        want = to_blocked(resize_trilinear(x, (6, 16, 24), ac))
        np.testing.assert_allclose(
            np.asarray(got.interior()), np.asarray(want),
            atol=1e-5, rtol=1e-5,
        )
        assert (got.h, got.w) == (16, 24)


def test_nb_conv_small_cin_matches_lax():
    """Small-mode kernel (full tap groups) for the 1-channel entry conv."""
    b, d, h, w, cin, cout = 1, 3, 32, 32, 1, 32
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(b, d, h, w, cin)).astype(np.float32))
    k = jnp.asarray(
        (rng.normal(size=(3, 3, 3, cin, cout)) * 0.1).astype(np.float32)
    )
    assert supports_nb_conv(h, w, (cin,))
    got = from_blocked(
        nb_conv3d((to_blocked(x),), k, h, w, (cin,), True), h, w
    )
    want = jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_max_pool3d_blocked_matches_plain():
    import jax.numpy as jnp

    from exaspim_tpu.models.unet3d import max_pool3d, max_pool3d_blocked
    from exaspim_tpu.ops.nb_conv import Blocked

    rng = np.random.default_rng(7)
    for d in (4, 5):  # even and odd z (odd trailing slab dropped)
        x = jnp.asarray(
            rng.normal(size=(2, d, 16, 24, 8)).astype(np.float32)
        )
        got = max_pool3d_blocked(Blocked.block(x))
        want = max_pool3d(x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_unet_param_tree_independent_of_blocked():
    """Checkpoint compatibility: blocked dispatch never changes params."""
    import jax.numpy as jnp

    from exaspim_tpu.models import UNet

    x = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
    p_a = UNet(width_multiplier=0.25, blocked="auto").init(
        jax.random.key(0), x)
    p_n = UNet(width_multiplier=0.25, blocked="never").init(
        jax.random.key(0), x)
    fa = jax.tree_util.tree_flatten_with_path(p_a)[0]
    fn = jax.tree_util.tree_flatten_with_path(p_n)[0]
    assert [(k, v.shape) for k, v in fa] == [(k, v.shape) for k, v in fn]
    for (_, a), (_, b) in zip(fa, fn):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_supports_gate():
    assert not supports_nb_conv(30, 32, (32,))   # y not 16-aligned
    assert not supports_nb_conv(32, 32, (48,))   # channels not 32-mult
    assert not supports_nb_conv(16, 16, (32,))   # M too small
    assert supports_nb_conv(64, 64, (32, 32))


def test_vmem_gates():
    from exaspim_tpu.ops.nb_conv import _dw_vmem_ok, nb_conv_vmem_ok

    # The validated real-chip operating point (64² planes, 32 ch, bf16).
    assert nb_conv_vmem_ok(64, 64, (32,), 32)
    assert _dw_vmem_ok(64, 1024, 32, (32, 32), 32, 2)
    # The patch-96/128 inference planes fit at zb=1.
    assert nb_conv_vmem_ok(96, 96, (32,), 32)
    assert nb_conv_vmem_ok(128, 128, (32, 32), 32)
    # Very wide channels on large planes blow the estimated budget —
    # the model must fall back to the XLA conv, and dL/dW to the XLA
    # contraction, instead of failing in the Mosaic compiler.
    assert not nb_conv_vmem_ok(256, 256, (512,), 512)
    assert not _dw_vmem_ok(64, 128 * 128, 128, (512,), 512, 2)
    # dx asymmetry: a much wider cout makes the transposed (dx)
    # program the binding footprint even when the forward fits.
    wide = nb_conv_vmem_ok(256, 256, (32,), 1024)
    assert not wide


def test_nb_conv_stats_matches_explicit_sums():
    """nb_conv3d_stats: identical output to nb_conv3d, and the fused
    per-lane sums equal explicit interior reductions (round-5 GN-stats
    epilogue fusion — the conv emits Σy/Σy² so GroupNorm skips its
    stats read pass)."""
    from exaspim_tpu.ops.nb_conv import (
        Blocked, _interior, nb_conv3d, nb_conv3d_stats,
    )

    rng = np.random.default_rng(11)
    B, D, H, W, C, CO = 2, 4, 16, 16, 32, 32
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(3, 3, 3, C, CO)).astype(np.float32) * 0.1
    )
    xb = Blocked.block(x)
    out_ref = nb_conv3d((xb.data,), k, H, W, (C,), interpret=True)
    out, s1, s2 = nb_conv3d_stats((xb.data,), k, H, W, (C,),
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    oi = np.asarray(_interior(out, W // 2)).astype(np.float64)
    np.testing.assert_allclose(np.asarray(s1), oi.sum((1, 2)),
                               rtol=2e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s2), (oi * oi).sum((1, 2)),
                               rtol=2e-4, atol=1e-3)


def test_nb_conv_stats_vjp_matches_composed_reference():
    """Gradients through (out, s1, s2) must equal differentiating the
    plain conv with explicitly computed sums — the stats cotangents are
    folded into the output cotangent (∂s1/∂y=1, ∂s2/∂y=2y)."""
    from exaspim_tpu.ops.nb_conv import (
        Blocked, _interior, nb_conv3d, nb_conv3d_stats,
    )

    rng = np.random.default_rng(12)
    B, D, H, W, C, CO = 1, 4, 16, 16, 32, 32
    x = jnp.asarray(rng.normal(size=(B, D, H, W, C)).astype(np.float32))
    k = jnp.asarray(
        rng.normal(size=(3, 3, 3, C, CO)).astype(np.float32) * 0.1
    )
    xb = Blocked.block(x)

    def f_fused(xd, kk):
        o, a, b2 = nb_conv3d_stats((xd,), kk, H, W, (C,), interpret=True)
        return (jnp.sum(o.astype(jnp.float32) ** 2) * 1e-3
                + jnp.sum(a * 1.7) + jnp.sum(b2 * 0.3))

    def f_ref(xd, kk):
        o = nb_conv3d((xd,), kk, H, W, (C,), interpret=True)
        oi = _interior(o, W // 2).astype(jnp.float32)
        return (jnp.sum(o.astype(jnp.float32) ** 2) * 1e-3
                + jnp.sum(oi.sum((1, 2)) * 1.7)
                + jnp.sum((oi * oi).sum((1, 2)) * 0.3))

    g1 = jax.grad(f_fused, argnums=(0, 1))(xb.data, k)
    g2 = jax.grad(f_ref, argnums=(0, 1))(xb.data, k)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-3)


def test_unet_fused_gn_stats_matches_unfused():
    """Full UNet with GN-stats fusion on == off (forward AND grads):
    the fused statistics are computed from the same dtype-rounded conv
    output, so only f32 summation order differs."""
    import jax.numpy as jnp

    from exaspim_tpu.models import UNet

    rng = np.random.default_rng(13)
    x = jnp.asarray(
        rng.normal(0.5, 0.1, (1, 8, 64, 64, 1)).astype(np.float32)
    )
    m_off = UNet(width_multiplier=0.5, head_init="normal",
                 blocked="force", fuse_gn_stats=False)
    m_on = UNet(width_multiplier=0.5, head_init="normal",
                blocked="force", fuse_gn_stats=True)
    params = m_off.init(jax.random.key(0), x)
    y_off = m_off.apply(params, x)
    y_on = m_on.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(y_on), np.asarray(y_off), atol=2e-4, rtol=2e-4
    )

    def loss(m):
        def f(p):
            return jnp.mean((m.apply(p, x) - 0.4) ** 2)
        return f

    g_off = jax.grad(loss(m_off))(params)
    g_on = jax.grad(loss(m_on))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_on),
                    jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-3)
