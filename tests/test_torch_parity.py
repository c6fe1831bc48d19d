"""torch↔Flax parity oracle for the flagship UNet.

Ports the weights of the installed *reference* torch model
(reference unet3d.py:20-391) into the Flax UNet and asserts forward
parity on random inputs — the strongest available guard against silent
architecture drift (conv arrangement, GroupNorm grouping/eps, LeakyReLU
slope, pooling, upsample grid convention, skip-concat order, residual
head).

Notes on exactness:

* The torch DoubleConv convs carry a bias that feeds straight into
  GroupNorm; the Flax blocks are deliberately bias-free (a pre-norm bias
  is almost-redundant and costs a fusion). The oracle zeroes the torch
  biases — the port is then mathematically exact.
* The reference upsamples with ``align_corners=True``; the Flax model's
  production default is half-pixel, so the oracle builds it with
  ``align_corners=True``.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from exaspim_tpu.models import UNet  # noqa: E402
from exaspim_tpu.models.unet3d import resize_trilinear  # noqa: E402

# Compile-heavy tier: deselect with -m "not slow" for the fast CI gate.
pytestmark = [pytest.mark.slow, pytest.mark.medium]



def _reference_unet(trilinear):
    from aind_exaspim_image_compression.machine_learning.unet3d import (
        UNet as TorchUNet,
    )

    tm = TorchUNet(width_multiplier=1, trilinear=trilinear, residual=True)
    tm.eval()
    # Zero the pre-GroupNorm conv biases (see module docstring).
    with torch.no_grad():
        for mod in tm.modules():
            if type(mod).__name__ == "DoubleConv":
                mod.double_conv[0].bias.zero_()
                mod.double_conv[3].bias.zero_()
    return tm


def _port_double_conv(tdc):
    out = {}
    for i, (ci, gi) in enumerate(((0, 1), (3, 4))):
        conv = tdc.double_conv[ci]
        gn = tdc.double_conv[gi]
        out[f"Conv_{i}"] = {
            # torch (out,in,kd,kh,kw) → flax (kd,kh,kw,in,out)
            "kernel": conv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
        }
        out[f"GroupNorm_{i}"] = {
            "scale": gn.weight.detach().numpy(),
            "bias": gn.bias.detach().numpy(),
        }
    return out


def _port_params(tm, trilinear):
    p = {"DoubleConv_0": _port_double_conv(tm.inc)}
    for i, down in enumerate((tm.down1, tm.down2, tm.down3, tm.down4)):
        p[f"DoubleConv_{i + 1}"] = _port_double_conv(down.maxpool_conv[1])
    for i, up in enumerate((tm.up1, tm.up2, tm.up3, tm.up4)):
        sub = {"DoubleConv_0": _port_double_conv(up.conv)}
        if not trilinear:
            w = up.up.weight.detach().numpy()  # (in, out, 2, 2, 2)
            # flax ConvTranspose correlates on the dilated input, which
            # spatially flips the kernel relative to torch's scatter.
            sub["ConvTranspose_0"] = {
                "kernel": np.ascontiguousarray(
                    w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1]
                ),
                "bias": up.up.bias.detach().numpy(),
            }
        p[f"Up_{i}"] = sub
    p["Conv_0"] = {
        "kernel": tm.outc.conv.weight.detach().numpy().transpose(
            2, 3, 4, 1, 0
        ),
        "bias": tm.outc.conv.bias.detach().numpy(),
    }
    return jax.tree_util.tree_map(jnp.asarray, p)


@pytest.mark.parametrize("trilinear", [True, False])
def test_forward_parity_with_reference_torch_unet(trilinear):
    tm = _reference_unet(trilinear)
    fm = UNet(
        width_multiplier=1.0, trilinear=trilinear, align_corners=True
    )
    params = _port_params(tm, trilinear)

    # Structure check: the ported tree must match the Flax init tree.
    ref_tree = jax.eval_shape(
        lambda: fm.init(jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1)))
    )["params"]
    ported_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    ref_paths = {
        jax.tree_util.keystr(k)
        for k, _ in jax.tree_util.tree_flatten_with_path(ref_tree)[0]
    }
    assert ported_paths == ref_paths

    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 0.2, (2, 32, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    yt = yt.transpose(0, 2, 3, 4, 1)
    yf = np.asarray(fm.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(yf, yt, atol=1e-4, rtol=1e-4)


def test_matmul_resize_matches_jax_image_resize():
    # Production (half-pixel) path must keep jax.image.resize numerics,
    # so checkpoints trained before the einsum rewrite stay valid.
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, 8, 7, 3)).astype(np.float32)
    target = (10, 16, 14)
    got = np.asarray(resize_trilinear(jnp.asarray(x), target))
    want = np.asarray(
        jax.image.resize(jnp.asarray(x), (2, *target, 3), "trilinear")
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_align_corners_resize_matches_torch_upsample():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 4, 6, 5, 2)).astype(np.float32)
    got = np.asarray(
        resize_trilinear(jnp.asarray(x), (8, 12, 10), align_corners=True)
    )
    up = torch.nn.Upsample(
        scale_factor=2, mode="trilinear", align_corners=True
    )
    with torch.no_grad():
        want = up(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
        ).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def _trained_like_reference_unet(trilinear, seed=7):
    """A reference torch UNet with non-trivial weights everywhere —
    including the pre-GroupNorm conv biases the importer must carry."""
    from aind_exaspim_image_compression.machine_learning.unet3d import (
        UNet as TorchUNet,
    )

    torch.manual_seed(seed)
    tm = TorchUNet(width_multiplier=1, trilinear=trilinear, residual=True)
    tm.eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.add_(0.05 * torch.randn_like(p))
    return tm


@pytest.mark.parametrize("trilinear", [True, False])
def test_import_torch_checkpoint_exact(tmp_path, trilinear):
    """End-to-end import of a reference-format checkpoint file: biases
    and all, forward parity ≤1e-4, and the msgpack round-trip restores
    the identical pipeline (reference inference.py:255-299)."""
    from exaspim_tpu.train.checkpoint import (
        import_torch_checkpoint,
        restore_pipeline,
    )

    tm = _trained_like_reference_unet(trilinear)
    ckpt_path = str(tmp_path / "ref.pth")
    torch.save(
        {
            "model": tm.state_dict(),
            "transform": {"kind": "asinh", "params": {"offset": 3.0}},
            "model_config": {
                "model": "UNet",
                "width_multiplier": 1,
                "trilinear": trilinear,
                "residual": True,
            },
        },
        ckpt_path,
    )

    out_path = str(tmp_path / "ported.msgpack")
    model, params, transform = import_torch_checkpoint(
        ckpt_path, out_path
    )
    assert model.conv_bias and model.align_corners
    assert transform.cfg["params"]["offset"] == 3.0

    rng = np.random.default_rng(0)
    x = rng.normal(0.5, 0.2, (2, 32, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    yt = yt.transpose(0, 2, 3, 4, 1)
    yf = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(yf, yt, atol=1e-4, rtol=1e-4)

    # msgpack round-trip restores the identical pipeline
    model2, params2, transform2 = restore_pipeline(
        out_path, dtype=jnp.float32
    )
    assert model2.config == model.config
    assert transform2.cfg == transform.cfg
    y2 = np.asarray(model2.apply({"params": params2}, jnp.asarray(x)))
    np.testing.assert_allclose(y2, yf, atol=1e-5, rtol=1e-5)


def test_import_torch_checkpoint_legacy_bare_state_dict(tmp_path):
    """A legacy bare state_dict imports with asinh default transform and
    inferred architecture (reference inference.py:283-286)."""
    from exaspim_tpu.train.checkpoint import import_torch_checkpoint

    tm = _trained_like_reference_unet(trilinear=True, seed=11)
    ckpt_path = str(tmp_path / "legacy.pth")
    torch.save(tm.state_dict(), ckpt_path)

    model, params, transform = import_torch_checkpoint(ckpt_path)
    assert transform.cfg["kind"] == "asinh"
    assert model.trilinear and type(model).__name__ == "UNet"

    rng = np.random.default_rng(1)
    x = rng.normal(0.5, 0.2, (1, 32, 32, 32, 1)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    yt = yt.transpose(0, 2, 3, 4, 1)
    yf = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(yf, yt, atol=1e-4, rtol=1e-4)
