"""Checkpoint serialization: {params, model_config, transform_cfg, ...}.

Single-file msgpack checkpoints carrying everything needed to rebuild the
exact inference pipeline — the reference's ckpt dict
``{"model": state_dict, "model_config": ..., "transform": ...}``
(reference train.py:437-462) with the same score-in-filename ranking
(``BM4DNet-<date>-<step>-<score>.ckpt``) so checkpoints sort offline
(reference scripts/evaluate_bm4dnet.py:16-48).
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime

import jax
import numpy as np
from flax import serialization

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "checkpoint_filename",
    "find_best_checkpoint",
    "restore_pipeline",
    "save_train_state",
    "restore_train_state",
    "import_torch_checkpoint",
]

_SCORE_RE = re.compile(
    r"BM4DNet-\d{8}(?:_\d{4,6})?-(\d+)-(-?\d+(?:\.\d+)?)\.ckpt$"
)


def checkpoint_filename(step, score, date=None):
    """``BM4DNet-<date>-<step>-<score>.ckpt`` (lower score = better)."""
    date = date or datetime.now().strftime("%Y%m%d")
    return f"BM4DNet-{date}-{int(step)}-{float(score):.6f}.ckpt"


def save_checkpoint(path, params, model_config, transform_cfg, step=0,
                    score=None, extra=None):
    """Serialize a full pipeline checkpoint to one msgpack file."""
    params = jax.tree.map(np.asarray, params)
    payload = {
        "params": params,
        "meta": json.dumps({
            "model_config": model_config,
            "transform": transform_cfg,
            "step": int(step),
            "score": None if score is None else float(score),
            "extra": extra or {},
            "format": "exaspim_tpu.ckpt.v1",
        }),
    }
    blob = serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)  # atomic publish
    return path


def load_checkpoint(path):
    """Load a checkpoint → dict with params / model_config / transform / …"""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload["meta"])
    return {"params": payload["params"], **meta}


def restore_pipeline(path, dtype=None):
    """Rebuild (model, params, transform) ready for inference.

    Unlike the reference loader, every registered model class restores
    (reference inference.py:291 NameErrors on N2V2UNet checkpoints).
    """
    import jax.numpy as jnp

    from exaspim_tpu.models import build_model
    from exaspim_tpu.transforms import build_transform

    from exaspim_tpu.inference import commit_params

    ckpt = load_checkpoint(path)
    model = build_model(
        ckpt["model_config"], dtype=dtype or jnp.bfloat16
    )
    transform = build_transform(ckpt["transform"])
    # Commit the numpy leaves to the device here, once — per-call
    # re-uploads of ~100 small leaves dominate wall time on hosts with
    # a slow device link (see inference.commit_params).
    return model, commit_params(ckpt["params"]), transform


def find_best_checkpoint(directory):
    """Lowest-score checkpoint in ``directory`` (negative-aware regex,
    reference scripts/evaluate_bm4dnet.py:16-48)."""
    best_path, best_score = None, None
    for root, _, files in os.walk(directory):
        for name in files:
            m = _SCORE_RE.search(name)
            if not m:
                continue
            score = float(m.group(2))
            if best_score is None or score < best_score:
                best_path, best_score = os.path.join(root, name), score
    if best_path is None:
        raise FileNotFoundError(
            f"no scored checkpoints under {directory!r}"
        )
    return best_path


def save_train_state(path, state, model_config, transform_cfg,
                     extra=None):
    """Full-state checkpoint (params + optimizer + step) for elastic
    resume — beyond the reference's weights-only checkpoints
    (reference train.py:437-462 stores only the model)."""
    from flax import serialization as _ser

    payload = {
        "state": jax.tree.map(np.asarray, _ser.to_state_dict(state)),
        "meta": json.dumps({
            "model_config": model_config,
            "transform": transform_cfg,
            "step": int(state.step),
            "extra": extra or {},
            "format": "exaspim_tpu.trainstate.v1",
        }),
    }
    blob = _ser.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def restore_train_state(path, state_template):
    """Restore a full TrainState onto a freshly built template.

    Returns ``(state, meta)``; the template supplies the pytree
    structure (build it with the same model/optimizer hyperparameters).
    """
    from flax import serialization as _ser

    with open(path, "rb") as f:
        payload = _ser.msgpack_restore(f.read())
    meta = json.loads(payload["meta"])
    state = _ser.from_state_dict(state_template, payload["state"])
    return state, meta


# --------------------------------------------------- torch-format import

def _port_torch_double_conv(sd, prefix):
    """Port one reference DoubleConv (reference unet3d.py:137-208):
    Sequential(Conv3d, GroupNorm, LeakyReLU, Conv3d, GroupNorm, LeakyReLU)
    → the Flax DoubleConv param subtree. Conv biases are kept (they feed
    GroupNorm, which cannot absorb a per-channel shift across a group —
    the imported model must be built with ``conv_bias=True``)."""
    out = {}
    for i, (ci, gi) in enumerate(((0, 1), (3, 4))):
        out[f"Conv_{i}"] = {
            # torch (out,in,kd,kh,kw) → flax (kd,kh,kw,in,out)
            "kernel": sd[f"{prefix}.{ci}.weight"].transpose(2, 3, 4, 1, 0),
            "bias": sd[f"{prefix}.{ci}.bias"],
        }
        out[f"GroupNorm_{i}"] = {
            "scale": sd[f"{prefix}.{gi}.weight"],
            "bias": sd[f"{prefix}.{gi}.bias"],
        }
    return out


def _port_torch_state_dict(sd, trilinear):
    """Reference torch UNet/N2V2UNet state_dict → Flax param tree.

    Key layout per reference unet3d.py:20-131 (UNet) and :392-477
    (N2V2UNet — identical keys for the ported params; the MaxBlurPool
    blur kernels are derived constants here, not parameters)."""
    p = {"DoubleConv_0": _port_torch_double_conv(sd, "inc.double_conv")}
    for i in range(1, 5):
        p[f"DoubleConv_{i}"] = _port_torch_double_conv(
            sd, f"down{i}.maxpool_conv.1.double_conv"
        )
    for i in range(1, 5):
        sub = {
            "DoubleConv_0": _port_torch_double_conv(
                sd, f"up{i}.conv.double_conv"
            )
        }
        if not trilinear:
            w = sd[f"up{i}.up.weight"]  # (in, out, 2, 2, 2)
            # flax ConvTranspose correlates on the dilated input, which
            # spatially flips the kernel relative to torch's scatter.
            sub["ConvTranspose_0"] = {
                "kernel": np.ascontiguousarray(
                    w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1]
                ),
                "bias": sd[f"up{i}.up.bias"],
            }
        p[f"Up_{i - 1}"] = sub
    p["Conv_0"] = {
        "kernel": sd["outc.conv.weight"].transpose(2, 3, 4, 1, 0),
        "bias": sd["outc.conv.bias"],
    }
    return p


def import_torch_checkpoint(path, out_path=None, *, dtype=None):
    """Convert a reference torch checkpoint (.pt/.pth) to this package.

    Accepts both reference formats (reference inference.py:255-299):
    the current ckpt dict ``{"model": state_dict, "transform": cfg,
    "model_config": cfg}`` and a legacy bare state_dict (transform
    defaults to asinh). Model family (UNet vs N2V2UNet), upsampling
    mode, and width are taken from ``model_config`` when present and
    inferred from the state_dict keys/shapes otherwise — inference the
    reference's own loader does not attempt.

    The port is mathematically exact: conv biases import via the
    ``conv_bias=True`` model option and the upsample grid convention is
    pinned to ``align_corners=True`` (the reference's
    ``torch.nn.Upsample`` mode, reference unet3d.py:291-296).

    Returns ``(model, params, transform)`` ready for
    :func:`exaspim_tpu.inference.predict`; when ``out_path`` is given
    the converted checkpoint is also written in the native msgpack
    format (round-trips through :func:`restore_pipeline`).
    """
    import jax.numpy as jnp

    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "import_torch_checkpoint needs the torch package (CPU build "
            "is enough) to deserialize the reference checkpoint"
        ) from e

    from exaspim_tpu.models import build_model
    from exaspim_tpu.transforms import build_transform

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Older torch versions / pickled configs: fall back. The file
        # is user-supplied training output, same trust level as any
        # checkpoint the reference itself loads.
        ckpt = torch.load(path, map_location="cpu", weights_only=False)

    if isinstance(ckpt, dict) and "model" in ckpt:
        state_dict = ckpt["model"]
        transform_cfg = ckpt.get("transform") or {"kind": "asinh"}
        model_cfg = dict(ckpt.get("model_config") or {})
    else:  # legacy bare state_dict
        state_dict = ckpt
        transform_cfg = {"kind": "asinh"}
        model_cfg = {}

    sd = {
        k: v.detach().cpu().numpy()
        for k, v in state_dict.items()
        if hasattr(v, "detach")
    }

    model_type = model_cfg.pop("model", None)
    if model_type is None:
        # DownBlur's MaxBlurPool registers a persistent blur-kernel
        # buffer (reference unet3d.py:513-518) — its presence marks the
        # N2V2 variant even in legacy bare state_dicts.
        is_n2v2 = any(
            k.startswith("down1.maxpool_conv.0.") for k in state_dict
        )
        model_type = "N2V2UNet" if is_n2v2 else "UNet"
    trilinear = bool(
        model_cfg.pop("trilinear", "up1.up.weight" not in sd)
    )
    c1 = int(sd["inc.double_conv.0.weight"].shape[0])
    width = float(model_cfg.pop("width_multiplier", c1 / 32.0))
    if int(32 * width) != c1:
        raise ValueError(
            f"checkpoint width_multiplier={width} disagrees with the "
            f"state_dict ({c1} first-stage channels)"
        )
    residual = bool(model_cfg.pop("residual", True))
    if model_cfg:
        raise ValueError(
            f"unrecognized reference model_config keys: "
            f"{sorted(model_cfg)}"
        )

    config = {
        "model": model_type,
        "width_multiplier": width,
        "trilinear": trilinear,
        "residual": residual,
        "align_corners": True,
        "conv_bias": True,
    }
    model = build_model(config, dtype=dtype or jnp.float32)
    params = jax.tree.map(
        lambda a: np.asarray(a, dtype=np.float32),
        _port_torch_state_dict(sd, trilinear),
    )

    # Structure check against the model's own init tree: catches any
    # drift between the reference key layout and this port.
    ref_tree = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), jnp.zeros((1, 32, 32, 32, 1))
        )
    )["params"]
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for k, ref_leaf in jax.tree_util.tree_flatten_with_path(ref_tree)[0]:
        got = flat.pop(k, None)
        name = jax.tree_util.keystr(k)
        if got is None:
            raise ValueError(f"ported tree is missing {name}")
        if tuple(got.shape) != tuple(ref_leaf.shape):
            raise ValueError(
                f"{name}: ported shape {got.shape} != model shape "
                f"{ref_leaf.shape}"
            )
    if flat:
        raise ValueError(
            "ported tree has extra params: "
            f"{[jax.tree_util.keystr(k) for k in flat]}"
        )

    if out_path is not None:
        save_checkpoint(
            out_path, params, model.config, transform_cfg,
            extra={"imported_from": os.path.abspath(path)},
        )
    return model, params, build_transform(transform_cfg)
