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
