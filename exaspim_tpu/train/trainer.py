"""Training orchestration: epoch loop, validation, compression-aware
checkpoint selection.

Capability parity with the reference Trainer (reference train.py:35-487):
step-based validation cadence, per-example compression ratios via the
frozen transform inverse + chunked blosc, count-space fidelity metrics,
weighted checkpoint score (lower = better; cratio subtracts), checkpoints
named ``BM4DNet-<date>-<step>-<score>.ckpt``, ``config.json`` run records,
TensorBoard scalars, and resume with transform/model-config mismatch
rejection.

TPU-native differences: the step is one jitted XLA program (bf16 compute,
no GradScaler); batches stream through the prefetching loader into HBM
with ``prefetch_to_device``; validation MIP PNGs go to the session
directory, not the CWD (fixes a reference wart, train.py:338).
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime

import jax
import numpy as np

from exaspim_tpu.compression import best_codec, compute_cratio
from exaspim_tpu.data.loader import (
    DataLoader,
    make_count_train_collate,
    make_count_val_collate,
    prefetch_to_device,
)
from exaspim_tpu.ops.metrics import (
    DEFAULT_CHECKPOINT_WEIGHTS,
    checkpoint_score,
    evaluate_example,
)
from exaspim_tpu.train.checkpoint import (
    checkpoint_filename,
    load_checkpoint,
    restore_train_state,
    save_checkpoint,
    save_train_state,
)
from exaspim_tpu.train.state import (
    create_train_state,
    make_eval_step,
    make_train_step,
)

__all__ = ["Trainer"]


class Trainer:
    """Train a denoiser on (raw, teacher, fg) patch datasets.

    Parameters follow the reference operating point
    (reference scripts/train_bm4dnet.py:156-211): ``fg_weight=0`` +
    ``preserve_foreground=False`` + cratio-dominated checkpoint weights is
    the compression-focused configuration.
    """

    def __init__(self, output_dir, model, transform, *, lr=1e-3,
                 weight_decay=1e-2, epochs=50, batch_size=32,
                 fg_weight=0.0, preserve_foreground=False, val_every=1000,
                 loss_eps=1e-3,
                 checkpoint_weights=None, clevel=6, seed=42,
                 warmup_steps=0, max_val_examples=None, keep_mips=10,
                 tensorboard=True, mesh=None, device_cache="auto",
                 device_cache_budget=8 << 30, val_device_metrics=True,
                 exact_cratio_examples=16, augment=False,
                 full_state_every=1):
        self.model = model
        self.transform = transform
        self.lr = lr
        self.weight_decay = weight_decay
        self.epochs = int(epochs)
        self.batch_size = int(batch_size)
        self.fg_weight = float(fg_weight)
        #: Charbonnier knee, in the transform domain. The default 1e-3
        #: (reference losses.py) is ~0.3 uint16 counts at the shipped
        #: asinh scale. Measured: the smaller-eps hypothesis (L1-like
        #: penalty pushes sub-count background residue further) is
        #: FALSE — the eps=1e-4 A/B scored strictly worse on both gain
        #: and PSNR (1.835/64.96 dB vs 1.921/66.11 dB at matched
        #: budget, RESULTS.md round 4b); the default is retained and
        #: the knob stays exposed for reproduction only.
        self.loss_eps = float(loss_eps)
        self.preserve_foreground = bool(preserve_foreground)
        self.val_every = int(val_every)
        self.checkpoint_weights = dict(
            checkpoint_weights or DEFAULT_CHECKPOINT_WEIGHTS
        )
        self.codec = best_codec(clevel=clevel)
        self.seed = int(seed)
        self.warmup_steps = int(warmup_steps)
        self.max_val_examples = max_val_examples
        self.keep_mips = int(keep_mips)
        #: optional jax.sharding.Mesh → data-parallel training (batch
        #: sharded across the mesh, params replicated, gradient psum
        #: inserted by XLA).
        self.mesh = mesh
        #: HBM-resident cache mode: upload the whole (raw, teacher, fg)
        #: cache to device once and gather batches inside the jitted
        #: step — the host then ships only (B,) index vectors, so a slow
        #: host↔device link (this environment's tunnel moves a 32×64³
        #: uint16 batch in ~0.7 s) stops bounding the loop. ``"auto"``
        #: engages when the dataset exposes its cache arrays, fits
        #: ``device_cache_budget`` bytes, divides evenly into batches
        #: (identical step stream to the loader path), and no mesh is
        #: set. ``True`` forces it (dropping a trailing partial batch);
        #: ``False`` always streams through the DataLoader.
        self.device_cache = device_cache
        self.device_cache_budget = int(device_cache_budget)
        #: validation metric path: True (default) evaluates each batch
        #: on device in one jitted call (metrics + cratio proxy, see
        #: ops/metrics_device.py + compression/proxy.py) — only scalars
        #: cross to host; the exact blosc cratio that anchors the
        #: checkpoint score is measured for the first
        #: ``exact_cratio_examples`` examples only (the reference syncs
        #: every example through its host metric loop,
        #: reference train.py:331-374). False keeps the per-example
        #: host-oracle loop (parity/debug path).
        self.val_device_metrics = bool(val_device_metrics)
        self.exact_cratio_examples = int(exact_cratio_examples)
        #: on-device data augmentation: each train step applies one of
        #: the 48 cube orientations (flips × axis transposes) to the
        #: gathered batch, deterministic in (seed, step). Free effective
        #: data scale for isotropic volumes; device-cache mode only
        #: (the gather already runs in-program), cubic patches only.
        self.augment = bool(augment)
        #: write the rolling full-state resume checkpoint
        #: (``latest_state.ckpt``, params + optimizer moments, ~3× a
        #: scored checkpoint) every Nth validation instead of every
        #: one. On a slow device→host link the full-state fetch
        #: dominates the validation cycle (measured ~100 s of a ~120 s
        #: cycle on this harness's tunnel); resume granularity degrades
        #: to N·val_every steps, which a cheap re-run covers.
        self.full_state_every = max(1, int(full_state_every))
        self._n_validations = 0
        self._val_metrics_fn = None

        stamp = datetime.now().strftime("%Y%m%d_%H%M")
        self.output_dir = os.fspath(output_dir)
        self.session_dir = os.path.join(
            self.output_dir, f"session-{stamp}"
        )
        self.ckpt_dir = os.path.join(self.session_dir, "checkpoints")
        self.mip_dir = os.path.join(self.session_dir, "mips")
        for d in (self.ckpt_dir, self.mip_dir):
            os.makedirs(d, exist_ok=True)

        self._writer = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._writer = SummaryWriter(
                    os.path.join(self.session_dir, "tb")
                )
            except Exception:
                self._writer = None
        self._log_path = os.path.join(self.session_dir, "log.jsonl")
        self._pretrained_params = None
        self._pretrained_transform_cfg = None

    # ------------------------------------------------------------- setup

    def load_pretrained_weights(self, ckpt_path):
        """Stage params from a checkpoint (path or an already-loaded
        checkpoint dict); model-config mismatch rejects
        (reference train.py:376-401)."""
        ckpt = (
            ckpt_path if isinstance(ckpt_path, dict)
            else load_checkpoint(ckpt_path)
        )
        # Normalized comparison: checkpoints written before a config
        # field existed compare by that field's default value.
        from exaspim_tpu.models import build_model

        if build_model(ckpt["model_config"]).config != self.model.config:
            raise ValueError(
                "checkpoint model_config does not match this model: "
                f"{ckpt['model_config']} vs {self.model.config}"
            )
        self._pretrained_params = ckpt["params"]
        self._pretrained_transform_cfg = ckpt["transform"]

    def check_transform_cfg(self):
        """Resumed training must keep the identical intensity mapping
        (reference train.py:131-133, 323-329)."""
        if self._pretrained_transform_cfg is None:
            return
        if self._pretrained_transform_cfg != self.transform.cfg:
            raise ValueError(
                "resume transform cfg mismatch: checkpoint has "
                f"{self._pretrained_transform_cfg}, trainer has "
                f"{self.transform.cfg}"
            )

    def save_config(self, extra=None):
        """Merge run config into ``session_dir/config.json``
        (reference train.py:403-435)."""
        path = os.path.join(self.session_dir, "config.json")
        cfg = {}
        if os.path.exists(path):
            with open(path) as f:
                cfg = json.load(f)
        cfg.update({
            "model_config": self.model.config,
            "transform": self.transform.cfg,
            "lr": self.lr,
            "weight_decay": self.weight_decay,
            "epochs": self.epochs,
            "batch_size": self.batch_size,
            "fg_weight": self.fg_weight,
            "loss_eps": self.loss_eps,
            "preserve_foreground": self.preserve_foreground,
            "val_every": self.val_every,
            "checkpoint_weights": self.checkpoint_weights,
            "seed": self.seed,
            "warmup_steps": self.warmup_steps,
            "codec": getattr(self.codec, "config", None),
        })
        cfg.update(extra or {})
        with open(path, "w") as f:
            json.dump(cfg, f, indent=2, sort_keys=True, default=str)
        return path

    # ------------------------------------------------- device-cache mode

    def _fg_needed(self):
        """The cached step reads fg only when the loss weights it or the
        foreground-preserving target rule is on; otherwise the mask
        never needs to occupy HBM (−20 % cache bytes)."""
        return self.preserve_foreground or self.fg_weight != 0

    def _cache_nbytes(self, ds, resident=True):
        """Bytes of HBM the cache will occupy (``resident=True``:
        fg bit-packed when needed, absent when unused) or of the raw
        host cache (``resident=False``)."""
        raw_b = sum(a.nbytes for a in ds._raw)
        teach_b = sum(a.nbytes for a in ds._teacher)
        fg_b = sum(a.nbytes for a in ds._fg)
        if resident:
            fg_b = -(-fg_b // 8) if self._fg_needed() else 0
        return raw_b + teach_b + fg_b

    def _resolve_device_cache(self, train_ds):
        """Decide how this run trains from an HBM-resident cache.

        Returns 0 (stream through the DataLoader) or the shard count S:
        S == 1 → the whole cache is device-resident for the run;
        S > 1  → the cache exceeds ``device_cache_budget`` and rotates
        through HBM one contiguous shard at a time (each epoch still
        sees every patch; see ``run``). fg residency follows
        ``_fg_needed``: bit-packed when the loss uses it, absent when
        not — both leave the step stream numerically identical to the
        loader path, so ``"auto"`` may engage them.

        ``device_cache="auto"`` engages only full residency (S == 1)
        and silently falls back to the streaming loader otherwise; an
        explicit ``device_cache=True`` raises when it cannot be honored
        at all, and shards when the cache merely exceeds the budget —
        a forced mode must not quietly train a different path.
        """
        forced = self.device_cache is True
        if not self.device_cache:
            return 0
        if self.mesh is not None:
            if forced:
                raise ValueError(
                    "device_cache=True is incompatible with mesh "
                    "data-parallel training (the DP step streams "
                    "sharded host batches); use device_cache='auto' "
                    "or None"
                )
            return 0
        if not all(hasattr(train_ds, f)
                   for f in ("_raw", "_teacher", "_fg")):
            # live/streaming dataset: no arrays to upload
            if forced:
                raise ValueError(
                    "device_cache=True requires a cached dataset with "
                    "in-memory (_raw, _teacher, _fg) arrays; a live/"
                    "streaming dataset cannot be device-resident"
                )
            return 0
        n = len(train_ds)
        if n < self.batch_size:
            if forced:
                raise ValueError(
                    f"device_cache=True but the dataset ({n} patches) "
                    f"is smaller than batch_size ({self.batch_size})"
                )
            return 0
        nbytes = self._cache_nbytes(train_ds)
        fits = nbytes <= self.device_cache_budget
        if self.device_cache == "auto":
            # Engage only when the step stream is identical to the
            # loader path (no trailing partial batch to drop, no
            # shard-local shuffle).
            return 1 if fits and n % self.batch_size == 0 else 0
        if fits:
            return 1
        # Forced + oversized: rotate shards through HBM. Each shard is
        # a whole number of batches; the minimum honorable budget is
        # one batch worth of rows.
        row_b = nbytes / n
        rows_per_shard = int(self.device_cache_budget // row_b)
        batches_per_shard = rows_per_shard // self.batch_size
        if batches_per_shard < 1:
            raise ValueError(
                f"device_cache=True but device_cache_budget "
                f"({self.device_cache_budget} B) cannot hold even one "
                f"batch ({int(row_b) * self.batch_size} B)"
            )
        total_batches = n // self.batch_size
        return -(-total_batches // batches_per_shard)

    # Host-side staging granularity for the cache upload: bounds the
    # transient host RAM at one chunk (instead of the whole memmap'd
    # shard) and, with buffer donation below, bounds the transient HBM
    # at final_size + one chunk (instead of ~2x for a concatenate).
    _UPLOAD_CHUNK_BYTES = 256 << 20

    @staticmethod
    def _row_slices(parts, lo, hi):
        """Yield contiguous host slices covering global rows [lo, hi)
        across a multi-dir cache's list of memmaps."""
        off = 0
        for p in parts:
            s, e = max(lo - off, 0), min(hi - off, p.shape[0])
            if s < e:
                yield p[s:e]
            off += p.shape[0]

    def _upload_cache(self, ds, lo=0, hi=None):
        """Ship cache rows [lo, hi) of (raw, teacher[, fg]) to HBM.

        Streams chunk-by-chunk into one preallocated, donated device
        buffer: multi-GiB memmap caches upload without materializing a
        shard on the host or double-buffering the cache in HBM. fg is
        bit-packed on the host (8× smaller residency) when the loss
        needs it and skipped entirely when it does not; the cached
        train step unpacks after the batch gather
        (:func:`exaspim_tpu.train.state.unpack_fg_bits`).
        """
        import jax.numpy as jnp
        from jax import lax

        from exaspim_tpu.train.state import pack_fg_bits

        hi = len(ds) if hi is None else hi
        t0 = time.time()

        def up(parts, host_transform=None):
            n = hi - lo
            probe = parts[0][:1] if host_transform is None \
                else host_transform(parts[0][:1])
            tail, dtype = probe.shape[1:], probe.dtype
            buf = jnp.zeros((n, *tail), dtype)
            write = jax.jit(
                lambda b, s, o: lax.dynamic_update_slice(
                    b, s, (o,) + (0,) * len(tail)
                ),
                donate_argnums=0,
            )
            off = 0
            row_bytes = max(
                1, int(np.prod(parts[0].shape[1:]))
                * parts[0].dtype.itemsize
            )
            rows = max(1, self._UPLOAD_CHUNK_BYTES // row_bytes)
            for p in self._row_slices(parts, lo, hi):
                for clo in range(0, p.shape[0], rows):
                    chunk = np.ascontiguousarray(p[clo:clo + rows])
                    if host_transform is not None:
                        chunk = host_transform(chunk)
                    buf = write(buf, jax.device_put(chunk), off)
                    off += chunk.shape[0]
            return buf

        raw_dev = up(ds._raw)
        teacher_dev = up(ds._teacher)
        fg_dev = up(ds._fg, pack_fg_bits) if self._fg_needed() else None
        jax.block_until_ready((raw_dev, teacher_dev)
                              if fg_dev is None
                              else (raw_dev, teacher_dev, fg_dev))
        self._log({
            "event": "device_cache_upload",
            "rows": [int(lo), int(hi)],
            "bytes": int((hi - lo) / max(len(ds), 1)
                         * self._cache_nbytes(ds)),
            "fg": "packed" if fg_dev is not None else "skipped",
            "wall_s": round(time.time() - t0, 1),
        })
        return raw_dev, teacher_dev, fg_dev

    # -------------------------------------------------------------- run

    def run(self, train_ds, val_ds, resume_state=None):
        """Full training run; returns the final TrainState.

        ``resume_state``: path of a full-state checkpoint
        (``latest_state.ckpt``) to continue from — params, optimizer
        moments, and step all restore, so a preempted run resumes
        exactly (elastic recovery; the reference restarts from weights
        only).
        """
        self.check_transform_cfg()
        # Count-space batches: the host only stacks uint16; the frozen
        # transform runs inside the jitted steps on device.
        train_loader = DataLoader(
            train_ds, self.batch_size,
            make_count_train_collate(self.preserve_foreground),
            shuffle=True, seed=self.seed,
        )
        val_loader = DataLoader(
            val_ds, self.batch_size, make_count_val_collate()
        )
        n_shards = self._resolve_device_cache(train_ds)
        use_dev_cache = n_shards > 0
        if self.augment and not use_dev_cache:
            raise ValueError(
                "augment=True requires device-cache mode (the "
                "orientation draw runs inside the cached train step); "
                "this run resolved to the streaming loader path"
            )
        if use_dev_cache:
            steps_per_epoch = len(train_ds) // self.batch_size
        else:
            steps_per_epoch = len(train_loader)
        total_steps = max(1, self.epochs * steps_per_epoch)
        patch = tuple(train_ds.patch_shape)

        state = create_train_state(
            self.model, patch_shape=patch, lr=self.lr,
            total_steps=total_steps, weight_decay=self.weight_decay,
            seed=self.seed, warmup_steps=self.warmup_steps,
            params=self._pretrained_params,
        )
        start_step = 0
        if resume_state:
            state, meta = restore_train_state(resume_state, state)
            if meta["transform"] != self.transform.cfg:
                raise ValueError(
                    "resume transform cfg mismatch: "
                    f"{meta['transform']} vs {self.transform.cfg}"
                )
            # Normalize through build_model so checkpoints written
            # before a config field existed (and thus lack the key)
            # still compare equal to a model using its default value.
            from exaspim_tpu.models import build_model

            if build_model(meta["model_config"]).config \
                    != self.model.config:
                raise ValueError(
                    "resume model_config mismatch: "
                    f"{meta['model_config']} vs {self.model.config}"
                )
            start_step = int(state.step)
        if self.mesh is not None:
            from exaspim_tpu.parallel import make_dp_train_step

            train_step = make_dp_train_step(
                self.mesh, fg_weight=self.fg_weight, eps=self.loss_eps,
                transform=self.transform,
            )
        elif use_dev_cache:
            from exaspim_tpu.train.state import make_cached_train_step

            if self.augment and len(set(patch)) != 1:
                raise ValueError(
                    f"augment=True requires cubic patches, got {patch}"
                )
            train_step = make_cached_train_step(
                self.fg_weight, eps=self.loss_eps,
                transform=self.transform,
                preserve_foreground=self.preserve_foreground,
                fg_packed=self._fg_needed(), augment=self.augment,
                seed=self.seed, patch_shape=patch,
            )
        else:
            train_step = make_train_step(
                self.fg_weight, eps=self.loss_eps,
                transform=self.transform,
            )
        eval_step = make_eval_step(
            self.fg_weight, eps=self.loss_eps, transform=self.transform
        )
        self.save_config({
            "total_steps": total_steps,
            "steps_per_epoch": steps_per_epoch,
            "device_cache": bool(use_dev_cache),
            "device_cache_shards": n_shards,
            "augment": self.augment,
        })

        from exaspim_tpu.utils.profiling import StepTimer

        step = start_step
        t0 = time.time()
        timer = StepTimer(
            voxels_per_step=self.batch_size * int(np.prod(patch))
        )
        start_epoch = start_step // max(steps_per_epoch, 1)

        def bookkeep(state, loss, epoch):
            nonlocal step
            step += 1
            stats = timer.step() or {}
            if step % 50 == 0 or step == total_steps:
                self._scalar("train_loss", float(loss), step)
                if "voxels_per_sec" in stats:
                    self._scalar(
                        "voxels_per_sec", stats["voxels_per_sec"], step
                    )
                self._log({
                    "event": "train", "step": step, "epoch": epoch,
                    "loss": float(loss),
                    "wall_s": round(time.time() - t0, 1),
                    **stats,
                })
            if step % self.val_every == 0:
                self.validate_and_checkpoint(
                    state, eval_step, val_loader, step
                )

        if use_dev_cache and n_shards == 1:
            import jax.numpy as jnp

            raw_dev, teacher_dev, fg_dev = self._upload_cache(train_ds)
            samples_per_epoch = steps_per_epoch * self.batch_size
            for epoch in range(start_epoch, self.epochs):
                # Identical permutation stream to DataLoader._order.
                order = np.random.default_rng(
                    np.random.SeedSequence([self.seed, epoch])
                ).permutation(
                    len(train_ds)
                )[:samples_per_epoch].astype(np.int32)
                for lo in range(0, samples_per_epoch, self.batch_size):
                    idx = jnp.asarray(order[lo:lo + self.batch_size])
                    state, loss = train_step(
                        state, raw_dev, teacher_dev, fg_dev, idx
                    )
                    bookkeep(state, loss, epoch)
        elif use_dev_cache:
            # Shard rotation: the cache exceeds the HBM budget, so each
            # epoch walks S contiguous shards, uploading one at a time
            # (donated buffers; the previous shard is freed before the
            # next upload). Every epoch still visits every patch;
            # shuffling is shard-local (SeedSequence [seed, epoch, s]).
            import jax.numpy as jnp

            samples_per_epoch = steps_per_epoch * self.batch_size
            shard_rows = -(-steps_per_epoch // n_shards) * self.batch_size
            for epoch in range(start_epoch, self.epochs):
                for s in range(n_shards):
                    row_lo = s * shard_rows
                    row_hi = min(samples_per_epoch, row_lo + shard_rows)
                    if row_lo >= row_hi:
                        break
                    raw_dev, teacher_dev, fg_dev = self._upload_cache(
                        train_ds, row_lo, row_hi
                    )
                    order = np.random.default_rng(
                        np.random.SeedSequence([self.seed, epoch, s])
                    ).permutation(row_hi - row_lo).astype(np.int32)
                    for lo in range(0, len(order), self.batch_size):
                        idx = jnp.asarray(order[lo:lo + self.batch_size])
                        state, loss = train_step(
                            state, raw_dev, teacher_dev, fg_dev, idx
                        )
                        bookkeep(state, loss, epoch)
                    # Drain pending steps so the freed shard cannot
                    # overlap the next upload in HBM.
                    jax.block_until_ready(loss)
                    del raw_dev, teacher_dev, fg_dev
        else:
            for epoch in range(start_epoch, self.epochs):
                train_loader.set_epoch(epoch)
                for x, y, fg in prefetch_to_device(train_loader):
                    state, loss = train_step(state, x, y, fg)
                    bookkeep(state, loss, epoch)
        if step % self.val_every != 0:
            self.validate_and_checkpoint(
                state, eval_step, val_loader, step
            )
        return state

    # ------------------------------------------------------- validation

    def _get_val_metrics_step(self):
        """One jitted program: batched count-space metrics + cratio proxy.

        Returns (dict of (B,) metric arrays, (B,) proxy ratios); only
        these scalars cross the device→host boundary per batch.
        """
        if self._val_metrics_fn is None:
            import jax.numpy as jnp

            from exaspim_tpu.compression.proxy import cratio_proxy
            from exaspim_tpu.ops.metrics_device import evaluate_batch

            @jax.jit
            def fn(pred, x, y, fg):
                p = pred[..., 0].astype(jnp.float32)
                raw = x[..., 0].astype(jnp.float32)
                teacher = y[..., 0].astype(jnp.float32)
                m = evaluate_batch(
                    p, raw, teacher, fg[..., 0].astype(jnp.float32)
                )
                proxy = jax.vmap(
                    lambda v: cratio_proxy(v, chunk=64)
                )(pred[..., 0])
                return m, proxy

            self._val_metrics_fn = fn
        return self._val_metrics_fn

    def validate(self, state, eval_step, val_loader, step):
        """Loss + count-space metrics + compression evidence
        (reference train.py:224-374).

        Default path (``val_device_metrics=True``): each batch is
        metric-evaluated on device in one jitted call (the val collate
        guarantees ``x[..., 0]`` is the raw counts, data/loader.py
        ``make_count_val_collate``); the host only receives (B,)
        scalars, plus the first ``exact_cratio_examples`` predictions
        for the exact blosc ``val_cratio`` that anchors the checkpoint
        score, and the first ``keep_mips`` for MIP PNGs. The
        per-example host-oracle loop (the reference's structure and
        this trainer's original path) remains available with
        ``val_device_metrics=False``; parity between the two metric
        stacks is pinned in tests/test_metrics.py.
        """
        if not self.val_device_metrics:
            return self._validate_host(state, eval_step, val_loader, step)
        metrics_step = self._get_val_metrics_step()
        losses, proxies, exact_cratios = [], [], []
        sums, n_rows = {}, 0
        n_seen = 0
        n_mips = 0
        for x, y, counts, fg in val_loader:
            if (self.max_val_examples is not None
                    and n_seen >= self.max_val_examples):
                break
            x = jax.device_put(x)
            y = jax.device_put(y)
            fg = jax.device_put(fg)
            loss, pred = eval_step(state, x, y, fg)
            m, proxy = metrics_step(pred, x, y, fg)
            losses.append(float(loss))
            b = int(pred.shape[0])
            take = b if self.max_val_examples is None else min(
                b, self.max_val_examples - n_seen
            )
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(
                    np.sum(np.asarray(v)[:take])
                )
            n_rows += take
            proxies.extend(np.asarray(proxy)[:take].tolist())
            # Bounded host pulls: exact blosc ratios + MIP PNGs on the
            # leading examples only.
            n_exact = min(take, max(
                0, self.exact_cratio_examples - len(exact_cratios)
            ))
            n_pull = max(n_exact, min(take, self.keep_mips - n_mips))
            if n_pull > 0:
                head = np.asarray(pred[:n_pull])[..., 0]
                for i in range(n_pull):
                    if i < n_exact:
                        exact_cratios.append(
                            compute_cratio(head[i], self.codec)
                        )
                    if n_mips < self.keep_mips:
                        self._save_mip(head[i], step, n_mips)
                        n_mips += 1
            n_seen += take
        agg = {k: s / n_rows for k, s in sums.items()} if n_rows else {}
        result = {
            "val_loss": float(np.mean(losses)) if losses else float("nan"),
            "val_cratio": (
                float(np.median(exact_cratios)) if exact_cratios else 0.0
            ),
            "val_cratio_proxy": (
                float(np.median(proxies)) if proxies else 0.0
            ),
            **{f"val_{k}": v for k, v in agg.items()},
        }
        result["val_score"] = checkpoint_score(
            agg, result["val_cratio"], self.checkpoint_weights
        ) if n_rows else float("inf")
        return result

    def _validate_host(self, state, eval_step, val_loader, step):
        """Per-example host-oracle validation (reference train.py
        structure); kept as the parity/debug path."""
        losses, cratios, rows = [], [], []
        n_seen = 0
        n_mips = 0
        for x, y, counts, fg in val_loader:
            if (self.max_val_examples is not None
                    and n_seen >= self.max_val_examples):
                break
            loss, pred = eval_step(state, x, y, fg)
            losses.append(float(loss))
            # eval_step inverse-maps on device: pred is uint16 counts.
            pred = np.asarray(pred)[..., 0]
            y_np = np.asarray(y)[..., 0]
            fg_np = np.asarray(fg)[..., 0].astype(bool)
            for i in range(pred.shape[0]):
                if (self.max_val_examples is not None
                        and n_seen >= self.max_val_examples):
                    break
                pred_counts = pred[i]
                teacher_counts = y_np[i]
                raw_counts = np.asarray(counts[i])
                cratios.append(
                    compute_cratio(pred_counts, self.codec)
                )
                rows.append(evaluate_example(
                    pred_counts, raw_counts, teacher_counts, fg_np[i]
                ))
                if n_mips < self.keep_mips:
                    self._save_mip(pred_counts, step, n_mips)
                    n_mips += 1
                n_seen += 1
        agg = {
            k: float(np.mean([r[k] for r in rows])) for k in rows[0]
        } if rows else {}
        result = {
            "val_loss": float(np.mean(losses)) if losses else float("nan"),
            "val_cratio": float(np.median(cratios)) if cratios else 0.0,
            **{f"val_{k}": v for k, v in agg.items()},
        }
        result["val_score"] = checkpoint_score(
            agg, result["val_cratio"], self.checkpoint_weights
        ) if rows else float("inf")
        return result

    def validate_and_checkpoint(self, state, eval_step, val_loader, step):
        """Validate, log scalars, and write the scored checkpoint."""
        metrics = self.validate(state, eval_step, val_loader, step)
        for k, v in metrics.items():
            self._scalar(k, v, step)
        self._log({"event": "val", "step": step, **metrics})
        path = os.path.join(
            self.ckpt_dir,
            checkpoint_filename(step, metrics["val_score"]),
        )
        save_checkpoint(
            path, state.params, self.model.config, self.transform.cfg,
            step=step, score=metrics["val_score"],
            extra={"metrics": metrics},
        )
        # Rolling full-state checkpoint for elastic resume (throttled
        # by full_state_every — see __init__).
        self._n_validations += 1
        if self._n_validations % self.full_state_every == 0:
            save_train_state(
                os.path.join(self.ckpt_dir, "latest_state.ckpt"), state,
                self.model.config, self.transform.cfg,
            )
        return metrics, path

    # ---------------------------------------------------------- logging

    def _scalar(self, tag, value, step):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def _log(self, record):
        with open(self._log_path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")

    def _save_mip(self, counts, step, index):
        """Write an XY max-projection PNG into the session mips/ dir."""
        try:
            from PIL import Image

            mip = counts.max(axis=0).astype(np.float32)
            hi = max(float(mip.max()), 1.0)
            img = (255 * mip / hi).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(
                self.mip_dir, f"step{step:07d}_ex{index}.png"
            ))
        except Exception:
            pass
