"""Deterministic prefetching data loader (host → TPU pipeline).

TPU-analogue of the reference's producer-thread DataLoader
(reference data_handling.py:1236-1384): a background producer builds
batches into a bounded queue so host-side batch prep overlaps device
compute, with

* deterministic per-epoch shuffles from ``SeedSequence([seed, epoch])``
  (reference data_handling.py:1311-1314) — identical order for identical
  seeds regardless of worker timing,
* exceptions forwarded to the consumer (not swallowed in the thread),
* ``set_epoch`` for epoch-specific reshuffles,
* channels-last ``(B, D, H, W, 1)`` float32 batches — the TPU layout —
  built by pluggable collate functions that apply the frozen intensity
  transform and the ``where(fg, raw, teacher)`` foreground-preserving
  target rule (reference data_handling.py:48-86).

An optional ``prefetch_to_device`` wrapper double-buffers batches into
HBM with ``jax.device_put`` so the accelerator never waits on PCIe.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

__all__ = [
    "DataLoader",
    "make_count_train_collate",
    "make_count_val_collate",
    "make_train_collate",
    "make_val_collate",
    "prefetch_to_device",
]


def _to_net(x):
    """(B, z, y, x) float → (B, z, y, x, 1) float32 channels-last."""
    return np.asarray(x, dtype=np.float32)[..., None]


def make_train_collate(transform, preserve_foreground=False):
    """Collate (raw, teacher, fg) count-space items → (x, y, fg) batch.

    ``y = transform(where(fg, raw, teacher))`` when
    ``preserve_foreground`` — the net learns to keep measured foreground
    counts verbatim (reference data_handling.py:48-86).
    """

    def collate(items):
        raw = np.stack([it[0] for it in items])
        teacher = np.stack([it[1] for it in items])
        fg = np.stack([it[2] for it in items]).astype(bool)
        target = np.where(fg, raw, teacher) if preserve_foreground else teacher
        x = transform.forward(raw.astype(np.float32))
        y = transform.forward(target.astype(np.float32))
        return _to_net(x), _to_net(y), fg[..., None]

    return collate


def make_val_collate(transform):
    """Collate (raw, teacher, raw, fg) items → (x, y, raw_counts, fg)."""

    def collate(items):
        raw = np.stack([it[0] for it in items])
        teacher = np.stack([it[1] for it in items])
        counts = np.stack([it[2] for it in items])
        fg = np.stack([it[3] for it in items]).astype(bool)
        x = transform.forward(raw.astype(np.float32))
        y = transform.forward(teacher.astype(np.float32))
        return _to_net(x), _to_net(y), counts, fg[..., None]

    return collate


def make_count_train_collate(preserve_foreground=False):
    """Count-space collate: stacking only, zero host float math.

    Returns ``(raw_u16, target_u16, fg)`` batches shaped (B, D, H, W, 1);
    the intensity transform runs inside the jitted train step instead
    (the 1-core host otherwise becomes the training bottleneck).
    """

    def collate(items):
        raw = np.stack([it[0] for it in items])
        teacher = np.stack([it[1] for it in items])
        fg = np.stack([it[2] for it in items]).astype(bool)
        target = np.where(fg, raw, teacher) if preserve_foreground else teacher
        return raw[..., None], target[..., None], fg[..., None]

    return collate


def make_count_val_collate():
    """Count-space validation collate → (raw, teacher, raw_counts, fg)."""

    def collate(items):
        raw = np.stack([it[0] for it in items])
        teacher = np.stack([it[1] for it in items])
        counts = np.stack([it[2] for it in items])
        fg = np.stack([it[3] for it in items]).astype(bool)
        return raw[..., None], teacher[..., None], counts, fg[..., None]

    return collate


_WORKER_DATASET = None


def _worker_init(dataset):
    """Pickle the dataset once per worker process, like the reference's
    ``_worker_init`` (reference data_handling.py:1326-1345)."""
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_fetch(indices):
    return [_WORKER_DATASET[int(i)] for i in indices]


class DataLoader:
    """Prefetching batch loader over a map-style dataset.

    Parameters mirror the reference loader where they matter:
    ``shuffle`` + ``seed`` give the deterministic epoch permutation,
    ``prefetch`` bounds the producer queue, ``drop_last=False`` keeps the
    final partial batch (validation semantics, reference
    data_handling.py:1361-1384).

    ``num_workers=0`` (default) uses the in-process producer thread —
    right for this host (1 CPU) and for datasets that generate on
    device. ``num_workers>0`` fans item fetches out to a process pool
    whose workers each unpickle the dataset once (reference
    data_handling.py:1326-1368); batches are collated in the parent in
    submission order, so the stream is deterministic regardless of
    worker timing. The dataset must be picklable in that mode.
    """

    _STOP = object()

    def __init__(self, dataset, batch_size, collate, shuffle=False,
                 seed=0, prefetch=2, drop_last=False, num_workers=0):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.collate = collate
        self.shuffle = shuffle
        self.seed = seed
        self.prefetch = int(prefetch)
        self.drop_last = drop_last
        self.num_workers = int(num_workers)
        self.epoch = 0
        self._pool = None

    def _executor(self):
        if self._pool is None:
            import concurrent.futures as futures

            self._pool = futures.ProcessPoolExecutor(
                max_workers=self.num_workers,
                initializer=_worker_init,
                initargs=(self.dataset,),
            )
        return self._pool

    def close(self):
        """Shut down worker processes (no-op in thread mode)."""
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def set_epoch(self, epoch):
        """Select the epoch whose deterministic shuffle to use."""
        self.epoch = int(epoch)

    def _order(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch])
            )
            return rng.permutation(n)
        return np.arange(n)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self, order):
        for lo in range(0, len(order), self.batch_size):
            idx = order[lo:lo + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield idx

    def _iter_pool(self, order):
        import collections

        pool = self._executor()
        pending = collections.deque()
        batches = self._batches(order)
        in_flight = max(1, self.prefetch) + self.num_workers
        try:
            for idx in batches:
                pending.append(pool.submit(_worker_fetch, list(idx)))
                if len(pending) >= in_flight:
                    yield self.collate(pending.popleft().result())
            while pending:
                yield self.collate(pending.popleft().result())
        finally:
            for f in pending:
                f.cancel()

    def __iter__(self):
        order = self._order()
        if self.num_workers > 0:
            yield from self._iter_pool(order)
            return
        q = queue.Queue(maxsize=max(1, self.prefetch))

        def producer():
            try:
                for lo in range(0, len(order), self.batch_size):
                    idx = order[lo:lo + self.batch_size]
                    if self.drop_last and len(idx) < self.batch_size:
                        break
                    items = [self.dataset[int(i)] for i in idx]
                    q.put(self.collate(items))
                q.put(self._STOP)
            except BaseException as exc:  # forwarded, not swallowed
                q.put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is self._STOP:
                break
            if isinstance(item, BaseException):
                raise item
            yield item


def prefetch_to_device(iterator, size=2):
    """Double-buffer host batches into device HBM.

    Keeps ``size`` batches in flight via ``jax.device_put`` so the next
    transfer overlaps the current step — the TPU analogue of the
    reference's pinned-memory prefetch.
    """
    import collections

    import jax

    buf = collections.deque()

    def _put(batch):
        return jax.tree.map(
            lambda a: jax.device_put(a) if isinstance(
                a, np.ndarray
            ) else a,
            batch,
        )

    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
