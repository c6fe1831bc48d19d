"""Data-layer tests: cache contract, global indexing, loader determinism.

Carries forward the reference's cache-contract and shuffle tests
(reference tests/test_train_bm4dnet.py:44-97 and
tests/test_full_cache_training.py:39-116) against the TPU framework's
data layer.
"""

import os

import numpy as np
import pytest

from exaspim_tpu.data import (
    CachedPatchDataset,
    CachedValidateDataset,
    DataLoader,
    SyntheticPatchDataset,
    load_cache_transform,
    make_synthetic_cache,
    make_train_collate,
    make_val_collate,
    write_cache,
)
from exaspim_tpu.transforms import build_transform

TCFG = {"kind": "linear", "params": {"mn": 0.0, "mx": 4000.0, "clip": 8.0}}


def _make_cache(tmp_path, name, n=5, patch=(4, 4, 4), value_base=0,
                tcfg=TCFG):
    d = os.path.join(tmp_path, name)
    raw = np.stack([
        np.full(patch, value_base + i, dtype=np.uint16) for i in range(n)
    ])
    teacher = raw + 1
    fg = raw % 2 == 0
    write_cache(d, raw, teacher, fg, tcfg)
    return d


def test_cache_contract_missing_file(tmp_path):
    d = _make_cache(tmp_path, "c0")
    os.remove(os.path.join(d, "fg.npy"))
    with pytest.raises(FileNotFoundError):
        CachedPatchDataset(d)


def test_cache_transform_must_agree(tmp_path):
    d0 = _make_cache(tmp_path, "c0")
    d1 = _make_cache(
        tmp_path, "c1", tcfg={"kind": "linear", "params": {"mx": 9.0}}
    )
    with pytest.raises(ValueError):
        load_cache_transform([d0, d1])


def test_global_index_across_dirs(tmp_path):
    d0 = _make_cache(tmp_path, "c0", n=3, value_base=0)
    d1 = _make_cache(tmp_path, "c1", n=4, value_base=100)
    ds = CachedPatchDataset([d0, d1])
    assert len(ds) == 7
    # Index i addresses patch with known constant value.
    for i, expect in enumerate([0, 1, 2, 100, 101, 102, 103]):
        raw, teacher, fg = ds[i]
        assert raw[0, 0, 0] == expect
        assert teacher[0, 0, 0] == expect + 1
    raw_last, _, _ = ds[-1]
    assert raw_last[0, 0, 0] == 103
    with pytest.raises(IndexError):
        ds[7]


def test_validate_dataset_tuple(tmp_path):
    d = _make_cache(tmp_path, "c0")
    ds = CachedValidateDataset(d)
    raw, teacher, counts, fg = ds[0]
    np.testing.assert_array_equal(raw, counts)


def test_shuffle_deterministic_and_epoch_specific(tmp_path):
    d = _make_cache(tmp_path, "c0", n=17, patch=(2, 2, 2))
    ds = CachedPatchDataset(d)
    t = build_transform(TCFG)
    collate = make_train_collate(t)

    def first_values(loader):
        out = []
        for x, y, fg in loader:
            out.extend((x[:, 0, 0, 0, 0] * 4000.0).round().astype(int))
        return out

    la = DataLoader(ds, 4, collate, shuffle=True, seed=7)
    lb = DataLoader(ds, 4, collate, shuffle=True, seed=7)
    a0, b0 = first_values(la), first_values(lb)
    assert a0 == b0                       # reproducible
    assert sorted(a0) == list(range(17))  # complete
    la.set_epoch(1)
    a1 = first_values(la)
    assert a1 != a0                       # epoch-specific
    assert sorted(a1) == list(range(17))


def test_validation_keeps_final_partial_batch(tmp_path):
    d = _make_cache(tmp_path, "c0", n=10, patch=(2, 2, 2))
    ds = CachedValidateDataset(d)
    t = build_transform(TCFG)
    loader = DataLoader(ds, 4, make_val_collate(t))
    sizes = [x.shape[0] for x, y, counts, fg in loader]
    assert sizes == [4, 4, 2]
    assert len(loader) == 3


def test_loader_forwards_producer_exception(tmp_path):
    class Exploding:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            raise RuntimeError("boom")

    t = build_transform(TCFG)
    loader = DataLoader(Exploding(), 2, make_train_collate(t))
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_train_collate_preserve_foreground():
    t = build_transform(TCFG)
    raw = np.full((2, 2, 2), 100, np.uint16)
    teacher = np.full((2, 2, 2), 50, np.uint16)
    fg = np.zeros((2, 2, 2), bool)
    fg[0] = True
    items = [(raw, teacher, fg)]
    x, y, fgb = make_train_collate(t, preserve_foreground=True)(items)
    assert x.shape == (1, 2, 2, 2, 1) and fgb.shape == (1, 2, 2, 2, 1)
    back = t.inverse_float(y[0, ..., 0])
    np.testing.assert_allclose(back[0], 100, atol=0.1)   # fg kept raw
    np.testing.assert_allclose(back[1], 50, atol=0.1)    # bg from teacher
    _, y2, _ = make_train_collate(t, preserve_foreground=False)(items)
    np.testing.assert_allclose(
        t.inverse_float(y2[0, ..., 0]), 50, atol=0.1
    )


def test_synthetic_dataset_deterministic_and_cacheable(tmp_path):
    ds = SyntheticPatchDataset(n=3, patch_shape=(16, 16, 16), seed=5)
    r0a, t0a, f0a = ds[0]
    r0b, _, _ = SyntheticPatchDataset(
        n=3, patch_shape=(16, 16, 16), seed=5
    )[0]
    np.testing.assert_array_equal(r0a, r0b)
    assert r0a.dtype == np.uint16 and f0a.dtype == bool
    assert f0a.any() and not f0a.all()

    d = make_synthetic_cache(
        os.path.join(tmp_path, "syn"), 3, (16, 16, 16), TCFG, seed=5
    )
    cached = CachedPatchDataset(d)
    cr, ct, cf = cached[0]
    np.testing.assert_array_equal(cr, r0a)
    np.testing.assert_array_equal(ct, t0a)
    np.testing.assert_array_equal(cf, f0a)


def test_count_collates_are_stack_only():
    from exaspim_tpu.data import (
        make_count_train_collate,
        make_count_val_collate,
    )

    raw = np.full((2, 2, 2), 100, np.uint16)
    teacher = np.full((2, 2, 2), 50, np.uint16)
    fg = np.zeros((2, 2, 2), bool)
    fg[0] = True
    x, y, fgb = make_count_train_collate(True)([(raw, teacher, fg)])
    assert x.dtype == np.uint16 and y.dtype == np.uint16
    assert y[0, 0, 0, 0, 0] == 100 and y[0, 1, 0, 0, 0] == 50
    x2, y2, counts, fgb2 = make_count_val_collate()(
        [(raw, teacher, raw, fg)]
    )
    np.testing.assert_array_equal(x2[..., 0], counts)


@pytest.mark.slow
def test_count_space_train_step_matches_transform_domain():
    import jax.numpy as jnp

    from exaspim_tpu.models import UNet
    from exaspim_tpu.train import create_train_state, make_train_step

    t = build_transform(TCFG)
    model = UNet(width_multiplier=0.25)
    sa = create_train_state(model, patch_shape=(8, 8, 8), seed=0)
    sb = create_train_state(model, patch_shape=(8, 8, 8), seed=0)
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 3000, (2, 8, 8, 8, 1)).astype(np.uint16)
    teacher = rng.integers(0, 3000, (2, 8, 8, 8, 1)).astype(np.uint16)
    fg = np.zeros(raw.shape, bool)

    host = make_train_step(fg_weight=0.0, donate=False)
    dev = make_train_step(fg_weight=0.0, donate=False, transform=t)
    x = jnp.asarray(t.forward(raw[..., 0].astype(np.float32)))[..., None]
    y = jnp.asarray(
        t.forward(teacher[..., 0].astype(np.float32))
    )[..., None]
    sa, loss_a = host(sa, x, y, jnp.asarray(fg))
    sb, loss_b = dev(
        sb, jnp.asarray(raw), jnp.asarray(teacher), jnp.asarray(fg)
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-5)


class _IndexDataset:
    """Picklable toy dataset for process-pool loader tests."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        base = np.full((2, 2, 2), i, np.float32)
        return base, base + 1, base > 0.5


@pytest.mark.slow
def test_loader_process_pool_matches_thread_mode():
    from exaspim_tpu.data.loader import DataLoader

    def collate(items):
        return np.stack([it[0] for it in items])

    ds = _IndexDataset(13)
    kw = dict(batch_size=4, collate=collate, shuffle=True, seed=3)
    thread_loader = DataLoader(ds, **kw)
    pool_loader = DataLoader(ds, num_workers=2, **kw)
    try:
        for epoch in (0, 1):
            thread_loader.set_epoch(epoch)
            pool_loader.set_epoch(epoch)
            got_t = list(thread_loader)
            got_p = list(pool_loader)
            assert len(got_t) == len(got_p) == 4
            for a, b in zip(got_t, got_p):
                np.testing.assert_array_equal(a, b)
    finally:
        pool_loader.close()


def test_second_phantom_family_distinct_operating_point():
    """Family B (generalization probe) must differ from family A in
    pedestal, intensity ceiling, and PSF sharpness — quality numbers
    quoted on one family say nothing about the other."""
    import numpy as np

    from exaspim_tpu.data.synthetic import (
        neurite_phantom,
        neurite_phantom_b,
        noisy_observation,
    )

    a, fg_a = neurite_phantom((48, 48, 48), n_tubes=6, seed=1)
    b, fg_b = neurite_phantom_b((48, 48, 48), seed=1)
    assert b.min() < a.min()            # lower background pedestal
    assert b.max() < a.max()            # dimmer processes
    assert fg_b.any() and fg_a.any()
    obs = noisy_observation(b, seed=2)
    assert obs.dtype == np.uint16 and obs.shape == b.shape
    # Deterministic in seed.
    b2, _ = neurite_phantom_b((48, 48, 48), seed=1)
    np.testing.assert_array_equal(b, b2)


def test_synthetic_dataset_families_deterministic():
    """SyntheticPatchDataset family selection: 'b' uses the second
    phantom family, 'mix' alternates per index, and every family stays
    deterministic per (seed, index)."""
    import numpy as np

    from exaspim_tpu.data.synthetic import SyntheticPatchDataset

    a = SyntheticPatchDataset(n=4, patch_shape=(16, 16, 16), seed=3)
    b = SyntheticPatchDataset(n=4, patch_shape=(16, 16, 16), seed=3,
                              family="b")
    m = SyntheticPatchDataset(n=4, patch_shape=(16, 16, 16), seed=3,
                              family="mix")
    ra, _ = a.raw_and_fg(0)
    rb, _ = b.raw_and_fg(0)
    assert not np.array_equal(ra, rb)  # families differ
    # mix: even index == family a, odd index == family b
    np.testing.assert_array_equal(m.raw_and_fg(0)[0], ra)
    np.testing.assert_array_equal(m.raw_and_fg(1)[0], b.raw_and_fg(1)[0])
    # deterministic
    np.testing.assert_array_equal(rb, SyntheticPatchDataset(
        n=4, patch_shape=(16, 16, 16), seed=3, family="b"
    ).raw_and_fg(0)[0])
    import pytest

    with pytest.raises(ValueError):
        SyntheticPatchDataset(family="c")
