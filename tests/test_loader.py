"""Slab-reusing pipelined loader: equality with allocating collate, slab
rewrite safety, pipeline/sequential agreement, and shutdown behavior."""

import os

import jax
import numpy as np
import pytest

from prosim_tpu.config import get_config
from prosim_tpu.data.dataset import ProSimImitationDataset
from prosim_tpu.data.formatter import collate
from prosim_tpu.data.loader import SlabCollator, pipelined_batches, safe_device_put

CACHE = "/root/reference/demo_dataset/trajdata_cache"
HAS_DEMO = os.path.isdir(CACHE)

pytestmark = pytest.mark.skipif(not HAS_DEMO, reason="demo trajdata cache absent")

SMALL = [
    "DATASET.FORMAT.PAD.NUM_LANES", "256",
    "DATASET.FORMAT.MAP.MAX_POINTS", "256",
    "DATASET.DATA_PATHS.CACHE_DIR", CACHE,
    "DATASET.SOURCE.VAL", "['waymo_train']",
    "PROMPT.CONDITION.TYPES", "['goal', 'drag_point']",
]


@pytest.fixture(scope="module")
def ds():
    return ProSimImitationDataset(get_config(opts=SMALL), split="val",
                                  cache_dir=CACHE)


def tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_slab_collate_matches_collate(ds):
    singles = [ds.get_scene_batch(i, seed=i, device=False) for i in range(4)]
    want = collate(singles)
    col = SlabCollator(singles[0], batch_size=4)
    got = col.collate(singles, transfer=safe_device_put)
    tree_equal(want, got)
    # shared per-batch constant survives untouched
    np.testing.assert_array_equal(np.asarray(got.io_pairs.t_indices),
                                  np.asarray(want.io_pairs.t_indices))


def test_slab_rewrite_does_not_corrupt_held_batches(ds):
    """Yielded device batches must stay valid after their slab's host buffer
    is rewritten (> num_slabs later batches)."""
    B, K = 2, 2
    probe = [ds.get_scene_batch(0, seed=0, device=False),
             ds.get_scene_batch(1, seed=1, device=False)]
    col = SlabCollator(probe[0], batch_size=B, num_slabs=K)
    held, want = [], []
    for it in range(2 * K + 1):
        singles = [ds.get_scene_batch((it * B + i) % len(ds),
                                      seed=100 + it * B + i, device=False)
                   for i in range(B)]
        want.append(collate(singles))
        held.append(col.collate(singles, transfer=safe_device_put))
    for w, h in zip(want, held):
        tree_equal(w, h)


def test_slab_fallback_on_batch_size_mismatch(ds):
    singles = [ds.get_scene_batch(i, seed=i, device=False) for i in range(3)]
    col = SlabCollator(singles[0], batch_size=4)
    got = col.collate(singles)  # wrong count -> allocating collate
    assert got.init_obs.feat.shape[0] == 3
    tree_equal(collate(singles), got)


def test_pipelined_matches_sequential(ds):
    pairs = [(i % len(ds), 7 + i) for i in range(8)]
    seq = [collate([ds.get_scene_batch(j, seed=s, device=False)
                    for j, s in pairs[k : k + 4]]) for k in (0, 4)]
    piped = list(pipelined_batches(
        lambda j, s: ds.get_scene_batch(j, seed=s, device=False),
        pairs, batch_size=4, num_workers=1, prefetch=2))
    assert len(piped) == 2
    for w, h in zip(seq, piped):
        tree_equal(w, h)


def test_pipelined_yields_trailing_partial_group(ds):
    # 7 scenes, batch 4: one full slab batch + one partial batch of 3
    # (routed through the allocating formatter.collate fallback)
    pairs = [(i % len(ds), i) for i in range(7)]
    out = list(pipelined_batches(
        lambda j, s: ds.get_scene_batch(j, seed=s, device=False),
        pairs, batch_size=4))
    assert len(out) == 2
    assert out[0].prompt.mask.shape[0] == 4
    assert out[1].prompt.mask.shape[0] == 3


def test_pipelined_drop_last_drops_partial(ds):
    pairs = [(i % len(ds), i) for i in range(7)]
    out = list(pipelined_batches(
        lambda j, s: ds.get_scene_batch(j, seed=s, device=False),
        pairs, batch_size=4, drop_last=True))
    assert len(out) == 1


def test_pipelined_consumer_break_shuts_down(ds):
    pairs = [(i % len(ds), i) for i in range(64)]
    gen = pipelined_batches(
        lambda j, s: ds.get_scene_batch(j, seed=s, device=False),
        pairs, batch_size=4, prefetch=1)
    next(gen)
    gen.close()  # must not hang (producer observes stop flag)


def test_pipelined_propagates_worker_error(ds):
    def boom(j, s):
        if s >= 4:
            raise RuntimeError("scene exploded")
        return ds.get_scene_batch(j, seed=s, device=False)

    gen = pipelined_batches(boom, [(i % len(ds), i) for i in range(8)],
                            batch_size=4)
    next(gen)
    with pytest.raises(RuntimeError, match="scene exploded"):
        next(gen)


def test_dataset_batches_paths_agree(ds):
    a = list(ds.batches(4, shuffle=True, seed=3, num_workers=0))
    b = list(ds.batches(4, shuffle=True, seed=3, num_workers=1))
    assert len(a) == len(b) == 4
    for w, h in zip(a, b):
        tree_equal(w, h)


def test_format_cache_bit_identical(ds):
    """The per-scene formatted-base cache must be invisible: a fresh dataset
    (cold cache) and one with the cache disabled produce bit-identical
    batches for the same (idx, seed), including sampled conditions."""
    cfg = get_config(opts=SMALL)
    warm = ProSimImitationDataset(cfg, split="val", cache_dir=CACHE)
    cold = ProSimImitationDataset(cfg, split="val", cache_dir=CACHE)
    cold._fmt_cache_cap = 0  # never caches
    for idx, seed in [(0, 5), (0, 6), (1, 5), (0, 5)]:
        a = warm.get_scene_batch(idx, seed=seed, device=False)
        b = cold.get_scene_batch(idx, seed=seed, device=False)
        tree_equal(a, b)
    assert len(warm._fmt_cache) == 2 and not cold._fmt_cache


def test_packed_transfer_matches_device_put(ds):
    """PackedTransfer (single-buffer ship + on-device unpack) must be
    value- and dtype-identical to plain device_put, fall back on
    shape-mismatched trees, and stay correct across buffer reuse."""
    from prosim_tpu.data.loader import PackedTransfer

    singles = [ds.get_scene_batch(i, seed=i, device=False) for i in range(4)]
    col = SlabCollator(singles[0], 4)
    host = col.collate(singles, transfer=None)
    pt = PackedTransfer(host, num_bufs=2)

    ref = jax.tree.map(np.asarray, safe_device_put(host))
    # 3 calls > num_bufs exercises in-flight blocking + buffer reuse
    for seed0 in (10, 20, 30):
        singles = [ds.get_scene_batch(i, seed=seed0 + i, device=False)
                   for i in range(4)]
        host = col.collate(singles, transfer=None)
        ref = jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, host)
        out = pt(host)
        got = jax.tree.map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        la, lb = jax.tree.leaves(ref), jax.tree.leaves(got)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            xx = np.asarray(x)
            if xx.dtype == np.int64:
                xx = xx.astype(np.int32)
            if xx.dtype == np.float64:
                xx = xx.astype(np.float32)
            np.testing.assert_array_equal(xx, np.asarray(y))

    # partial batch (3 scenes) -> structure matches but shapes differ ->
    # fallback path, still correct
    part = collate(singles[:3])
    out = pt(part)
    tree_equal(jax.tree.map(
        lambda x: np.asarray(x).astype(np.int32)
        if np.asarray(x).dtype == np.int64 else x, part), out)


def test_packed_transfer_dtype_mismatch_falls_back():
    """A leaf arriving with a different (post-narrowing) dtype than the probe
    must route through safe_device_put, not be astype()-value-converted."""
    from prosim_tpu.data.loader import PackedTransfer

    probe = {"a": np.arange(6, dtype=np.int32).reshape(2, 3),
             "b": np.ones((2, 2), np.float32)}
    pt = PackedTransfer(probe)
    assert pt.matches(probe)
    # int64 narrows to the probe's int32: still a match
    assert pt.matches({"a": np.arange(6, dtype=np.int64).reshape(2, 3),
                       "b": np.ones((2, 2), np.float32)})
    # float data in the int slot: NOT a match (would value-convert)
    bad = {"a": np.linspace(0, 1, 6, dtype=np.float32).reshape(2, 3),
           "b": np.ones((2, 2), np.float32)}
    assert not pt.matches(bad)
    out = pt(bad)  # falls back to safe_device_put, values preserved
    np.testing.assert_allclose(np.asarray(out["a"]), bad["a"])
