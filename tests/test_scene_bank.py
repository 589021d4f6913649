"""Device scene bank: banked batches must be bit-identical to the streaming
loader's for the same (idx, seed) stream — the bank is a transport
optimization (scene tensors resident in device memory, only conditions
shipped per batch), never a semantic change."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from prosim_tpu.config import get_config  # noqa: E402
from prosim_tpu.data.dataset import ProSimImitationDataset  # noqa: E402
from prosim_tpu.data.scene_bank import DeviceSceneBank, banked_batches  # noqa: E402

CACHE = "/root/reference/demo_dataset/trajdata_cache"

pytestmark = pytest.mark.skipif(not os.path.isdir(CACHE),
                                reason="demo trajdata cache absent")

SMALL = [
    "DATASET.FORMAT.PAD.NUM_LANES", "256",
    "DATASET.FORMAT.MAP.MAX_POINTS", "256",
    "DATASET.SOURCE.VAL", "['waymo_train']",
    "PROMPT.CONDITION.TYPES",
    "['goal', 'drag_point', 'v_action_tag', 'llm_text_OneText']",
    "PROMPT.CONDITION.SAMPLE_MODE.TRAIN", "fix",
    "PROMPT.CONDITION.SAMPLE_MODE.VAL", "fix",
    "PROMPT.CONDITION.RANDOM_SAMPLE.VAL", "True",
    "PROMPT.CONDITION.SAMPLE_RATE", "1.0",
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


def test_banked_equals_streaming(ds):
    pairs = [(i % len(ds), 100 + i) for i in range(7)]  # 7 scenes, batch 4
    bank = DeviceSceneBank(ds)
    banked = list(banked_batches(
        ds, pairs, batch_size=4, bank=bank))
    assert len(banked) == 2 and banked[1].prompt.mask.shape[0] == 3

    from prosim_tpu.data.formatter import collate

    for bi, lo in enumerate(range(0, 7, 4)):
        expect = collate([ds.get_scene_batch(i, seed=s, device=False)
                          for i, s in pairs[lo:lo + 4]])
        tree_equal(expect, banked[bi])


def test_bank_reuses_rows_across_seeds(ds):
    bank = DeviceSceneBank(ds)
    r1, c1 = bank.sample_conditions(0, seed=1)
    r2, c2 = bank.sample_conditions(0, seed=2)
    assert r1 == r2  # same bank row
    l1 = jax.tree.leaves(c1)
    l2 = jax.tree.leaves(c2)
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(l1, l2)
    ), "different seeds must sample different conditions"


def test_bank_budget_refusal(ds):
    with pytest.raises(ValueError, match="budget"):
        DeviceSceneBank(ds, hbm_budget_bytes=1024)


def test_cond_transport_packed_equals_tree(ds):
    """The packed condition transport (one buffer, one RPC) must produce
    batches bit-identical to per-leaf device_put — it is the bench's default
    transport (VERDICT r4 task 1a) and only a wire-format change."""
    bank = DeviceSceneBank(ds)
    pairs = [(i % len(ds), 900 + i) for i in range(4)]
    rows_conds = [bank.sample_conditions(i, s) for i, s in pairs]
    rows = np.asarray([r for r, _ in rows_conds])
    conds = [c for _, c in rows_conds]

    bank.cond_transport = "tree"
    via_tree = bank.assemble(rows, conds)
    bank.cond_transport = "packed"
    via_packed = bank.assemble(rows, conds)
    tree_equal(via_tree, via_packed)

    ms = bank.measure_cond_transport(
        __import__("prosim_tpu.data.formatter", fromlist=["x"])
        .collate_conditions(conds), reps=1)
    assert set(ms) == {"tree", "packed"} and all(v >= 0 for v in ms.values())
