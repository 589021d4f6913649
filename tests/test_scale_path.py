"""Scale-path invariants: synthetic-WOMD generation, farm sharding coverage.

The scale evidence run (scripts/scale_evidence.py, docs/evidence/
scale_1k.json) drives the owned raw-data pipeline at 1,000 scenes; these
tests pin its correctness contracts at small scale:
  * womd_synth scenarios survive the full ingest -> cache -> batch path;
  * the farm's deterministic index sharding covers every scene EXACTLY once
    across workers, no matter the worker count (reference farm contract:
    prosim/rollout/distributed_utils.py:95-226 one-scene-one-worker via
    touch-file locks; here worker w takes scenes w, w+W, ...).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from prosim_tpu.config import get_config  # noqa: E402
from prosim_tpu.data import womd_ingest  # noqa: E402
from prosim_tpu.data.dataset import ProSimImitationDataset  # noqa: E402
from prosim_tpu.data.womd_synth import synthesize_shards  # noqa: E402

SMALL = [
    "DATASET.SOURCE.TRAIN", "['waymo_train']",
    "DATASET.SOURCE.ROLLOUT", "['waymo_train']",
    "PROMPT.CONDITION.TYPES", "['goal']",
    "DATASET.FORMAT.MAP.MAX_POINTS", "128",
    "DATASET.FORMAT.PAD.NUM_LANES", "128",
    "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "24",
    "DATASET.FORMAT.PAD.NUM_AGENTS", "16",
    "DATASET.AGENT.SCENE_MAX_AGENT", "16",
]


@pytest.fixture(scope="module")
def synth_cache(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    paths = synthesize_shards(str(root / "shards"), n_scenes=12, n_shards=3,
                              seed=7)
    cache = str(root / "cache")
    summaries = womd_ingest.ingest_shards(paths, cache, "waymo_train")
    assert len(summaries) == 12
    return cache


def test_synth_scenes_format_and_batch(synth_cache):
    cfg = get_config(opts=SMALL)
    ds = ProSimImitationDataset(cfg, "train", synth_cache)
    assert len(ds) > 0
    b = ds.get_scene_batch(0, seed=0, device=False)
    assert bool(np.asarray(b.prompt.mask).any())
    assert np.isfinite(np.asarray(b.init_map.vectors)[
        np.asarray(b.init_map.mask)]).all()


@pytest.mark.parametrize("num_workers", [1, 3, 4, 7])
def test_farm_assignment_covers_each_scene_exactly_once(synth_cache,
                                                        num_workers):
    cfg = get_config(opts=SMALL)
    ds = ProSimImitationDataset(cfg, "rollout", synth_cache)
    n = len(ds)
    assigned = []
    for w in range(num_workers):
        assigned.extend(range(w, n, num_workers))  # runner.py:92 sharding
    assert sorted(assigned) == list(range(n))


def test_farm_outputs_idempotent_names(synth_cache):
    """Two workers never write the same npz; re-running a worker overwrites
    only its own outputs (idempotence contract)."""
    cfg = get_config(opts=SMALL)
    ds = ProSimImitationDataset(cfg, "rollout", synth_cache)
    names = [f"{env}__{scene}.npz" for env, scene, _ in ds.index]
    assert len(set(names)) == len(names)
