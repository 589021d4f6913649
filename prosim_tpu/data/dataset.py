"""Dataset: trajdata cache -> padded SceneBatch stream.

Equivalent of the reference's ProSimDataset/ProSimImitationDataset
(reference: prosim/dataset/{basic,imitation}.py) without the trajdata
dependency: scenes are read straight from the cache, formatted host-side into
fixed-shape arrays, and collated into device batches.

Scene/ts enumeration follows the reference: one element per (scene, scene_ts)
with scene_ts fixed by ROLLOUT.POLICY.POLICY_START_FRAME for the standard
imitation setup, scene-list filtering and subsampling by split.
"""

import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import SceneBatch
from prosim_tpu.data.conditions import ConditionGenerator
from prosim_tpu.data.formatter import collate, format_scene
from prosim_tpu.data.trajdata_cache import SceneData, list_scenes, load_scene


@registry.register_dataset(name="prosim_imitation")
class ProSimImitationDataset:
    def __init__(self, config, split: str = "train",
                 cache_dir: Optional[str] = None):
        self.config = config
        self.split = split
        self.cache_dir = cache_dir or config.DATASET.DATA_PATHS.CACHE_DIR
        self.envs = list(config.DATASET.SOURCE[split.upper()])
        self.cond_gen = ConditionGenerator(config, split)
        self.scene_ts = config.ROLLOUT.POLICY.POLICY_START_FRAME

        self.index: List[Tuple[str, str, int]] = []
        for env in self.envs:
            env_dir = os.path.join(self.cache_dir, env)
            if not os.path.isdir(env_dir):
                continue
            for scene_name in self._filter_scenes(list_scenes(self.cache_dir, env)):
                self.index.append((env, scene_name, self.scene_ts))

        rate = config.DATASET.SCENE.SAMPLE_RATE[split.upper()]
        if rate > 1:
            self.index = self.index[::rate]
        self._scene_cache = {}
        # formatted-base cache: format_scene output is a pure function of
        # (scene, ts, split) whenever target-agent subsampling doesn't fire
        # (meta["seed_dependent"]); only condition sampling varies per seed,
        # so re-visiting a scene (every epoch / bench iteration) pays only
        # condition generation. ~5 MB/scene at demo padding; capped FIFO.
        self._fmt_cache = {}
        self._fmt_cache_cap = 64
        import threading

        self._cache_lock = threading.Lock()

    def _filter_scenes(self, scenes: Sequence[str]) -> List[str]:
        mode = self.config.DATASET.DATA_LIST.MODE
        if mode == "all":
            return list(scenes)
        list_path = self.config.DATASET.DATA_LIST[self.split.upper()]
        if not list_path or not os.path.exists(list_path):
            return list(scenes)
        with open(list_path) as f:
            wanted = {l.strip() for l in f if l.strip()}
        return [s for s in scenes if s in wanted]

    def __len__(self):
        return len(self.index)

    def _load(self, env: str, scene_name: str) -> SceneData:
        key = (env, scene_name)
        with self._cache_lock:
            cached = self._scene_cache.get(key)
        if cached is not None:
            return cached
        scene = load_scene(self.cache_dir, env, scene_name)
        with self._cache_lock:
            if len(self._scene_cache) > 32:
                self._scene_cache.clear()
            self._scene_cache[key] = scene
        return scene

    def get_scene_batch(self, idx: int, seed: Optional[int] = None,
                        device: bool = True) -> SceneBatch:
        """Format one scene. device=False keeps every leaf a host numpy
        array so worker threads never touch the device; `collate` then does
        one transfer per leaf for the whole batch (through a remote-TPU
        tunnel, per-scene transfers serialize against compute)."""
        env, scene_name, ts = self.index[idx]
        rng = np.random.default_rng(seed if seed is not None else idx)
        scene = self._load(env, scene_name)
        fkey = (env, scene_name, ts)
        with self._cache_lock:
            cached = self._fmt_cache.get(fkey)
        if cached is not None:
            # rng untouched by the cached format (no draw happened), so the
            # condition sampling below sees the exact rng state of the
            # uncached path — cached and uncached batches are bit-identical
            batch, meta = cached
        else:
            meta = {}
            batch = format_scene(scene, self.config, ts, self.split, rng,
                                 out_meta=meta)
            if not meta.get("seed_dependent") and self._fmt_cache_cap > 0:
                with self._cache_lock:
                    while len(self._fmt_cache) >= self._fmt_cache_cap:
                        self._fmt_cache.pop(next(iter(self._fmt_cache)))
                    self._fmt_cache[fkey] = (batch, meta)

        if self.cond_gen.types:
            conds = self.cond_gen.generate(
                scene, batch, ts,
                agent_names_by_slot=meta.get("target_names", []),
                rng=rng,
            )
            batch = batch.replace(conditions=conds)

        if not device:
            return batch
        import jax
        import jax.numpy as jnp

        return jax.tree.map(jnp.asarray, batch)

    def batches(self, batch_size: int, shuffle: bool = False,
                seed: int = 0, drop_last: bool = True,
                num_workers: int = 0, prefetch: int = 2,
                transfer="device") -> Iterator[SceneBatch]:
        """Stream collated device batches.

        With num_workers > 0, one pipeline thread formats + slab-collates +
        transfers up to `prefetch` batches ahead of the consumer — the
        equivalent of the reference DataLoader's worker processes + prefetch
        (reference: prosim/trainer.py:182-196 NUM_WORKERS wiring), redesigned
        for the TPU host: see `prosim_tpu/data/loader.py`. num_workers > 1
        additionally fans per-scene formatting over an inner thread pool
        (useful only on many-core hosts). `transfer` is applied to each host
        batch inside the pipeline ("device" = device_put; pass e.g. a
        mesh-sharded put for multi-chip training).
        """
        from prosim_tpu.data.loader import SlabCollator, pipelined_batches

        order = np.arange(len(self.index))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n_keep = len(order) - (len(order) % batch_size if drop_last else 0)
        pairs = [(int(j), int(j)) for j in order[:n_keep]]

        if num_workers <= 0:
            from prosim_tpu.data.loader import safe_device_put

            xfer = safe_device_put if transfer == "device" else transfer
            collator = None
            for i in range(0, len(pairs), batch_size):
                singles = [self.get_scene_batch(j, seed=s, device=False)
                           for j, s in pairs[i : i + batch_size]]
                if len(singles) < batch_size:
                    yield collate(singles)
                    continue
                if collator is None:
                    collator = SlabCollator(singles[0], batch_size)
                yield collator.collate(singles, xfer)
            return

        yield from pipelined_batches(
            lambda j, s: self.get_scene_batch(j, seed=s, device=False),
            pairs, batch_size, transfer=transfer,
            num_workers=num_workers, prefetch=prefetch,
        )


@registry.register_dataset(name="prosim")
class ProSimDataset(ProSimImitationDataset):
    """Base dataset registry entry (reference: prosim/dataset/basic.py:48).

    The reference's agent-centric variant differs only data-side (one element
    per agent instead of per scene); the scene-centric padded formatting here
    covers both training modes, so this is the same pipeline under the
    reference's other registered name."""
