"""Batch pre-formatting: cache padded SceneBatch arrays to disk.

Equivalent of the reference's create_dataset.py cache-warming CLI
(reference: prosim/create_dataset.py:20-73), upgraded: instead of merely
warming the trajdata cache, this pre-computes the final padded device arrays
so the training input pipeline becomes pure npz reads + collate (no
per-step formatting on the hot path).

    python -m prosim_tpu.data.preformat --cache-dir ... --out-dir ... \
        [--split train] [KEY VALUE ...]
"""

import argparse
import os
import time

import jax
import numpy as np


def flatten_batch(batch) -> dict:
    """SceneBatch -> flat {path: array} dict (text conditions included)."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(batch)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "name", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def save_batch_npz(batch, path: str):
    np.savez_compressed(path, **flatten_batch(batch))


def load_batch_npz(path: str, like):
    """Rebuild a SceneBatch pytree from npz using `like` for structure."""
    d = np.load(path)
    leaves_paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in leaves_paths:
        key = "/".join(str(getattr(q, "key", getattr(q, "name", q))) for q in p)
        leaves.append(d[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def preformat(config, cache_dir: str, out_dir: str, split: str = "train"):
    from prosim_tpu.data.dataset import ProSimImitationDataset

    ds = ProSimImitationDataset(config, split, cache_dir)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    for i in range(len(ds)):
        batch = ds.get_scene_batch(i)
        env, scene_name, ts = ds.index[i]
        save_batch_npz(batch, os.path.join(out_dir, f"{env}__{scene_name}__{ts}.npz"))
    n = len(ds)
    dt = time.time() - t0
    print(f"preformatted {n} scenes in {dt:.1f}s ({n / max(dt, 1e-9):.1f}/s)")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--split", default="train")
    ap.add_argument("--exp-config", default=None)
    ap.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    args = ap.parse_args()

    from prosim_tpu.config import get_config

    config = get_config(args.exp_config, args.opts)
    preformat(config, args.cache_dir, args.out_dir, args.split)


if __name__ == "__main__":
    main()
