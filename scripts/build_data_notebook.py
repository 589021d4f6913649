"""Build (and optionally execute) the dataset walkthrough notebook.

Mirrors the reference's dataset-loading walkthrough notebook
(reference: prosim_demo/load_prosim_instruct_520k.ipynb): open a trajdata
cache, inspect the raw scene, walk the formatted model inputs, derive motion
tags and prompt conditions, and visualize the scene with its prompts.

Usage:
    python scripts/build_data_notebook.py [--execute] [--cache-dir DIR]
"""

import argparse
import os

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MD = [
    # 0
    """# prosim_tpu: dataset walkthrough

This notebook mirrors the reference's dataset walkthrough
(`prosim_demo/load_prosim_instruct_520k.ipynb`) on the TPU-native data layer:
Waymo scenes are read **directly from a trajdata on-disk cache**
(feather dataframes + dill metadata + vectorized-map protobuf - no trajdata
dependency) and formatted into the fixed-shape padded arrays the compiled
model consumes. Conditions (goals, action tags, route sketches, language) are
generated host-side per scene.""",
    # 1
    """## Raw scene data

`load_scene` reads one scene's agent dataframe and metadata. States are
world-frame `[A, T, 8]` (x, y, z, vx, vy, ax, ay, heading) with NaN where an
agent is absent; the map is lane polylines + road edges with traffic-light
status per (lane, timestep).""",
    # 2
    """## Formatted model inputs

`ProSimImitationDataset.get_scene_batch` produces the padded `SceneBatch`
the model consumes (reference contract: dataset/format_utils.py:689-815):

* `init_map`  - per-lane sym-coord polyline features
* `init_obs`  - per-agent relative history (state + extent + type + time)
* `prompt`    - agent-status prompt features (vel, extent, type one-hot)
* `io_pairs`  - per-replan-step targets/goals/positions/masks
* `fut_obs`   - logged future observations for the hybrid log-replay loop""",
    # 3
    """## Motion tags

The reference sources action tags from its `prosim_instruct_520k` release;
this framework additionally ships a self-contained deriver that computes
unary tags (and pair tags) from the cached trajectories, so tag prompting
works on any cache. Interval post-processing (merge / min-duration /
conflict resolution) is parity-tested against the reference's
`motion_tag_utils`.""",
    # 4
    """## Prompt conditions and captions

`ConditionGenerator` builds each configured condition type, samples rows,
and applies hard/soft priority masking across types (text outranks tags
outranks goals outranks sketches, as in the reference defaults). Captions
are human-readable strings for visualization.""",
    # 5
    """## Scene + prompt visualization""",
    # 6
    """## Using the prosim_instruct_520k release

When the released texts/tags are on disk, point the config at them and the
generator uses real GPT-labeled data instead of the built-in deriver:

```python
config = get_config(opts=[
    "PROMPT.CONDITION.LLM_TEXT.FOLDER.VAL", "/data/520k/val_texts",
    "PROMPT.CONDITION.LLM_TEXT.IDS_PKL.VAL", "/data/520k/waymo_val_IDs.pkl",
    "PROMPT.CONDITION.TYPES", "['llm_text_OneText']",
])
```

Scene lookup is by rounded ego-(x, y) at t=0 exactly like the reference
(`data_utils.py:626-642`), and agent mentions `<name>` are rewritten to
`<Ai>` slot tokens.""",
]

CODE = [
    # 0 setup
    '''import os, sys
sys.path.insert(0, {repo!r})

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")  # walkthrough runs anywhere

from prosim_tpu.config import get_config

CACHE_DIR = os.environ.get(
    "PROSIM_DEMO_CACHE", "/root/reference/demo_dataset/trajdata_cache")

config = get_config(opts=[
    "DATASET.SOURCE.VAL", "['waymo_train']",
    "DATASET.FORMAT.MAP.MAX_POINTS", "512",
    "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "48",
    "DATASET.FORMAT.PAD.NUM_AGENTS", "32",
    "PROMPT.CONDITION.TYPES",
    "['goal', 'v_action_tag', 'v2v_tag', 'drag_point', 'motion_tag_OneText']",
    "PROMPT.CONDITION.USE_PRIORITY_MASK", "True",
    "PROMPT.CONDITION.USE_SOFT_PRIORITY", "True",
])''',
    # 1 raw scene
    '''from prosim_tpu.data.trajdata_cache import list_scenes, load_scene

env = "waymo_train"
scenes = list_scenes(CACHE_DIR, env)
print("scenes in cache:", scenes)

scene = load_scene(CACHE_DIR, env, scenes[0])
print(f"scene {scene.name} @ {scene.location}:")
print(f"  {len(scene.agent_names)} agents x {scene.length} steps")
print(f"  ego = {scene.agent_names[scene.ego_index]}")
print(f"  lanes: {len(scene.map.lanes)}")
valid_frac = float(scene.valid.mean())
print(f"  valid fraction: {valid_frac:.2f}")''',
    # 2 formatted batch
    '''from prosim_tpu.data.dataset import ProSimImitationDataset

ds = ProSimImitationDataset(config, "val", CACHE_DIR)
batch = ds.get_scene_batch(0)

def show(name, x):
    arr = np.asarray(x)
    print(f"  {name:<28s} {str(arr.shape):<22s} {arr.dtype}")

print("SceneBatch:")
show("init_map.vectors", batch.init_map.vectors)
show("init_map.mask", batch.init_map.mask)
show("init_obs.feat", batch.init_obs.feat)
show("prompt.feat", batch.prompt.feat)
show("io_pairs.tgt", batch.io_pairs.tgt)
show("io_pairs.goal", batch.io_pairs.goal)
show("fut_obs.feat", batch.fut_obs.feat)
print("conditions:", sorted(batch.conditions.keys()))''',
    # 3 motion tags
    '''from prosim_tpu.data.motion_tags import (
    derive_motion_tags, derive_v2v_tags, process_tags)

tags = derive_motion_tags(scene.states, scene.valid, scene.agent_names)
tags += derive_v2v_tags(scene.states, scene.valid, scene.agent_names)
tags = process_tags(tags, tolerance=10, min_duration=10)
print(f"{len(tags)} tags after processing; first 12:")
for t in tags[:12]:
    who = " -> ".join(t.agents)
    print(f"  [{t.interval[0]:3d},{t.interval[1]:3d}] {t.tag:<16s} {who}")''',
    # 4 conditions + captions
    '''from prosim_tpu.data.captions import batch_caption

for ctype, cond in batch.conditions.items():
    pm = np.asarray(cond["prompt_mask"] if isinstance(cond, dict)
                    else cond.prompt_mask)[0]
    print(f"{ctype:<22s} covers {int(pm.sum()):2d} agents")

print()
print(batch_caption(
    {k: v for k, v in batch.conditions.items() if not isinstance(v, dict)}))''',
    # 5 viz
    '''%matplotlib inline
import matplotlib.pyplot as plt
from prosim_tpu.viz.plots import plot_batch_prompts, plot_full_map

fig, axes = plt.subplots(1, 2, figsize=(14, 6))
plot_full_map(scene, ax=axes[0])
axes[0].set_title("full vector map")
plot_batch_prompts(batch, ax=axes[1])
axes[1].set_title("model-input crop + prompts")
fig.tight_layout()
fig''',
]


def build():
    nb = nbf.v4.new_notebook()
    cells = [
        nbf.v4.new_markdown_cell(MD[0]),
        nbf.v4.new_code_cell(CODE[0].format(repo=REPO)),
        nbf.v4.new_markdown_cell(MD[1]),
        nbf.v4.new_code_cell(CODE[1]),
        nbf.v4.new_markdown_cell(MD[2]),
        nbf.v4.new_code_cell(CODE[2]),
        nbf.v4.new_markdown_cell(MD[3]),
        nbf.v4.new_code_cell(CODE[3]),
        nbf.v4.new_markdown_cell(MD[4]),
        nbf.v4.new_code_cell(CODE[4]),
        nbf.v4.new_markdown_cell(MD[5]),
        nbf.v4.new_code_cell(CODE[5]),
        nbf.v4.new_markdown_cell(MD[6]),
    ]
    nb.cells = cells
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--out", default=os.path.join(
        REPO, "notebooks", "dataset_walkthrough.ipynb"))
    args = ap.parse_args()

    nb = build()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    if args.execute:
        from nbclient import NotebookClient

        if args.cache_dir:
            os.environ["PROSIM_DEMO_CACHE"] = args.cache_dir
        client = NotebookClient(nb, timeout=1800, kernel_name="python3")
        client.execute()

    with open(args.out, "w") as f:
        nbf.write(nb, f)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
