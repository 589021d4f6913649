"""Build (and optionally execute) the demo notebook.

The notebook mirrors the reference's interactive acceptance test
(reference: prosim_demo/text_prompt_inference.ipynb): load demo scenes from a
trajdata cache, run unconditional / goal / route-sketch / text-prompted
closed-loop rollouts, and visualize each.

Usage:
    python scripts/build_demo_notebook.py [--execute] [--cache-dir DIR]
"""

import argparse
import os
import sys

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MD = [
    # 0
    """# prosim_tpu: promptable closed-loop traffic simulation

This notebook mirrors the reference ProSim demo
(`prosim_demo/text_prompt_inference.ipynb`): every agent in a Waymo scene is
controlled in closed loop for 8 s, and individual agents can be prompted with
**goal points**, **route sketches**, and **natural-language text**.

It runs the flagship demo architecture (6-layer encoders, 128-d hidden,
anchor policy head) on scenes read directly from a trajdata cache, with
weights trained on this cache by `scripts/train_demo_evidence.py` (400
steps on one TPU chip; loaded below when present, random init otherwise).
To reproduce the released reference behavior instead, convert the reference
checkpoint with `prosim_tpu.utils.checkpoint_convert` and pass it to
`sim.load_checkpoint(...)`.""",
    # 1
    """## Unconditional closed-loop rollout

All agents are driven by the policy; non-policy agents replay their logged
futures. The whole 80-step rollout is ONE compiled `jax.lax.scan` -- there is
no per-step host round-trip.""",
    # 2
    """## Goal-point prompting

Prompt one agent with a goal in its local frame at t = 0 (red star). The goal
condition is encoded and fused into that agent's policy embedding by the GNN
condition attention.""",
    # 3
    """## Route-sketch prompting

Drag-point prompts are a sequence of rough waypoints (a "sketch" of the
desired route), encoded by a PointNet over the points.""",
    # 4
    """## Text prompting

Language control goes through a JAX Llama3 (RoPE/GQA/SwiGLU) text encoder:
prompt tokens are projected into the LLM embedding space, `<Ai>` agent tokens
are replaced by the referenced agents' policy embeddings, and the LLM's last
hidden state at each agent-token position is projected back and residual-added
onto the agent's condition embedding.

Without `...TEXT.LLM.WEIGHTS_PATH` set, a tiny random Llama stands in (the
pipeline is identical; set WEIGHTS_PATH to HF Llama-3-8B-Instruct safetensors
for real language understanding).""",
    # 5
    """## Loading the released checkpoint

```python
sim.load_checkpoint("/path/to/prosim_demo_model.ckpt")   # torch Lightning ckpt
out = sim.rollout()
```

`load_checkpoint` converts the reference Lightning state_dict (including peft
LoRA q/k/v + embedding keys and the text-attn projection MLPs) into this
framework's parameter pytree -- see `prosim_tpu/utils/checkpoint_convert.py`.""",
]

CODE = [
    # 0 setup
    '''%matplotlib inline
import os, sys
sys.path.insert(0, {repo!r})

import jax
# Demo runs on CPU for portability; delete this line to run on TPU.
jax.config.update("jax_platforms", "cpu")

from prosim_tpu.config import get_config
from prosim_tpu.demo.api import InteractiveSim

CACHE_DIR = os.environ.get(
    "PROSIM_DEMO_CACHE", "/root/reference/demo_dataset/trajdata_cache")

config = get_config(os.path.join({repo!r}, "configs/waymo_demo.yaml"), opts=[
    "DATASET.SOURCE.VAL", "['waymo_train']",
    # modest padding so the notebook stays light; production uses 2048/160/128
    "DATASET.FORMAT.MAP.MAX_POINTS", "512",
    "DATASET.FORMAT.PAD.NUM_OBS_AGENTS", "48",
    "DATASET.FORMAT.PAD.NUM_AGENTS", "32",
    "MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM.MAX_TEXT_TOKENS", "64",
])
sim = InteractiveSim(config, CACHE_DIR)
batch = sim.load_scene(0)
# trained weights (scripts/train_demo_evidence.py output); falls back to
# random init when the checkpoint is absent
CKPT = os.environ.get("PROSIM_DEMO_CKPT", os.path.join({repo!r}, "runs/demo_evidence/ckpt_last"))
if os.path.isdir(CKPT):
    sim.load_trainer_checkpoint(CKPT)
    print("loaded trained checkpoint:", CKPT)
print("agents:", int(batch.prompt.mask.sum()),
      "| map tokens:", int(batch.init_map.token_mask.sum()))''',
    # 1 uncond
    '''out = sim.rollout()
print("rollout_traj:", out["rollout_traj"].shape)  # [B, N, 80, 4]
from prosim_tpu.viz.plots import plot_scene
fig = plot_scene(sim.batch, output=out)
fig''',
    # 2 goal
    '''agent = 1
sim.set_goal(agent, (30.0, 0.0))   # 30 m ahead in the agent's frame
out_goal = sim.rollout()
fig = plot_scene(sim.batch, output=out_goal, show_goals=True)
fig''',
    # 3 drag
    '''sim.set_drag_points(agent, [(5.0, 0.0), (15.0, 2.0), (25.0, 6.0), (35.0, 12.0)])
out_drag = sim.rollout()
fig = plot_scene(sim.batch, output=out_drag)
fig''',
    # 4 text
    '''sim.clear_conditions()
sim.set_text("stop moving and wait", agents=[1])
out_text = sim.rollout()
fig = plot_scene(sim.batch, output=out_text)
fig''',
]


def build():
    nb = nbf.v4.new_notebook()
    repo = REPO
    cells = []
    cells.append(nbf.v4.new_markdown_cell(MD[0]))
    cells.append(nbf.v4.new_code_cell(CODE[0].format(repo=repo)))
    cells.append(nbf.v4.new_markdown_cell(MD[1]))
    cells.append(nbf.v4.new_code_cell(CODE[1]))
    cells.append(nbf.v4.new_markdown_cell(MD[2]))
    cells.append(nbf.v4.new_code_cell(CODE[2]))
    cells.append(nbf.v4.new_markdown_cell(MD[3]))
    cells.append(nbf.v4.new_code_cell(CODE[3]))
    cells.append(nbf.v4.new_markdown_cell(MD[4]))
    cells.append(nbf.v4.new_code_cell(CODE[4]))
    cells.append(nbf.v4.new_markdown_cell(MD[5]))
    nb.cells = cells
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"}
    return nb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--execute", action="store_true")
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--out", default=os.path.join(
        REPO, "notebooks", "text_prompt_inference.ipynb"))
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
