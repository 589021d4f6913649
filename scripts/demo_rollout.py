"""End-to-end demo: load a scene from a trajdata cache, run the closed-loop
rollout, optionally set a goal/text prompt, and save a PNG + GIF.

Counterpart of the reference demo notebook flow
(reference: prosim_demo/text_prompt_inference.ipynb).

Usage:
    python scripts/demo_rollout.py --cache-dir /path/to/trajdata_cache \
        [--scene 0] [--goal AGENT X Y] [--text "..." --agents 1 2] \
        [--ckpt path] [--out /tmp/demo]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--scene", type=int, default=0)
    ap.add_argument("--env", default="waymo_train")
    ap.add_argument("--goal", nargs=3, type=float, default=None,
                    metavar=("AGENT", "X", "Y"))
    ap.add_argument("--text", default=None)
    ap.add_argument("--agents", nargs="*", type=int, default=[1])
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--out", default="/tmp/prosim_demo")
    ap.add_argument("--opts", nargs="*", default=[])
    args = ap.parse_args()

    from prosim_tpu.config import get_config
    from prosim_tpu.demo.api import InteractiveSim

    cond_types = ["goal"] + (["llm_text_OneText"] if args.text else [])
    cfg = get_config(opts=[
        "DATASET.SOURCE.VAL", f"['{args.env}']",
        "PROMPT.CONDITION.TYPES", str(cond_types),
    ] + list(args.opts))

    sim = InteractiveSim(cfg, args.cache_dir)
    sim.load_scene(args.scene)
    if args.ckpt:
        sim.load_checkpoint(args.ckpt)
    if args.goal is not None:
        sim.set_goal(int(args.goal[0]), (args.goal[1], args.goal[2]))
    if args.text:
        sim.set_text(args.text, args.agents)

    out = sim.rollout()
    os.makedirs(args.out, exist_ok=True)
    png = sim.plot(os.path.join(args.out, f"scene_{args.scene}.png"), out,
                   show_goals=args.goal is not None)
    gif = sim.animate(os.path.join(args.out, f"scene_{args.scene}.gif"), out)
    print(f"wrote {png} and {gif}")


if __name__ == "__main__":
    main()
