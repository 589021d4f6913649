"""Interactive inference API.

User-facing helpers mirroring the reference demo notebooks
(reference: prosim_demo/text_prompt_inference.ipynb cell 1 -
`text_control` / `modify_batch_condition` / plotting):

    sim = InteractiveSim(config, cache_dir)
    sim.load_scene(0)
    sim.set_text("stop moving", agents=[11, 12])       # language control
    sim.set_goal(agent=3, xy=(40.0, 5.0))              # goal-point control
    sim.set_drag_points(agent=5, points=[...])         # route sketch
    sim.set_action_tag(agent=2, tag="LeftTurn")        # action-tag control
    sim.set_v2v_tag(1, 3, "Following")                 # pair-tag control
    out = sim.rollout()                                # closed loop, 8 s
    sim.plot("scene.png", out)
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from prosim_tpu.data.batch import Condition
from prosim_tpu.data.dataset import ProSimImitationDataset
from prosim_tpu.models.prosim import ProSim


class InteractiveSim:
    def __init__(self, config, cache_dir: str, split: str = "val",
                 params=None, rng_seed: int = 0):
        self.config = config
        self.ds = ProSimImitationDataset(config, split, cache_dir)
        self.model = ProSim(config)
        self.rng = jax.random.PRNGKey(rng_seed)
        self.params = params
        self.batch = None
        self._fwd = jax.jit(
            lambda p, b, k: self.model.forward(p, b, "val", k)
        )

    # ------------------------------------------------------------- scenes
    def load_scene(self, idx: int):
        self.batch = self.ds.get_scene_batch(idx)
        if self.params is None:
            self.rng, sub = jax.random.split(self.rng)
            self.params = self.model.init(sub, self.batch)
        return self.batch

    def load_checkpoint(self, path: str):
        """Non-strict load: converted weights are merged into an initialized
        params tree so unmapped modules keep their init values instead of
        leaving missing subtrees that KeyError at apply time (reference loads
        strict=False, models/base.py:141-147)."""
        from prosim_tpu.utils.checkpoint_convert import load_reference_checkpoint

        params, unmapped = load_reference_checkpoint(path)
        if unmapped:
            print(f"note: {len(unmapped)} checkpoint keys not mapped")
        if self.params is None:
            if self.batch is None:
                self.load_scene(0)
        def merge(cur, res):
            if not isinstance(cur, dict):
                return res
            return {
                k: merge(v, res[k]) if k in res else v for k, v in cur.items()
            }

        self.params = merge(self.params, params)

    def load_trainer_checkpoint(self, path: str):
        """Load an orbax checkpoint written by Trainer.save_checkpoint (e.g.
        scripts/train_demo_evidence.py output). Non-strict: leaves absent
        from the checkpoint (stripped frozen LLM body, modules the training
        config didn't build) keep their init values."""
        import os

        import orbax.checkpoint as ocp

        if self.params is None:
            if self.batch is None:
                self.load_scene(0)
        restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))

        def merge(cur, res):
            if not isinstance(cur, dict):
                return res
            return {
                k: merge(v, res[k]) if k in res else v for k, v in cur.items()
            }

        self.params = merge(self.params, restored["params"])

    # ----------------------------------------------------------- controls
    def _num_agents(self):
        return self.batch.prompt.mask.shape[1]

    def _cond_slots(self):
        return self.config.DATASET.FORMAT.PAD.NUM_CONDS

    def set_text(self, text: str, agents: Sequence[int]):
        """Language control: '<Ai>'-reference the given agents
        (reference `text_control`)."""
        from prosim_tpu.models.llm.tokenizer import AGENT_TEMPLATE
        from prosim_tpu.data.text_conditions import build_one_text_condition

        gen = self.ds.cond_gen
        llm_cfg = self.config.MODEL.CONDITION_TRANSFORMER.CONDITION_ENCODER.TEXT.LLM
        if not any(AGENT_TEMPLATE.format(a) in text for a in agents):
            text = " ".join(AGENT_TEMPLATE.format(a) for a in agents) + " " + text
        N = self._num_agents()
        pmask = np.zeros((1, N), bool)
        pmask[0, list(agents)] = True
        tc = build_one_text_condition(
            gen.tokenizer(), [text], pmask, llm_cfg.MAX_TEXT_TOKENS,
            use_prompt_token=llm_cfg.USE_PROMPT_TOKEN,
            agent_token_mode=llm_cfg.AGENT_TOKEN_MODE,
            use_text_prompt_mask=llm_cfg.USE_TEXT_PROMPT_MASK,
            agent_valid=np.asarray(self.batch.prompt.mask),
        )
        conds = dict(self.batch.conditions)
        conds["llm_text_OneText"] = {k: jnp.asarray(v) for k, v in tc.items()}
        self.batch = self.batch.replace(conditions=conds)

    def set_goal(self, agent: int, xy: Tuple[float, float]):
        """Goal-point control: (x, y) in the agent's local frame at t=0."""
        N, C = self._num_agents(), self._cond_slots()
        old = self.batch.conditions.get("goal")
        if old is None:
            feat = np.zeros((1, C, 3), np.float32)
            mask = np.zeros((1, C), bool)
            pidx = -np.ones((1, C, 1), np.int32)
            pmask = np.zeros((1, N), bool)
        else:
            feat = np.asarray(old.feat).copy()
            mask = np.asarray(old.mask).copy()
            pidx = np.asarray(old.prompt_idx).copy()
            pmask = np.asarray(old.prompt_mask).copy()
        slot = int(np.argmin(mask[0])) if not mask[0].all() else 0
        # reuse this agent's row when it already has a goal
        for c in np.nonzero(mask[0])[0]:
            if pidx[0, c, 0] == agent:
                slot = c
                break
        horizon = self.config.ROLLOUT.POLICY.MAX_STEPS
        feat[0, slot] = [xy[0], xy[1], float(horizon)]
        mask[0, slot] = True
        pidx[0, slot, 0] = agent
        pmask[0, agent] = True
        conds = dict(self.batch.conditions)
        conds["goal"] = Condition(
            feat=jnp.asarray(feat), mask=jnp.asarray(mask),
            prompt_idx=jnp.asarray(pidx), prompt_mask=jnp.asarray(pmask),
        )
        self.batch = self.batch.replace(conditions=conds)

    def set_drag_points(self, agent: int, points: Sequence[Tuple[float, float]]):
        """Route-sketch control: waypoints in the agent's local frame."""
        N, C = self._num_agents(), self._cond_slots()
        P = self.config.PROMPT.CONDITION.DRAG_POINT.MAX_POINTS
        old = self.batch.conditions.get("drag_point")
        if old is None:
            feat = np.full((1, C, P * 2), np.nan, np.float32)
            mask = np.zeros((1, C), bool)
            pidx = -np.ones((1, C, 1), np.int32)
            pmask = np.zeros((1, N), bool)
        else:
            feat = np.asarray(old.feat).copy()
            mask = np.asarray(old.mask).copy()
            pidx = np.asarray(old.prompt_idx).copy()
            pmask = np.asarray(old.prompt_mask).copy()
        slot = int(np.argmin(mask[0])) if not mask[0].all() else 0
        pts = np.full((P, 2), np.nan, np.float32)
        pts[: min(len(points), P)] = np.asarray(points)[:P]
        feat[0, slot] = pts.reshape(-1)
        mask[0, slot] = True
        pidx[0, slot, 0] = agent
        pmask[0, agent] = True
        conds = dict(self.batch.conditions)
        conds["drag_point"] = Condition(
            feat=jnp.asarray(feat), mask=jnp.asarray(mask),
            prompt_idx=jnp.asarray(pidx), prompt_mask=jnp.asarray(pmask),
        )
        self.batch = self.batch.replace(conditions=conds)

    def _upsert_rows(self, ctype: str, feat_row: np.ndarray,
                     agents: Sequence[int], pidx_width: int):
        """Insert (or update, when the same agent set already has a row) one
        condition row of `ctype` (reference: the interactive option builders,
        condition_utils.py:796-863)."""
        N, C = self._num_agents(), self._cond_slots()
        old = self.batch.conditions.get(ctype)
        if old is None:
            feat = np.zeros((1, C, len(feat_row)), np.float32)
            mask = np.zeros((1, C), bool)
            pidx = -np.ones((1, C, pidx_width), np.int32)
            pmask = np.zeros((1, N), bool)
        else:
            feat = np.asarray(old.feat).copy()
            mask = np.asarray(old.mask).copy()
            pidx = np.asarray(old.prompt_idx).copy()
            pmask = np.asarray(old.prompt_mask).copy()
        slot = int(np.argmin(mask[0])) if not mask[0].all() else 0
        for c in np.nonzero(mask[0])[0]:
            if (pidx[0, c] == np.asarray(agents)).all():
                slot = c
                break
        feat[0, slot] = feat_row
        mask[0, slot] = True
        pidx[0, slot] = np.asarray(agents, np.int32)
        for a in agents:
            pmask[0, a] = True
        conds = dict(self.batch.conditions)
        conds[ctype] = Condition(
            feat=jnp.asarray(feat), mask=jnp.asarray(mask),
            prompt_idx=jnp.asarray(pidx), prompt_mask=jnp.asarray(pmask),
        )
        self.batch = self.batch.replace(conditions=conds)

    def set_action_tag(self, agent: int, tag: str,
                       interval: Optional[Tuple[int, int]] = None):
        """Action-tag control, e.g. set_action_tag(3, "LeftTurn")
        (reference: v_action_tag_condition_batch_from_option,
        condition_utils.py:825-860). Tags: see VActionTag."""
        from prosim_tpu.data.motion_tags import VActionTag

        if tag not in VActionTag.__members__:
            raise ValueError(
                f"unknown tag {tag!r}; one of {list(VActionTag.__members__)}")
        if interval is None:
            interval = (0, self.config.ROLLOUT.POLICY.MAX_STEPS)
        row = np.asarray(
            [VActionTag[tag].value, interval[0], interval[1]], np.float32)
        self._upsert_rows("v_action_tag", row, [agent], 1)

    def set_v2v_tag(self, agent_a: int, agent_b: int, tag: str,
                    interval: Optional[Tuple[int, int]] = None):
        """Pair-tag control, e.g. set_v2v_tag(3, 7, "Following"): agent_a
        performs `tag` relative to agent_b (reference pair vocabulary,
        motion_tag_utils.py). Tags: see V2VTag."""
        from prosim_tpu.data.motion_tags import V2VTag

        if tag not in V2VTag.__members__:
            raise ValueError(
                f"unknown tag {tag!r}; one of {list(V2VTag.__members__)}")
        if interval is None:
            interval = (0, self.config.ROLLOUT.POLICY.MAX_STEPS)
        row = np.asarray(
            [V2VTag[tag].value, interval[0], interval[1]], np.float32)
        self._upsert_rows("v2v_tag", row, [agent_a, agent_b], 2)

    def clear_conditions(self):
        self.batch = self.batch.replace(conditions={})

    # -------------------------------------------------------------- run
    def rollout(self) -> Dict:
        self.rng, sub = jax.random.split(self.rng)
        return self._fwd(self.params, self.batch, sub)

    def plot(self, path: str, output: Optional[Dict] = None, **kwargs) -> str:
        from prosim_tpu.viz.plots import save_scene_png

        return save_scene_png(self.batch, path, output=output, **kwargs)

    def animate(self, path: str, output: Optional[Dict] = None, **kwargs) -> str:
        """Save a GIF animation of a rollout (runs one if not provided)."""
        from prosim_tpu.viz.plots import save_rollout_gif

        if output is None:
            output = self.rollout()
        return save_rollout_gif(self.batch, output, path, **kwargs)
