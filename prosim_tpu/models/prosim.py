"""ProSim: promptable closed-loop traffic simulation model.

The reference engine (prosim/models/traj_sam.py:13-644) runs its closed loop
as a Python loop with per-step graph rebuilds and string-keyed index plumbing.
Here the whole loop is a single `jax.lax.scan` over replan steps with
fixed-shape padded state:

  carry = (scene tokens, agent traj buffer, agent vel buffer, rng)
  xs    = per-step GT future observations (fut_obs) + step index

Per step (reference semantics traj_sam.py:144-349):
  step_env   - rebuild policy agents' observation history from their own
               rolled-out trajectories, while non-policy agents are replayed
               from logged futures (fut_obs); re-encode and swap the obs
               tokens of the scene (traj_sam.py:205-274).
  decode     - policy attention at current agent positions over scene tokens,
               anchor head -> K-mode 10-step delta chunks (traj_sam.py:178-202).
  step_traj  - sample one of the top-k modes, rotate the chunk into the world
               frame of the agent's last pose, append (traj_sam.py:276-349).
"""

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import SceneBatch, SceneTokens
from prosim_tpu.models.decoder import build_decoder
from prosim_tpu.models.prompt_encoder import build_prompt_encoder
from prosim_tpu.models.scene_encoder import build_scene_encoder
from prosim_tpu.utils.geometry import (
    rel_traj_to_last_step,
    rel_vel_to_last_step,
    rotate_2d,
    wrap_angle,
)
from prosim_tpu.models.policy import build_policy


@registry.register_model(name="prosim_policy_relpe_T_step_temporal_close_loop")
class ProSim:
    """Functional model wrapper: linen submodules + pure apply methods."""

    def __init__(self, config, dtype=jnp.float32):
        self.config = config
        self.dtype = dtype
        self.scene_encoder = build_scene_encoder(config, dtype)
        self.prompt_encoder = build_prompt_encoder(config, dtype)
        self.decoder = build_decoder(config, dtype)
        self.policy = build_policy(config, dtype)

        self.hist_steps = config.DATASET.FORMAT.HISTORY.STEPS
        self.replan = config.ROLLOUT.POLICY.REPLAN_FREQ
        self.top_k = config.ROLLOUT.POLICY.TOP_K
        self.top_k_train = config.ROLLOUT.POLICY.TOP_K_TRAIN
        self.dt = config.DATASET.MOTION.DT
        self.pred_vel = config.MODEL.POLICY.ACT_DECODER.TRAJ.PRED_VEL
        self.pred_gmm = config.MODEL.POLICY.ACT_DECODER.TRAJ.PRED_GMM
        self.bptt = config.MODEL.BPTT
        self.use_condition = len(config.PROMPT.CONDITION.TYPES) > 0
        self.condition_locations = (
            list(config.MODEL.CONDITION_TRANSFORMER.CONDITION_LOCATIONS)
            if self.use_condition
            else []
        )
        self.condition_transformers = {}
        if self.use_condition:
            from prosim_tpu.models.condition.transformer import build_condition_transformer

            for loc in self.condition_locations:
                self.condition_transformers[loc] = build_condition_transformer(config, dtype)

    # ------------------------------------------------------------------ init
    def init(self, rng, batch: SceneBatch) -> Dict[str, Any]:
        """Initialize all submodule params in ONE jitted program: the eager
        per-submodule applies below would otherwise issue hundreds of small
        device dispatches, which dominates startup on a remote-TPU tunnel
        (~minutes for the full-size model vs seconds jitted)."""
        params = jax.jit(self._init_impl)(rng, batch)
        if self.condition_transformers:
            from prosim_tpu.models.condition.transformer import load_text_llm_weights

            params = load_text_llm_weights(self.config, params)
        return params

    def _init_impl(self, rng, batch: SceneBatch) -> Dict[str, Any]:
        r1, r2, r3, r4, r5 = jax.random.split(rng, 5)
        params = {}
        params["scene_encoder"] = self.scene_encoder.init(
            r1, batch.init_obs, batch.init_map
        )["params"]
        scene = self.scene_encoder.apply(
            {"params": params["scene_encoder"]}, batch.init_obs, batch.init_map
        )
        if self.scene_encoder.obs_fusion == "mlp":
            # the fusion MLP only exists on the update_obs path; init it too
            # so the in-scan update doesn't hit missing params
            up = self.scene_encoder.init(
                r1, scene, batch.init_obs.feat, batch.init_obs.mask,
                batch.init_obs.pos, batch.init_obs.ori, method="update_obs",
            )["params"]

            def deep_merge(dst, src):
                for k, v in src.items():
                    if k in dst and isinstance(v, dict):
                        deep_merge(dst[k], v)
                    elif k not in dst:
                        dst[k] = v

            deep_merge(params["scene_encoder"], up)
        params["prompt_encoder"] = self.prompt_encoder.init(r2, batch.prompt)["params"]
        prompt_emb = self.prompt_encoder.apply(
            {"params": params["prompt_encoder"]}, batch.prompt
        )
        params["decoder"] = self.decoder.init(r3, scene, batch.prompt, prompt_emb)["params"]
        policy_emd = self.decoder.apply(
            {"params": params["decoder"]}, scene, batch.prompt, prompt_emb
        )
        policy_emd["goal"] = batch.prompt.goal_point
        params["policy"] = self.policy.init(
            r4,
            policy_emd,
            scene,
            batch.prompt.pos,
            batch.prompt.ori,
            batch.prompt.mask,
            batch.prompt.agent_type,
        )["params"]
        for loc, ct in self.condition_transformers.items():
            params[f"condition_transformer_{loc}"] = ct.init(
                r5, batch.conditions, prompt_emb, batch.prompt
            )["params"]
        return params

    # -------------------------------------------------------------- encoders
    def encode_scene(self, params, batch: SceneBatch, deterministic=True, rng=None) -> SceneTokens:
        return self.scene_encoder.apply(
            {"params": params["scene_encoder"]},
            batch.init_obs,
            batch.init_map,
            deterministic,
            rngs=None if deterministic else {"dropout": rng},
        )

    def encode_prompt(self, params, batch: SceneBatch, deterministic=True):
        prompt_emb = self.prompt_encoder.apply(
            {"params": params["prompt_encoder"]}, batch.prompt
        )
        if "prompt_encoder" in self.condition_locations:
            ct = self.condition_transformers["prompt_encoder"]
            prompt_emb, _ = ct.apply(
                {"params": params["condition_transformer_prompt_encoder"]},
                batch.conditions,
                prompt_emb,
                batch.prompt,
            )
        return prompt_emb

    def generate_policy(self, params, batch: SceneBatch, scene, prompt_emb, deterministic=True, rng=None):
        policy_emd = self.decoder.apply(
            {"params": params["decoder"]}, scene, batch.prompt, prompt_emb, deterministic,
            rngs=None if deterministic else {"dropout": rng},
        )
        policy_emd["goal"] = batch.prompt.goal_point
        prompt_loss_aux = None
        if "policy_decoder" in self.condition_locations:
            ct = self.condition_transformers["policy_decoder"]
            emd, prompt_loss_aux = ct.apply(
                {"params": params["condition_transformer_policy_decoder"]},
                batch.conditions,
                policy_emd["emd"],
                batch.prompt,
                scene=scene,
            )
            policy_emd["emd"] = emd
        return policy_emd, prompt_loss_aux

    # ------------------------------------------------------------ traj state
    def init_agent_trajs(self, batch: SceneBatch, total_steps: int):
        """Seed trajectory buffers from observed history
        (reference: traj_sam.py:597-633)."""
        obs = batch.init_obs
        prompt = batch.prompt
        B, N = prompt.mask.shape
        safe_idx = jnp.maximum(prompt.obs_index, 0)

        hist = jnp.take_along_axis(
            obs.feat[..., :4], safe_idx[..., None, None], axis=1
        )  # [B, N, Th, 4]
        hist = jnp.nan_to_num(hist)
        init_pos = jnp.take_along_axis(obs.pos, safe_idx[..., None], axis=1)
        init_heading = jnp.take_along_axis(obs.ori[..., None], safe_idx[..., None], axis=1)[..., 0]

        # The integrated state stays float32 regardless of MODEL.DTYPE:
        # network compute is bf16 for the MXU, but positions accumulate over
        # 80+ steps and local coordinates reach ~100 m, where bf16's 8-bit
        # mantissa quantizes at ~0.5 m. Central-differenced WOSAC kinematics
        # turn that into +-2.5 m/s speed noise (measured: linear_speed
        # likelihood 0.32 -> 0.15, linear_accel 0.32 -> 0.09 on a log-replay
        # oracle). Inputs are cast to self.dtype at each network boundary.
        traj = jnp.zeros((B, N, total_steps, 4), jnp.float32)
        traj = traj.at[:, :, : self.hist_steps].set(hist.astype(jnp.float32))
        vel = jnp.zeros((B, N, total_steps, 2), jnp.float32)
        if self.pred_vel:
            hv = jnp.take_along_axis(obs.feat[..., 4:6], safe_idx[..., None, None], axis=1)
            vel = vel.at[:, :, : self.hist_steps].set(
                jnp.nan_to_num(hv).astype(jnp.float32))
        return traj, vel, init_pos, init_heading

    # ---------------------------------------------------------------- select
    def select_k_emd(self, policy_emd, batch: SceneBatch, mode: str, rng):
        """Pick 1 of K goal-conditioned policy embeddings
        (reference: traj_sam.py:402-439). Identity when goal heads disabled."""
        if "goal_point" not in policy_emd:
            return policy_emd
        emd = policy_emd["emd"]
        if emd.ndim == 3:
            return policy_emd
        B, N, K, D = emd.shape
        if mode == "train":
            gt_goal = batch.io_pairs.goal[:, 0]  # [B, N, 2]
            dist = jnp.linalg.norm(policy_emd["goal_point"] - gt_goal[:, :, None, :], axis=-1)
            idx = jnp.argmin(dist, axis=-1)
        else:
            k = min(self.top_k, K)
            _, topk_idx = jax.lax.top_k(policy_emd["goal_prob"], k)
            r = jax.random.randint(rng, (B, N), 0, k)
            idx = jnp.take_along_axis(topk_idx, r[..., None], axis=-1)[..., 0]
        policy_emd = dict(policy_emd)
        policy_emd["select_idx"] = idx
        policy_emd["emd"] = jnp.take_along_axis(emd, idx[..., None, None], axis=2)[:, :, 0]
        policy_emd["goal"] = jnp.take_along_axis(
            policy_emd["goal_point"], idx[..., None, None], axis=2
        )[:, :, 0]
        return policy_emd

    # --------------------------------------------------------------- rollout
    def prepare(self, params, batch: SceneBatch, mode: str, rng):
        """Encode scene + prompts and build per-agent policy embeddings
        (the once-per-scene half of the pipeline; M replicas and repeated
        rollouts reuse this)."""
        deterministic = mode != "train"
        rng, r_se, r_dec, sel_rng = jax.random.split(rng, 4)
        scene = self.encode_scene(params, batch, deterministic, r_se)
        prompt_emb = self.encode_prompt(params, batch, deterministic)
        policy_emd, prompt_loss_aux = self.generate_policy(
            params, batch, scene, prompt_emb, deterministic, r_dec
        )
        policy_emd = self.select_k_emd(policy_emd, batch, mode, sel_rng)
        return scene, policy_emd, prompt_loss_aux

    def _remat_policy(self):
        """TRAIN.REMAT_POLICY -> jax.checkpoint policy: None recomputes
        everything, dots_saveable keeps matmul outputs (more HBM, less
        recompute), False disables remat."""
        pol = self.config.TRAIN.REMAT_POLICY
        if pol == "full":
            return None
        if pol == "dots":
            return jax.checkpoint_policies.dots_saveable
        if pol == "none":
            return False
        raise ValueError(f"unknown TRAIN.REMAT_POLICY {pol!r}")

    def forward(self, params, batch: SceneBatch, mode: str, rng):
        """Full closed-loop pass. Returns output dict with stacked per-step
        predictions and final rollout trajectories."""
        rng, prep_rng = jax.random.split(rng)
        prepare = self.prepare
        if mode == "train" and self._remat_policy() is not False:
            # remat the encode/decode stage too: its attention activations
            # otherwise stay resident across the whole scan for backward
            prepare = jax.checkpoint(
                lambda p, b, k: self.prepare(p, b, mode, k),
                policy=self._remat_policy(),
            )
            scene, policy_emd, prompt_loss_aux = prepare(params, batch, prep_rng)
        else:
            scene, policy_emd, prompt_loss_aux = prepare(params, batch, mode, prep_rng)
        return self.rollout_scan(
            params, batch, scene, policy_emd, mode, rng, prompt_loss_aux
        )

    def rollout_scan(self, params, batch: SceneBatch, scene, policy_emd,
                     mode: str, rng, prompt_loss_aux=None):
        """The closed loop itself: lax.scan over replan steps."""
        deterministic = mode != "train"
        R = int(batch.fut_obs.feat.shape[1])
        total = self.hist_steps + R * self.replan
        traj, vel, init_pos, init_heading = self.init_agent_trajs(batch, total)

        prompt = batch.prompt
        Th = self.hist_steps

        type_onehot = jax.nn.one_hot(prompt.agent_type - 1, 3, dtype=self.dtype)
        time_onehot = jnp.eye(Th, dtype=self.dtype)

        def step_env(scene_in, traj, vel, r, cursor, drop_key):
            """Rebuild obs from rolled-out state; returns updated scene."""
            fo_feat = batch.fut_obs.feat[:, r]
            fo_mask = batch.fut_obs.mask[:, r]
            fo_pos = batch.fut_obs.pos[:, r]
            fo_ori = batch.fut_obs.ori[:, r]
            obs_index = batch.fut_obs.obs_index[:, r]  # [B, N]

            # last Th+2 poses / Th+1 velocities of each policy agent
            window = jax.lax.dynamic_slice_in_dim(traj, cursor - Th - 2, Th + 2, axis=2)
            rel = rel_traj_to_last_step(window)  # [B, N, Th+2, 4]
            if self.pred_vel:
                vwin = jax.lax.dynamic_slice_in_dim(vel, cursor - Th - 1, Th + 1, axis=2)
                rel_v = rel_vel_to_last_step(window, vwin)  # [B, N, Th+1, 2]
            else:
                rel_v = jnp.diff(rel[..., :2], axis=-2) / self.dt  # [B, N, Th+1, 2]
            rel_acc = jnp.diff(rel_v, axis=-2) / self.dt  # [B, N, Th, 2]
            vel_acc = jnp.concatenate([rel_v[:, :, 1:], rel_acc], axis=-1)  # [B, N, Th, 4]

            feat_n = jnp.concatenate(
                [
                    rel[:, :, -Th:],
                    vel_acc,
                    jnp.broadcast_to(prompt.extent[:, :, None, :], rel[:, :, -Th:, :2].shape),
                    jnp.broadcast_to(
                        type_onehot[:, :, None, :], (*rel.shape[:2], Th, 3)
                    ),
                    jnp.broadcast_to(time_onehot, (*rel.shape[:2], Th, Th)),
                ],
                axis=-1,
            )  # [B, N, Th, C_obs]

            # NOTE: the traj buffer lives in each agent's init frame; going
            # back to the scene frame requires rotating by init_heading. The
            # reference skips this rotation during rollout (traj_sam.py:213)
            # but applies it in its world conversion (gpu_utils.py:260); the
            # geometrically consistent (rotated) form is the default, the
            # quirk is reproduced under MODEL.PARITY.REFERENCE_STEP_ENV_FRAME
            # for checkpoints trained with the reference semantics.
            pos_n, theta_n = agent_pose(traj, cursor)

            # scatter policy agents into the all-agent obs arrays; invalid
            # slots route out-of-bounds and are dropped
            A = fo_feat.shape[1]
            tgt = jnp.where(prompt.mask & (obs_index >= 0), obs_index, A)
            bidx = jnp.arange(fo_feat.shape[0])[:, None]
            fo_feat = fo_feat.at[bidx, tgt].set(
                feat_n.astype(fo_feat.dtype), mode="drop")
            fo_mask = fo_mask.at[bidx, tgt].set(True, mode="drop")
            fo_pos = fo_pos.at[bidx, tgt].set(
                pos_n.astype(fo_pos.dtype), mode="drop")
            fo_ori = fo_ori.at[bidx, tgt].set(
                theta_n.astype(fo_ori.dtype), mode="drop")

            scene_out = self.scene_encoder.apply(
                {"params": params["scene_encoder"]},
                scene_in,
                fo_feat,
                fo_mask,
                fo_pos,
                fo_ori,
                deterministic,
                method="update_obs",
                rngs=None if deterministic else {"dropout": drop_key},
            )
            return scene_out, (pos_n, theta_n)

        ref_frame_quirk = self.config.MODEL.PARITY.REFERENCE_STEP_ENV_FRAME

        def agent_pose(traj, cursor):
            last = jax.lax.dynamic_index_in_dim(traj, cursor - 1, axis=2, keepdims=False)
            if ref_frame_quirk:
                # reference: traj_sam.py:211-212 (no init_heading rotation)
                pos = init_pos + last[..., :2]
            else:
                pos = init_pos + rotate_2d(last[..., :2], init_heading)
            theta = wrap_angle(jnp.arctan2(last[..., 2], last[..., 3]) + init_heading)
            return pos, theta

        rollout_k = self.top_k_train if mode == "train" else self.top_k

        def body(carry, xs):
            scene_tokens, scene_pos, scene_ori, scene_mask, traj, vel, _key0 = carry
            r = xs
            cursor = Th + r * self.replan
            scene_r = SceneTokens(
                tokens=scene_tokens, pos=scene_pos, ori=scene_ori, mask=scene_mask,
                num_map=scene.num_map,
            )

            key, env_key, pol_key = jax.random.split(carry[-1], 3)
            pos_now, theta_now = agent_pose(traj, cursor)

            def do_update(_):
                s, _ = step_env(scene_r, traj, vel, r, cursor, env_key)
                return s.tokens, s.pos, s.ori, s.mask

            def no_update(_):
                return scene_r.tokens, scene_r.pos, scene_r.ori, scene_r.mask

            tok, sp, so, sm = jax.lax.cond(r > 0, do_update, no_update, operand=None)
            scene_r = SceneTokens(tokens=tok, pos=sp, ori=so, mask=sm, num_map=scene.num_map)

            out = self.policy.apply(
                {"params": params["policy"]},
                policy_emd,
                scene_r,
                pos_now.astype(self.dtype),
                theta_now.astype(self.dtype),
                prompt.mask,
                prompt.agent_type,
                deterministic,
                rngs=None if deterministic else {"dropout": pol_key},
            )

            # mode selection among top-k (reference: traj_sam.py:301-313)
            key, sub = jax.random.split(key)
            probs = out["motion_prob"]  # [B, N, K]
            K = probs.shape[-1]
            k_eff = min(rollout_k, K)
            if k_eff == 1:
                # uniform choice over top-1 == argmax; skip top_k + randint
                # (the randint alone profiled at ~4 ms/step at K=1). The key
                # split above stays so RNG streams are bit-identical.
                sel = jnp.argmax(probs, axis=-1)  # [B, N]
            else:
                _, topk_idx = jax.lax.top_k(probs, k_eff)
                rand = jax.random.randint(sub, probs.shape[:2], 0, k_eff)
                sel = jnp.take_along_axis(topk_idx, rand[..., None], axis=-1)[..., 0]  # [B, N]

            chunk = jnp.take_along_axis(
                out["motion_pred"], sel[..., None, None, None], axis=2
            )[:, :, 0, : self.replan]  # [B, N, S, D]
            if not self.bptt:
                chunk = jax.lax.stop_gradient(chunk)

            chunk = chunk.astype(jnp.float32)  # integrate state in f32
            last = jax.lax.dynamic_index_in_dim(traj, cursor - 1, axis=2, keepdims=False)
            last_theta = jnp.arctan2(last[..., 2], last[..., 3])  # [B, N]
            xy = rotate_2d(chunk[..., :2], last_theta[..., None]) + last[..., None, :2]
            th = wrap_angle(last_theta[..., None] + chunk[..., 2])
            new_seg = jnp.concatenate(
                [xy, jnp.sin(th)[..., None], jnp.cos(th)[..., None]], axis=-1
            )
            new_seg = jnp.where(prompt.mask[..., None, None], new_seg, 0.0)
            traj = jax.lax.dynamic_update_slice_in_dim(traj, new_seg, cursor, axis=2)

            if self.pred_vel:
                vch = chunk[..., 6:8] if self.pred_gmm else chunk[..., 3:5]
                vseg = rotate_2d(vch, last_theta[..., None])
                vseg = jnp.where(prompt.mask[..., None, None], vseg, 0.0)
                vel = jax.lax.dynamic_update_slice_in_dim(vel, vseg, cursor, axis=2)

            carry = (scene_r.tokens, scene_r.pos, scene_r.ori, scene_r.mask, traj, vel, key)
            ys = {"motion_pred": out["motion_pred"], "motion_prob": out["motion_prob"]}
            if "reconst_pred" in out:
                ys["reconst_pred"] = out["reconst_pred"]
            return carry, ys

        if mode == "train" and self._remat_policy() is not False:
            # rematerialize the step in backward: storing every step's
            # attention activations for the whole scan needs ~50 GB HBM at
            # batch 8; recomputing them trades ~1 extra forward for fitting
            # training on one chip
            body = jax.checkpoint(body, policy=self._remat_policy())

        carry0 = (scene.tokens, scene.pos, scene.ori, scene.mask, traj, vel, rng)
        carry, ys = jax.lax.scan(body, carry0, jnp.arange(R))
        _, _, _, _, traj, vel, _ = carry

        output = {
            # per-step predictions stacked on a leading replan axis [R, B, N, ...]
            "motion_pred": ys["motion_pred"],
            "motion_prob": ys["motion_prob"],
            # final rollout (local frame of each agent's obs origin)
            "rollout_traj": traj[:, :, Th:],
            "rollout_vel": vel[:, :, Th:],
            "init_pos": init_pos,
            "init_heading": init_heading,
            "agent_mask": prompt.mask,
        }
        if "reconst_pred" in ys:
            output["reconst_pred"] = ys["reconst_pred"]
        if prompt_loss_aux is not None:
            output["prompt_loss_aux"] = prompt_loss_aux
        for key_ in ("goal_prob", "goal_point", "select_idx", "goal"):
            if key_ in policy_emd:
                output[key_] = policy_emd[key_]
        return output
