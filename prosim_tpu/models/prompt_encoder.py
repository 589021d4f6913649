"""Agent-status prompt encoder.

The prompt of each policy agent is its initial status: velocity rotated into
the agent frame, extent, and type one-hot, mapped through an MLP
(reference: prosim/models/prompt_encoder/base.py:6-50; feature construction
prosim/dataset/prompt_utils.py:111-150 happens data-side in this framework).
"""

import flax.linen as nn
import jax.numpy as jnp

from prosim_tpu.core.registry import registry
from prosim_tpu.data.batch import Prompt
from prosim_tpu.ops.mlp import MLP


@registry.register_prompt_encoder(name="agent_status")
class AgentStatusPromptEncoder(nn.Module):
    hidden_dim: int
    in_dim: int = 7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prompt: Prompt):
        emb = MLP(
            [self.in_dim, self.hidden_dim, self.hidden_dim],
            ret_before_act=True,
            dtype=self.dtype,
            name="state_encoder",
        )(prompt.feat)
        return jnp.where(prompt.mask[..., None], emb, 0.0)


def build_prompt_encoder(config, dtype=jnp.float32) -> AgentStatusPromptEncoder:
    in_dim = 0
    status = config.PROMPT.AGENT_STATUS
    if status.USE_VEL:
        in_dim += 2
    if status.USE_EXTEND:
        in_dim += 2
    if status.USE_AGENT_TYPE:
        in_dim += 3
    return AgentStatusPromptEncoder(
        hidden_dim=config.MODEL.HIDDEN_DIM, in_dim=in_dim, dtype=dtype
    )
