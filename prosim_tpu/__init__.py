"""prosim_tpu: a TPU-native promptable closed-loop traffic simulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of ProSim
(Ariostgx/ProSim, CoRL 2024): multi-agent closed-loop traffic simulation over
Waymo scenes where every agent's policy can be conditioned on user prompts
(goal points, route sketches, action tags, natural-language text).

Design principles (TPU-first):
  * All shapes static and padded; masks thread through every op.
  * The closed loop is one `jax.lax.scan` over replan steps - no per-step host
    sync, no string-keyed index plumbing (reference: prosim/models/traj_sam.py:144-349).
  * Sparse neighborhood attention uses fixed-K nearest-neighbor indices and a
    gather-attention kernel (replacing torch_cluster radius/knn graphs +
    torch_geometric segment softmax).
  * Scaling axis is scenes-per-batch, sharded over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from prosim_tpu.config import get_config  # noqa: F401
from prosim_tpu.core.registry import registry  # noqa: F401
