"""Fixed-K neighbor selection over padded token grids.

TPU-native replacement for torch_cluster's `radius`, `radius_graph`, `knn`,
`knn_graph` (reference call sites: prosim/models/scene_encoder/attn_fusion.py:107-109,
prosim/models/decoder/sym_coord.py:86-97, prosim/models/policy/act_decoder.py:249-262).

Instead of variable-length edge lists we return `[B, Q, K]` neighbor indices +
validity masks with fully static shapes: masked pairwise squared distances,
optional radius cut, then `lax.top_k` of the negated distances. Within-radius
neighbors are the K *nearest* (deterministic), which is a strict refinement of
torch_cluster's arbitrary max_num_neighbors truncation.
"""

from functools import partial

import jax
import jax.numpy as jnp

_INF = jnp.inf


@partial(jax.jit, static_argnames=("k", "exclude_self"))
def neighbor_topk(
    dst_pos,
    src_pos,
    dst_mask,
    src_mask,
    k: int,
    radius: float | None = None,
    exclude_self: bool = False,
):
    """Select up to k nearest valid sources for each destination.

    Args:
      dst_pos: [B, Q, 2] float query positions.
      src_pos: [B, S, 2] float source positions.
      dst_mask: [B, Q] bool valid destinations.
      src_mask: [B, S] bool valid sources.
      k: static neighbor count (k <= S).
      radius: optional cutoff; sources farther than this are invalid.
      exclude_self: drop the diagonal (requires Q == S, same token set).

    Returns:
      idx: [B, Q, K] int32 source indices (arbitrary where invalid).
      valid: [B, Q, K] bool - neighbor validity.
    """
    d2 = jnp.sum(
        (dst_pos[:, :, None, :] - src_pos[:, None, :, :]) ** 2, axis=-1
    )  # [B, Q, S]
    bad = ~(src_mask[:, None, :] & dst_mask[:, :, None])
    if radius is not None:
        bad = bad | (d2 > radius * radius)
    if exclude_self:
        q = dst_pos.shape[1]
        eye = jnp.eye(q, d2.shape[-1], dtype=bool)
        bad = bad | eye[None]
    d2 = jnp.where(bad, _INF, d2)
    # Configs may request more neighbors than there are source slots
    # (e.g. MAX_NUM_NEIGH=768 vs 160 obs tokens); clamp the width to the
    # source count instead of padding back to k -- the [B, Q, K, D] rel-PE
    # tensors built on these indices dominate HBM, and padded-out columns
    # are pure waste (still static shapes: S is static).
    s = d2.shape[-1]
    eff_k = min(k, s)
    if jax.default_backend() == "tpu":
        # TPU sort/PartialReduce cost is bound by the key width: selecting on
        # bf16-rounded squared distances halves it (measured 6.9 vs 8.2 ms at
        # the m2p shape). Neighbors whose d2 differ by less than bf16's 8-bit
        # mantissa (<0.4%) may swap in/out of the selected set at the k-th
        # rank boundary - geometrically interchangeable candidates, and still
        # a strict refinement of torch_cluster's ARBITRARY max_num_neighbors
        # truncation that defines the reference semantics
        # (attn_fusion.py:107-109). Masked/out-of-radius pairs stay +inf in
        # bf16, so validity is exact. CPU (all tests) keeps exact f32 keys.
        key_d2 = d2.astype(jnp.bfloat16)
        if s > 4 * eff_k:
            # approx_max_k with recall_target=1.0 returns the exact top-k SET
            # of its keys via two-level reduction (~15% faster than the full
            # variadic sort; set-equality verified in scripts/tpu_topk_bench.py).
            # Attention is permutation-invariant over the neighbor axis, so
            # candidate ordering differences don't matter.
            neg_d, idx = jax.lax.approx_max_k(-key_d2, eff_k, recall_target=1.0)
        else:
            neg_d, idx = jax.lax.top_k(-key_d2, eff_k)
        valid = neg_d > jnp.bfloat16(-_INF)
    else:
        neg_d, idx = jax.lax.top_k(-d2, eff_k)
        valid = neg_d > -_INF
    return idx.astype(jnp.int32), valid


# NOTE (measured on v5e): re-sorting each query's neighbor list by ascending
# source index before gathering - attention is permutation-invariant over the
# neighbor axis - does NOT pay off: the per-step argsort of [B,N,K] costs far
# more than any gather-locality gain (17.6 -> 12.4 scenes/s end-to-end).
# XLA's TPU gather cost is per-row and insensitive to index order.


def gather_neighbors(src, idx):
    """Gather per-neighbor features: src [B, S, ...], idx [B, Q, K] -> [B, Q, K, ...]."""
    return jnp.take_along_axis(
        src[:, None], idx[(...,) + (None,) * (src.ndim - 2)], axis=2
    )
