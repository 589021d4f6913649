"""TPU microbench: neighbor top-k strategies at the scene-encoder shape.

lax.top_k lowers to a full [B,Q,S] variadic sort on TPU (profiled at 178 ms
per rollout at B=64, S=2208, k=32). Candidates:
  1. lax.top_k (baseline)
  2. lax.approx_max_k with recall_target=1.0 (TPU PartialReduce custom call)
  3. the Pallas iterative-argmin kernel with a VMEM-fitting q_tile
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.tree.map(lambda x: x, out)
    float(jnp.asarray(jax.tree.leaves(out)[0]).sum())  # drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).sum())  # drain
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    assert jax.default_backend() == "tpu"
    B, Q, S, K = 64, 2208, 2208, 32
    rng = np.random.default_rng(0)
    dst = jnp.asarray(rng.normal(scale=100, size=(B, Q, 2)), jnp.float32)
    src = jnp.asarray(rng.normal(scale=100, size=(B, S, 2)), jnp.float32)
    dmask = jnp.ones((B, Q), bool)
    smask = jnp.asarray(rng.random((B, S)) > 0.05)

    from prosim_tpu.ops.neighbors import neighbor_topk
    from prosim_tpu.ops.pallas_topk import neighbor_topk_pallas

    f_xla = jax.jit(lambda *a: neighbor_topk(*a, k=K))
    ms, (idx0, val0) = timeit(f_xla, dst, src, dmask, smask)
    print(f"lax.top_k           : {ms:8.2f} ms")

    def approx(dst, src, dmask, smask):
        d2 = jnp.sum((dst[:, :, None] - src[:, None]) ** 2, -1)
        bad = ~(smask[:, None, :] & dmask[:, :, None])
        d2 = jnp.where(bad, jnp.inf, d2)
        neg, idx = jax.lax.approx_max_k(-d2, K, recall_target=1.0)
        return idx.astype(jnp.int32), neg > -jnp.inf

    f_apx = jax.jit(approx)
    ms, (idx1, val1) = timeit(f_apx, dst, src, dmask, smask)
    print(f"approx_max_k (r=1.0): {ms:8.2f} ms")

    for qt in (32, 56):
        f_pl = jax.jit(lambda *a, _qt=qt: neighbor_topk_pallas(*a, k=K, q_tile=_qt))
        try:
            ms, (idx2, val2) = timeit(f_pl, dst, src, dmask, smask)
            print(f"pallas q_tile={qt:3d}   : {ms:8.2f} ms")
        except Exception as e:
            print(f"pallas q_tile={qt:3d}   : FAILED {str(e)[:100]}")
            idx2 = None

    # exactness: same neighbor SETS (order may differ within ties)
    i0, i1 = np.asarray(idx0), np.asarray(idx1)
    v0 = np.asarray(val0)
    same = 0
    tot = 0
    for b in range(0, B, 16):
        for q in range(0, Q, 208):
            s0 = set(i0[b, q][v0[b, q]])
            s1 = set(i1[b, q][: len(s0)])
            same += len(s0 & s1)
            tot += len(s0)
    print(f"approx vs exact neighbor-set overlap: {same}/{tot}")


if __name__ == "__main__":
    main()
