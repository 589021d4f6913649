"""TPU check + microbench for the single-pass edge-attention core
(ops/edge_attn.py) at the policy m2p shape vs the XLA einsum chain."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from prosim_tpu.ops.edge_attn import edge_attn_core
from tests.test_edge_attn import _make, _xla_reference


def timeit(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3, out


def main():
    assert jax.default_backend() == "tpu"
    scale = 16.0 ** -0.5

    # correctness on-device at a small shape
    args = _make(B=2, Q=16, K=128, dtype=jnp.bfloat16)
    x_g, z_r, qx, qp, bias, valid = args
    ref = jax.jit(lambda *a: _xla_reference(*a, scale))(*args)
    out = edge_attn_core(x_g, z_r, qx, qp, valid, scale)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=3e-2, rtol=3e-2)
    print("TPU parity ok (bf16, K=128)")

    for (B, Q, K) in [(64, 128, 768), (64, 128, 512), (64, 128, 160)]:
        args = _make(B=B, Q=Q, K=K, dtype=jnp.bfloat16, seed=K)
        kargs = args[:4] + (args[5],)
        ms_x, _ = timeit(jax.jit(lambda *a: _xla_reference(*a, scale)), *args)
        ms_k, _ = timeit(jax.jit(lambda *a: edge_attn_core(*a, scale)), *kargs)
        gb = 2 * B * Q * K * 128 * 2 / 1e9
        print(f"B{B} Q{Q} K{K}: XLA {ms_x:7.2f} ms | kernel {ms_k:7.2f} ms "
              f"({gb:.1f} GB tables; kernel eff {gb/ms_k*1e3:.0f} GB/s)")


if __name__ == "__main__":
    main()
