import numpy as np
import jax.numpy as jnp

from prosim_tpu.ops.neighbors import neighbor_topk, gather_neighbors


def _brute_force(dst, src, dst_mask, src_mask, k, radius=None, exclude_self=False):
    B, Q, _ = dst.shape
    S = src.shape[1]
    idx = np.zeros((B, Q, k), dtype=np.int32)
    valid = np.zeros((B, Q, k), dtype=bool)
    for b in range(B):
        for q in range(Q):
            d = np.linalg.norm(src[b] - dst[b, q], axis=-1)
            ok = src_mask[b].copy()
            if not dst_mask[b, q]:
                ok[:] = False
            if radius is not None:
                ok &= d <= radius
            if exclude_self:
                ok[q] = False
            order = np.argsort(np.where(ok, d, np.inf), kind="stable")[:k]
            for j, s in enumerate(order):
                if ok[s]:
                    idx[b, q, j] = s
                    valid[b, q, j] = True
    return idx, valid


def test_topk_matches_bruteforce():
    rng = np.random.default_rng(0)
    B, Q, S, K = 2, 9, 17, 5
    dst = rng.normal(size=(B, Q, 2)).astype(np.float32) * 10
    src = rng.normal(size=(B, S, 2)).astype(np.float32) * 10
    dst_mask = rng.random((B, Q)) > 0.2
    src_mask = rng.random((B, S)) > 0.2

    idx, valid = neighbor_topk(
        jnp.asarray(dst), jnp.asarray(src), jnp.asarray(dst_mask), jnp.asarray(src_mask), k=K
    )
    ref_idx, ref_valid = _brute_force(dst, src, dst_mask, src_mask, K)

    np.testing.assert_array_equal(np.asarray(valid), ref_valid)
    # valid entries must agree on the neighbor set (distance ties are rare with
    # random floats; compare distances rather than raw indices)
    for b in range(B):
        for q in range(Q):
            got = sorted(np.asarray(idx)[b, q][np.asarray(valid)[b, q]])
            want = sorted(ref_idx[b, q][ref_valid[b, q]])
            assert got == want


def test_topk_radius_cut():
    dst = jnp.asarray([[[0.0, 0.0]]])
    src = jnp.asarray([[[0.5, 0.0], [2.0, 0.0], [0.0, 0.9], [5.0, 5.0]]])
    ones = jnp.ones((1, 1), bool)
    idx, valid = neighbor_topk(dst, src, ones, jnp.ones((1, 4), bool), k=4, radius=1.0)
    got = set(np.asarray(idx)[0, 0][np.asarray(valid)[0, 0]].tolist())
    assert got == {0, 2}


def test_topk_exclude_self():
    pos = jnp.asarray([[[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]])
    mask = jnp.ones((1, 3), bool)
    idx, valid = neighbor_topk(pos, pos, mask, mask, k=2, exclude_self=True)
    # nearest neighbor of token 0 is token 1, not itself
    assert np.asarray(idx)[0, 0, 0] == 1
    # with self included, it is itself
    idx2, _ = neighbor_topk(pos, pos, mask, mask, k=2, exclude_self=False)
    assert np.asarray(idx2)[0, 0, 0] == 0


def test_gather_neighbors_shapes():
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(2, 7, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 7, size=(2, 3, 5)), dtype=jnp.int32)
    out = gather_neighbors(src, idx)
    assert out.shape == (2, 3, 5, 4)
    np.testing.assert_allclose(
        np.asarray(out)[1, 2, 3], np.asarray(src)[1, np.asarray(idx)[1, 2, 3]]
    )


def test_topk_k_exceeds_sources():
    # decoder/policy configs use MAX_NUM_NEIGH larger than the token count;
    # selection must clamp the width to the source count (padding columns
    # back to k would blow up the [B, Q, K, D] rel-PE tensors in HBM)
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.normal(size=(1, 6, 2)).astype(np.float32))
    mask = jnp.asarray([[True, True, True, False, True, False]])
    idx, valid = neighbor_topk(pos, pos, mask, mask, k=10)
    assert idx.shape == (1, 6, 6) and valid.shape == (1, 6, 6)
    assert np.asarray(valid)[0, 0].sum() == 4  # only 4 valid sources


def test_pallas_topk_interpret_parity():
    """Pallas kernel semantics (interpret mode on CPU) vs the XLA path."""
    from prosim_tpu.ops.pallas_topk import neighbor_topk_pallas

    rng = np.random.default_rng(3)
    B, S, K = 2, 96, 8
    pos = jnp.asarray(rng.normal(size=(B, S, 2)).astype(np.float32) * 50)
    mask = jnp.asarray(rng.random((B, S)) > 0.15)
    i1, v1 = neighbor_topk(pos, pos, mask, mask, k=K)
    i2, v2 = neighbor_topk_pallas(pos, pos, mask, mask, K, q_tile=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    # neighbor sets agree by distance (tie order may differ)
    p = np.asarray(pos)
    for b in range(B):
        for q in range(0, S, 7):
            d1 = np.sort(np.linalg.norm(p[b, np.asarray(i1)[b, q][np.asarray(v1)[b, q]]] - p[b, q], axis=-1))
            d2 = np.sort(np.linalg.norm(p[b, np.asarray(i2)[b, q][np.asarray(v2)[b, q]]] - p[b, q], axis=-1))
            np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_pallas_topk_radius_interpret():
    from prosim_tpu.ops.pallas_topk import neighbor_topk_pallas

    pos = jnp.asarray([[[0.0, 0.0], [0.5, 0.0], [2.0, 0.0], [0.0, 0.9]]])
    mask = jnp.ones((1, 4), bool)
    idx, valid = neighbor_topk_pallas(pos, pos, mask, mask, 4, radius=1.0,
                                      q_tile=4, interpret=True)
    got = set(np.asarray(idx)[0, 0][np.asarray(valid)[0, 0]].tolist())
    assert got == {0, 1, 3}
