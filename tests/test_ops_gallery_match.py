"""Tests for exact cosine top-k matching (hnswlib replacement)."""

import numpy as np
import jax.numpy as jnp

from fire_tpu.ops import gallery_match as gm


def test_l2_normalize(rng):
    x = rng.standard_normal((5, 8)).astype(np.float32)
    x[3] = 0.0
    out = np.asarray(gm.l2_normalize(jnp.asarray(x)))
    norms = np.linalg.norm(out, axis=1)
    np.testing.assert_allclose(norms[[0, 1, 2, 4]], 1.0, atol=1e-5)
    assert norms[3] == 0.0


def test_cosine_topk_exact(rng):
    d, n, b, k = 128, 1000, 4, 5
    gal = rng.standard_normal((n, d)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    q = rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = np.ones(n, bool)
    valid[100:200] = False

    sims, idx = gm.cosine_topk_f32(jnp.asarray(q), jnp.asarray(gal), jnp.asarray(valid), k=k)
    sims, idx = np.asarray(sims), np.asarray(idx)

    ref = q @ gal.T
    ref[:, ~valid] = -2.0
    for i in range(b):
        order = np.argsort(-ref[i])[:k]
        # XLA CPU matmul accumulation order differs from numpy: ~1e-4
        np.testing.assert_allclose(sims[i], ref[i][order], atol=1e-3)
        assert set(idx[i]) == set(order)
        assert not (set(idx[i]) & set(range(100, 200)))


def test_cosine_topk_bf16_close(rng):
    d, n = 512, 4096
    gal = rng.standard_normal((n, d)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    q = gal[7:9] + 0.01 * rng.standard_normal((2, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    valid = jnp.ones(n, bool)
    sims, idx = gm.cosine_topk(jnp.asarray(q), jnp.asarray(gal), valid, k=1)
    # bf16 matmul still finds the right neighbour, sim within 5e-3 of f32
    assert list(np.asarray(idx[:, 0])) == [7, 8]
    ref = (q @ gal.T).max(axis=1)
    np.testing.assert_allclose(np.asarray(sims)[:, 0], ref, atol=5e-3)
