"""Exact cosine top-k gallery matching.

TPU-native replacement for hnswlib's approximate cosine k-NN
(modules/hnsw_manager.py:20,147): the gallery is an HBM-resident,
row-normalized (capacity, D) matrix and a query batch is one MXU matmul
followed by ``lax.top_k``.  At the reference's 100k×512 hard cap that is
~0.1 GFLOP per query batch — exact search is strictly better than HNSW
here (no recall loss, no graph maintenance, trivially shardable across
chips by rows; see fire_tpu.parallel.sharded_gallery).

Similarity convention matches the reference: cosine similarity, i.e.
``1 − hnsw_cosine_distance`` (face_recognition.py:462).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = -2.0  # below any cosine similarity


@partial(jax.jit, static_argnames=("k",))
def cosine_topk(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    valid: jnp.ndarray,
    k: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k cosine similarity of ``queries`` against ``gallery``.

    Args:
      queries: (B, D) L2-normalized query embeddings.
      gallery: (N, D) L2-normalized gallery rows (padded capacity).
      valid:   (N,) bool mask of live rows.
      k: number of neighbours.
    Returns:
      ``(sims (B,k), idx (B,k))``; masked-out rows score ``NEG``.
    """
    # bf16 gallery keeps HBM traffic halved; accumulate in f32 on the MXU.
    sims = jnp.dot(
        queries.astype(jnp.bfloat16),
        gallery.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    sims = jnp.where(valid[None, :], sims, NEG)
    top_sims, top_idx = jax.lax.top_k(sims, k)
    return top_sims, top_idx


@partial(jax.jit, static_argnames=("k",))
def cosine_topk_f32(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    valid: jnp.ndarray,
    k: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-precision variant (used by parity tests and enroll dedup)."""
    sims = jnp.dot(
        queries, gallery.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    sims = jnp.where(valid[None, :], sims, NEG)
    top_sims, top_idx = jax.lax.top_k(sims, k)
    return top_sims, top_idx


@jax.jit
def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Row-normalize; zero vectors stay zero (callers treat them as
    invalid, mirroring face_recognition.py:440-444)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(n > eps, x / jnp.maximum(n, eps), jnp.zeros_like(x))
