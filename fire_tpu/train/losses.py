"""Metric-learning losses for face embedding training."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fire_tpu.ops.gallery_match import l2_normalize


def arcface_logits(
    embeddings: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 0.5,
    scale: float = 64.0,
) -> jnp.ndarray:
    """Additive-angular-margin logits (ArcFace).

    Args:
      embeddings: (B, D) unnormalized; weights: (D, C) class centres;
      labels: (B,) int.
    Returns: (B, C) scaled logits with the margin applied on the target
    class — feed to softmax cross-entropy.
    """
    emb = l2_normalize(embeddings)
    w = l2_normalize(weights.T).T  # normalize class columns
    cos = jnp.matmul(emb, w, precision=jax.lax.Precision.HIGHEST)
    cos = jnp.clip(cos, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    onehot = jax.nn.one_hot(labels, weights.shape[1], dtype=cos.dtype)
    return jnp.cos(theta + margin * onehot) * scale


def triplet_loss(
    anchor: jnp.ndarray, positive: jnp.ndarray, negative: jnp.ndarray,
    margin: float = 0.2,
) -> jnp.ndarray:
    """FaceNet's original triplet loss (cosine-normalized embeddings)."""
    a, p, n = map(l2_normalize, (anchor, positive, negative))
    d_ap = jnp.sum(jnp.square(a - p), axis=-1)
    d_an = jnp.sum(jnp.square(a - n), axis=-1)
    return jnp.mean(jnp.maximum(d_ap - d_an + margin, 0.0))
