"""Pallas TPU kernel: fused cosine top-1 gallery match.

The gallery hot query (three-tier matching uses k=1,
face_recognition.py:459-469) is a (B, D) × (N, D)ᵀ matmul followed by a
row arg-max.  The XLA path (fire_tpu.ops.gallery_match.cosine_topk)
materializes the full (B, N) similarity matrix in HBM before
``lax.top_k`` reads it back; this kernel instead streams gallery tiles
HBM→VMEM, computes each (B, TILE) block of similarities on the MXU, and
folds it into a running (max, argmax) carried in VMEM scratch — the
similarity matrix never exists.  HBM traffic = one read of the gallery
(bf16) per query batch, the bandwidth floor.

Masking convention matches cosine_topk: rows ≥ ``count`` score NEG.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -2.0  # below any cosine similarity
TILE_N = 2048


def _kernel(q_ref, tile_ref, count_ref, sim_ref, idx_ref, acc_sim, acc_idx):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    tile_rows = tile_ref.shape[0]

    @pl.when(step == 0)
    def _():
        acc_sim[:] = jnp.full_like(acc_sim, NEG)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    # (B, TILE) similarities on the MXU, f32 accumulation
    sims = jnp.dot(q_ref[:], tile_ref[:].T, preferred_element_type=jnp.float32)
    row0 = step * tile_rows
    col_ids = row0 + jax.lax.broadcasted_iota(jnp.int32, sims.shape, dimension=1)
    valid = col_ids < count_ref[0]
    sims = jnp.where(valid, sims, NEG)

    tile_max = jnp.max(sims, axis=1, keepdims=True)           # (B, 1)
    tile_arg = jnp.argmax(sims, axis=1).reshape(-1, 1) + row0  # (B, 1)

    better = tile_max > acc_sim[:]
    acc_sim[:] = jnp.where(better, tile_max, acc_sim[:])
    acc_idx[:] = jnp.where(better, tile_arg, acc_idx[:])

    @pl.when(step == n_steps - 1)
    def _():
        sim_ref[:] = acc_sim[:]
        idx_ref[:] = acc_idx[:]


@partial(jax.jit, static_argnames=("interpret",))
def pallas_cosine_top1(
    queries: jnp.ndarray,
    gallery: jnp.ndarray,
    count: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-1 cosine match.

    Args:
      queries: (B, D) L2-normalized f32/bf16.
      gallery: (N, D) L2-normalized, N a multiple of TILE_N (the padded
        capacity from GalleryConfig already is).
      count: scalar int32 — live rows (rows ≥ count are masked out).
    Returns:
      (sims (B,), idx (B,)) — best similarity and gallery row per query.
    """
    b, d = queries.shape
    n = gallery.shape[0]
    tile = next((t for t in (2048, 1024, 512, 256, 128) if n % t == 0 and t <= n), None)
    if tile is None:
        raise ValueError(f"gallery rows {n} must be a multiple of 128")
    grid = n // tile

    q = queries.astype(jnp.bfloat16)
    g = gallery.astype(jnp.bfloat16)
    count_arr = jnp.asarray(count, jnp.int32).reshape(1)

    sim, idx = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, 1), jnp.float32),
            pltpu.VMEM((b, 1), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=n * d * 2 + b * d * 2, transcendentals=0
        ),
        interpret=interpret,
    )(q, g, count_arr)
    return sim[:, 0], idx[:, 0]
