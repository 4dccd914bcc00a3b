"""Detection↔track assignment: host Hungarian + fully-jitted greedy.

The reference assigns with SciPy's Hungarian solver over a combined
``(1-IoU) + centre_distance/200`` cost (sort_UKF.py:403-448).  Two
implementations are provided:

* :func:`hungarian_assign` — exact reference parity.  Runs on host
  (SciPy C++ or the native C++ LAP in fire_tpu.runtime when built);
  fine for ≤tens of tracks and used by the reference-compatible API.
* :func:`greedy_assign` — device-side greedy matching inside jit for
  the maximum-throughput pipeline; identical to Hungarian whenever the
  cost matrix is unambiguous (typical face scenes), validated against
  it in tests/test_track_sort.py.

Both apply the reference gate: reject pairs with cost
``> (1 - iou_threshold) + 1.0`` (sort_UKF.py:441-443).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fire_tpu.ops.boxes import iou_matrix_xywh

BIG = 1e9


@partial(jax.jit, static_argnames=("max_distance",))
def cost_matrix(det_boxes: jnp.ndarray, trk_boxes: jnp.ndarray,
                max_distance: float = 200.0) -> jnp.ndarray:
    """(D, T) cost = (1 − IoU) + centre_dist/max_distance
    (sort_UKF.py:412-431; the 200-px normaliser is
    TrackerConfig.max_distance, sort_UKF.py:307)."""
    iou = iou_matrix_xywh(det_boxes, trk_boxes)
    dc = det_boxes[:, :2] + det_boxes[:, 2:4] / 2.0
    tc = trk_boxes[:, :2] + trk_boxes[:, 2:4] / 2.0
    dist = jnp.linalg.norm(dc[:, None, :] - tc[None, :, :], axis=-1)
    return (1.0 - iou) + dist / max_distance


def hungarian_assign(
    cost: np.ndarray,
    det_mask: np.ndarray,
    trk_mask: np.ndarray,
    gate: float,
) -> np.ndarray:
    """Exact assignment on host → ``match`` (T,) int32: detection index
    matched to each track, or −1.

    Invalid rows/cols are masked with a large cost before solving, then
    filtered, so padding never changes the optimum over real pairs.
    """
    from fire_tpu.runtime.native import linear_sum_assignment

    d, t = cost.shape
    match = np.full((t,), -1, np.int32)
    if det_mask.sum() == 0 or trk_mask.sum() == 0:
        return match
    c = np.array(cost, np.float64)
    c[~det_mask, :] = BIG
    c[:, ~trk_mask] = BIG
    rows, cols = linear_sum_assignment(c)
    for r, cidx in zip(rows, cols):
        if not (det_mask[r] and trk_mask[cidx]):
            continue
        if cost[r, cidx] > gate:
            continue  # sort_UKF.py:441-443
        match[cidx] = r
    return match


@partial(jax.jit, static_argnames=("max_pairs",))
def greedy_assign(
    cost: jnp.ndarray,
    det_mask: jnp.ndarray,
    trk_mask: jnp.ndarray,
    gate: float,
    max_pairs: int,
) -> jnp.ndarray:
    """Device greedy matching: repeatedly take the global minimum-cost
    valid pair under the gate.  Returns ``match`` (T,) int32 (−1 = none).
    """
    d, t = cost.shape
    c = jnp.where(det_mask[:, None] & trk_mask[None, :], cost, BIG)
    c = jnp.where(c <= gate, c, BIG)

    def body(_, state):
        c, match = state
        flat = jnp.argmin(c)
        di, ti = flat // t, flat % t
        ok = c[di, ti] < BIG / 2
        match = jnp.where(ok, match.at[ti].set(di.astype(jnp.int32)), match)
        c = jnp.where(ok, c.at[di, :].set(BIG).at[:, ti].set(BIG), c)
        return c, match

    _, match = jax.lax.fori_loop(0, max_pairs, body, (c, jnp.full((t,), -1, jnp.int32)))
    return match
