"""Detection↔track assignment: jitted exact LAP, host Hungarian, greedy.

The reference assigns with SciPy's Hungarian solver over a combined
``(1-IoU) + centre_distance/200`` cost (sort_UKF.py:403-448).  Three
implementations are provided:

* :func:`lap_assign` — exact min-cost assignment **on device, inside
  jit**: Jonker-Volgenant shortest-augmenting-path (the same algorithm
  family SciPy uses) built from ``lax.while_loop``/``fori_loop`` so it
  runs inside the batched ``lax.scan`` tracker with no host sync.  This
  is the default path (TrackerConfig.assignment == "hungarian").
* :func:`hungarian_assign` — the same optimum solved on host (native
  C++ LAP in fire_tpu.runtime, SciPy fallback).  Kept as the oracle for
  tests and as TrackerConfig.assignment == "hungarian_host".
* :func:`greedy_assign` — device-side greedy matching; identical to
  the optimum whenever the cost matrix is unambiguous (typical face
  scenes) and marginally cheaper per step.

All apply the reference gate: reject pairs with cost
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


# Padding cost for masked rows/columns in the device LAP.  Chosen small
# enough that float32 keeps ~2^-9 absolute resolution when padded duals
# mix with real ones (ulp(2^14) = 2^-9), and large enough that a padded
# cell can never beat a real one: real path costs are bounded by
# R·max_cost with max_cost = 2 + diag/max_distance (≤ ~23 at 4K), so
# R ≤ 64 keeps them ≤ ~1.5k ≪ 16384.
_PAD = 2.0**14


def _lap_solve(c: jnp.ndarray, row_valid: jnp.ndarray):
    """Jonker-Volgenant shortest-augmenting-path LAP on device.

    Minimizes total cost assigning every valid row of ``c`` (R, C),
    R ≤ C, to a distinct column.  Returns ``col4row`` (R,) int32 — the
    column per row (−1 for skipped invalid rows).

    One augmenting Dijkstra per valid row (``lax.while_loop`` over
    columns, relaxation vectorized over the column axis), then the
    classical dual update and an augmenting-path walk.  All arithmetic
    is f32: exact for the gated face-tracking regime (costs ≤ ~23,
    duals ≤ R·max_cost), with ~2^-9 resolution only on paths that
    traverse _PAD-assigned rows (crowd-overflow scenes) — quantified in
    tests/test_assignment_lap.py against the f64 host solver.
    """
    r_cap, c_cap = c.shape
    assert r_cap <= c_cap, "internal: LAP expects R <= C (caller transposes)"
    inf = jnp.float32(jnp.inf)

    def assign_row(i, carry):
        def run(carry):
            u, v, col4row, row4col = carry

            def dij_body(s):
                shortest, path, seen, minval, cur, sink = s
                red = minval + c[cur] - u[cur] - v
                upd = ~seen & (red < shortest)
                shortest = jnp.where(upd, red, shortest)
                path = jnp.where(upd, cur, path)
                masked = jnp.where(seen, inf, shortest)
                j = jnp.argmin(masked).astype(jnp.int32)
                minval = masked[j]
                seen = seen | (jnp.arange(seen.shape[0]) == j)
                rj = row4col[j]
                sink = jnp.where(rj < 0, j, jnp.int32(-1))
                cur = jnp.where(rj < 0, cur, rj)
                return shortest, path, seen, minval, cur, sink

            shortest, path, seen, minval, _, sink = jax.lax.while_loop(
                lambda s: s[5] < 0,
                dij_body,
                (
                    jnp.full((c_cap,), inf),
                    jnp.full((c_cap,), -1, jnp.int32),
                    jnp.zeros((c_cap,), bool),
                    jnp.float32(0.0),
                    jnp.int32(i),
                    jnp.int32(-1),
                ),
            )

            # dual update: complementary slackness for every pair in the
            # alternating tree (rows reached via their assigned column)
            u = u.at[i].add(minval)
            j_of = jnp.clip(col4row, 0, c_cap - 1)
            in_tree = (col4row >= 0) & seen[j_of] & (jnp.arange(r_cap) != i)
            u = u + jnp.where(in_tree, minval - shortest[j_of], 0.0)
            v = v - jnp.where(seen, minval - shortest, 0.0)

            # augment: walk predecessors from the free column back to row i
            def aug_body(s):
                j, col4row, row4col, _ = s
                rr = path[j]
                row4col = row4col.at[j].set(rr)
                j_next = col4row[rr]
                col4row = col4row.at[rr].set(j)
                return j_next, col4row, row4col, rr == i

            _, col4row, row4col, _ = jax.lax.while_loop(
                lambda s: ~s[3], aug_body, (sink, col4row, row4col, False)
            )
            return u, v, col4row, row4col

        return jax.lax.cond(row_valid[i], run, lambda x: x, carry)

    init = (
        jnp.zeros((r_cap,), jnp.float32),
        jnp.zeros((c_cap,), jnp.float32),
        jnp.full((r_cap,), -1, jnp.int32),
        jnp.full((c_cap,), -1, jnp.int32),
    )
    _, _, col4row, _ = jax.lax.fori_loop(0, r_cap, assign_row, init)
    return col4row


def _solve_with_fast_path(c: jnp.ndarray, row_valid: jnp.ndarray) -> jnp.ndarray:
    """Exact LAP with a vectorized common case.

    If every valid row's cheapest column is distinct, assigning each
    row its row-minimum reaches the sum-of-row-minima lower bound and
    is therefore THE optimum — no loop needed.  Face-tracking frames
    are almost always in this regime (each detection closest to its own
    track), so the serial JV solve runs only on genuinely conflicted
    frames (``lax.cond`` keeps it off the hot path; inside ``lax.scan``
    the cond stays a real branch, not a select).
    """
    r_cap, c_cap = c.shape
    jmin = jnp.argmin(c, axis=1).astype(jnp.int32)  # (R,)
    # one-hot column histogram instead of a scatter-add (TPU scatters
    # serialize inside the tracker scan)
    onehot = row_valid[:, None] & (jmin[:, None] == jnp.arange(c_cap)[None, :])
    conflict = jnp.any(jnp.sum(onehot, axis=0) > 1)
    fast = jnp.where(row_valid, jmin, -1)
    return jax.lax.cond(
        conflict, lambda: _lap_solve(c, row_valid), lambda: fast
    )


@jax.jit
def lap_assign(
    cost: jnp.ndarray,
    det_mask: jnp.ndarray,
    trk_mask: jnp.ndarray,
    gate: float,
) -> jnp.ndarray:
    """Exact assignment on device → ``match`` (T,) int32: detection
    index matched to each track, or −1.  Same optimum (and gate) as
    :func:`hungarian_assign`, but runs inside jit — usable in the
    batched ``lax.scan`` tracker and free of D2H syncs.

    Masked rows are skipped outright; masked columns cost ``_PAD``
    (uniform, so forced overflow pads never change which *real* pairs
    form the optimum — equivalent to SciPy's rectangular solve).
    """
    d, t = cost.shape
    cost = cost.astype(jnp.float32)
    if d <= t:
        c = jnp.where(trk_mask[None, :], cost, _PAD)
        col4row = _solve_with_fast_path(c, det_mask)  # (d,) track per det
        j = jnp.clip(col4row, 0, t - 1)
        ok = (
            det_mask
            & (col4row >= 0)
            & trk_mask[j]
            & (cost[jnp.arange(d), j] <= gate)
        )
        # invert det→track to track→det via a one-hot (no scatter; LAP
        # columns are distinct among ok rows so argmax is the unique hit)
        hit = ok[:, None] & (j[:, None] == jnp.arange(t)[None, :])  # (D, T)
        return jnp.where(
            jnp.any(hit, axis=0), jnp.argmax(hit, axis=0).astype(jnp.int32), -1
        )
    # more detection slots than tracks: solve transposed (rows = tracks)
    c = jnp.where(det_mask[None, :], cost.T, _PAD)
    col4row = _solve_with_fast_path(c, trk_mask)  # (t,) det per track
    j = jnp.clip(col4row, 0, d - 1)
    ok = trk_mask & (col4row >= 0) & det_mask[j] & (cost[j, jnp.arange(t)] <= gate)
    return jnp.where(ok, j.astype(jnp.int32), -1)


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
        # masked selects, not scatters (TPU scatters serialize)
        ti_hot = jnp.arange(t) == ti
        di_hot = jnp.arange(d) == di
        match = jnp.where(ok & ti_hot, di.astype(jnp.int32), match)
        c = jnp.where(ok & (di_hot[:, None] | ti_hot[None, :]), BIG, c)
        return c, match

    _, match = jax.lax.fori_loop(0, max_pairs, body, (c, jnp.full((t,), -1, jnp.int32)))
    return match
