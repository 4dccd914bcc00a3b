"""Box math + mask-based device NMS.

Replaces the reference's pure-Python O(n²) greedy NMS
(processing/postprocess.py:235-279) and the NMS hidden inside OpenCV's
``FaceDetectorYN`` with a fixed-shape, jit-safe suppression loop: all
pairwise IoUs are one vectorised op, then ``lax.fori_loop`` picks the
max-score survivor ``max_out`` times.  No dynamic shapes anywhere, so
the whole detector post-process stays on device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([b[..., :2], b[..., :2] + b[..., 2:4]], axis=-1)


def xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([b[..., :2], b[..., 2:4] - b[..., :2]], axis=-1)


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray, plus_one: bool = False) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes ``a`` (N,4) × ``b`` (M,4) → (N,M).

    ``plus_one=True`` reproduces the legacy `+1` pixel-area convention of
    the reference RetinaFace NMS (processing/postprocess.py:247,272-273).
    """
    off = 1.0 if plus_one else 0.0
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[None, :, 0], b[None, :, 1], b[None, :, 2], b[None, :, 3]
    iw = jnp.maximum(0.0, jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1) + off)
    ih = jnp.maximum(0.0, jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1) + off)
    inter = iw * ih
    area_a = (ax2 - ax1 + off) * (ay2 - ay1 + off)
    area_b = (bx2 - bx1 + off) * (by2 - by1 + off)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / union, 0.0)


def iou_matrix_xywh(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xywh boxes — tracker association convention
    (sort_UKF.py:18-52: degenerate boxes get IoU 0)."""
    valid_a = (a[:, 2:3] > 0) & (a[:, 3:4] > 0)
    valid_b = (b[None, :, 2] > 0) & (b[None, :, 3] > 0)
    m = iou_matrix(xywh_to_xyxy(a), xywh_to_xyxy(b))
    return jnp.where(valid_a & valid_b, m, 0.0)


@partial(jax.jit, static_argnames=("max_out", "plus_one", "suppress_equal", "pre_top_k"))
def nms(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    score_threshold: float = 0.0,
    plus_one: bool = False,
    suppress_equal: bool = False,
    pre_top_k: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a fixed candidate set.

    Args:
      boxes_xyxy: (N, 4); scores: (N,) with invalid candidates already
        at/below ``score_threshold``.
      suppress_equal: suppress at IoU == threshold too (`>=`, matching
        processing/postprocess.py:276); default strict `>`.
      pre_top_k: if >0 and N > pre_top_k, restrict suppression to the
        pre_top_k highest-scoring candidates first — the N×N IoU matrix
        over a dense anchor grid (e.g. 8400² at 640²) dominates detector
        latency otherwise.  Exact whenever ≤ pre_top_k candidates clear
        ``score_threshold`` (greedy suppression flows strictly from
        higher to lower scores).
    Returns:
      ``(keep_idx (max_out,), keep_mask (max_out,))`` — indices of kept
      boxes in score order; masked slots point at index 0.
    """
    n = boxes_xyxy.shape[0]
    if pre_top_k and n > pre_top_k:
        top_scores, top_idx = jax.lax.top_k(scores, pre_top_k)
        keep_idx, keep_mask = nms(
            boxes_xyxy[top_idx], top_scores, iou_threshold, max_out,
            score_threshold, plus_one, suppress_equal, 0,
        )
        return top_idx[keep_idx], keep_mask

    ious = iou_matrix(boxes_xyxy, boxes_xyxy, plus_one=plus_one)
    live = jnp.where(scores > score_threshold, scores, NEG)

    def body(_, state):
        live_scores, keep_idx, keep_mask, n_kept = state
        best = jnp.argmax(live_scores)
        ok = live_scores[best] > NEG / 2
        keep_idx = jnp.where(ok, keep_idx.at[n_kept].set(best), keep_idx)
        keep_mask = jnp.where(ok, keep_mask.at[n_kept].set(True), keep_mask)
        overl = ious[best]
        sup = jnp.where(suppress_equal, overl >= iou_threshold, overl > iou_threshold)
        sup = sup | (jnp.arange(live_scores.shape[0]) == best)
        live_scores = jnp.where(ok & sup, NEG, live_scores)
        n_kept = n_kept + jnp.where(ok, 1, 0)
        return live_scores, keep_idx, keep_mask, n_kept

    init = (
        live,
        jnp.zeros((max_out,), jnp.int32),
        jnp.zeros((max_out,), bool),
        jnp.asarray(0, jnp.int32),
    )
    _, keep_idx, keep_mask, _ = jax.lax.fori_loop(0, max_out, body, init)
    return keep_idx, keep_mask


def weighted_blend(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    keep_idx: jnp.ndarray,
    keep_mask: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float,
    payload: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray | None]:
    """MediaPipe-style weighted overlap resolution after greedy NMS.

    The reference's MediaPipe graph (mediapipe_face_detector.py:28-33)
    resolves overlapping SSD candidates with *weighted* NMS: the
    surviving detection's location is the score-weighted mean of every
    candidate overlapping it, not the argmax candidate alone.  Plain
    greedy NMS keeps one noisy regression per face; blending averages
    the per-anchor regression noise away (measured: TP mean-IoU 0.61 →
    see train.detect_blaze) and collapses near-duplicate boxes whose
    pairwise IoU falls below the suppression threshold.

    Each kept box (row of ``keep_idx``) is replaced by the score-
    weighted mean over all candidates with ``IoU >= iou_threshold``
    against it and ``score > score_threshold``; the kept box itself
    always participates (self-IoU 1), so the denominator never
    vanishes on a valid slot.  The *score* stays the cluster max, as in
    MediaPipe.  ``payload`` (e.g. landmarks, any shape ``(N, ...)``) is
    blended with the same weights.  Dense (K×N) formulation — one IoU
    matrix + one matmul, jit/TPU friendly, fixed shapes.
    """
    kept = boxes_xyxy[keep_idx]  # (K, 4)
    ious = iou_matrix(kept, boxes_xyxy)  # (K, N)
    w = jnp.where(
        (ious >= iou_threshold) & (scores > score_threshold)[None, :],
        scores[None, :],
        0.0,
    )
    denom = jnp.maximum(w.sum(-1, keepdims=True), 1e-6)
    blended = (w @ boxes_xyxy) / denom
    blended = jnp.where(keep_mask[:, None], blended, kept)
    out_payload = None
    if payload is not None:
        flat = payload.reshape(payload.shape[0], -1)
        out_payload = ((w @ flat) / denom).reshape(
            (kept.shape[0],) + payload.shape[1:]
        )
        out_payload = jnp.where(
            keep_mask.reshape((-1,) + (1,) * (payload.ndim - 1)),
            out_payload,
            payload[keep_idx],
        )
    return blended, out_payload
