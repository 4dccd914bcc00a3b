"""Tests for IoU / NMS parity with the reference implementations."""

import numpy as np
import jax.numpy as jnp

from fire_tpu.ops import boxes as fbox


def _ref_cpu_nms(dets, threshold):
    """Verbatim re-expression of the reference greedy NMS semantics
    (processing/postprocess.py:235-279) as a golden oracle."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    suppressed = np.zeros(len(dets), dtype=bool)
    keep = []
    for _i in range(len(dets)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(dets)):
            j = order[_j]
            if suppressed[j]:
                continue
            xx1 = max(x1[i], x1[j]); yy1 = max(y1[i], y1[j])
            xx2 = min(x2[i], x2[j]); yy2 = min(y2[i], y2[j])
            w = max(0.0, xx2 - xx1 + 1); h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            ovr = inter / (areas[i] + areas[j] - inter)
            if ovr >= threshold:
                suppressed[j] = True
    return keep


def _ref_iou_xywh(a, b):
    """sort_UKF.py:18-52 oracle."""
    x1, y1, w1, h1 = a; x2, y2, w2, h2 = b
    if w1 <= 0 or h1 <= 0 or w2 <= 0 or h2 <= 0:
        return 0.0
    xx1, yy1 = max(x1, x2), max(y1, y2)
    xx2, yy2 = min(x1 + w1, x2 + w2), min(y1 + h1, y2 + h2)
    inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
    union = w1 * h1 + w2 * h2 - inter
    return inter / union if union > 0 else 0.0


def test_iou_matrix_xywh_matches_reference(rng):
    a = rng.random((7, 4)).astype(np.float32) * 100
    b = rng.random((5, 4)).astype(np.float32) * 100
    a[2, 2] = -1.0  # degenerate
    ours = np.asarray(fbox.iou_matrix_xywh(jnp.asarray(a), jnp.asarray(b)))
    for i in range(7):
        for j in range(5):
            assert abs(ours[i, j] - _ref_iou_xywh(a[i], b[j])) < 1e-5


def test_nms_matches_reference_legacy(rng):
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.random(n) * 200
    boxes[:, 1] = rng.random(n) * 200
    boxes[:, 2] = boxes[:, 0] + 20 + rng.random(n) * 60
    boxes[:, 3] = boxes[:, 1] + 20 + rng.random(n) * 60
    scores = rng.random(n).astype(np.float32) * 0.9 + 0.05
    dets = np.hstack([boxes, scores[:, None]])
    ref_keep = _ref_cpu_nms(dets, 0.4)

    idx, mask = fbox.nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.4, max_out=n,
        plus_one=True, suppress_equal=True,
    )
    ours = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
    assert ours == ref_keep


def test_nms_score_threshold_and_cap(rng):
    boxes = jnp.asarray(np.array([[0, 0, 10, 10], [100, 100, 110, 110], [1, 1, 11, 11]], np.float32))
    scores = jnp.asarray(np.array([0.9, 0.8, 0.85], np.float32))
    idx, mask = fbox.nms(boxes, scores, 0.3, max_out=2, score_threshold=0.82)
    kept = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
    # box 2 overlaps box 0 heavily → suppressed; box 1 is below score_threshold
    assert kept == [0]
    idx, mask = fbox.nms(boxes, scores, 0.3, max_out=2, score_threshold=0.5)
    kept = [int(i) for i, m in zip(np.asarray(idx), np.asarray(mask)) if m]
    assert kept == [0, 1]  # cap=2: third survivor would be dropped anyway


def test_xywh_xyxy_roundtrip(rng):
    b = rng.random((6, 4)).astype(np.float32)
    out = np.asarray(fbox.xyxy_to_xywh(fbox.xywh_to_xyxy(jnp.asarray(b))))
    np.testing.assert_allclose(out, b, atol=1e-6)
