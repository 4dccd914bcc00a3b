"""Golden tests: anchor grids and decode math vs reference numpy oracles."""

import numpy as np
import jax.numpy as jnp

from fire_tpu.ops import anchors as fanch


def _ref_anchors_plane(height, width, stride, base_anchors):
    """processing/postprocess.py:221-232 oracle."""
    A = base_anchors.shape[0]
    c_0_2 = np.tile(np.arange(0, width)[np.newaxis, :, np.newaxis, np.newaxis], (height, 1, A, 1))
    c_1_3 = np.tile(np.arange(0, height)[:, np.newaxis, np.newaxis, np.newaxis], (1, width, A, 1))
    all_anchors = np.concatenate([c_0_2, c_1_3, c_0_2, c_1_3], axis=-1) * stride + np.tile(
        base_anchors[np.newaxis, np.newaxis, :, :], (height, width, 1, 1)
    )
    return all_anchors


def _ref_bbox_pred(boxes, box_deltas):
    """processing/postprocess.py:146-183 oracle."""
    boxes = boxes.astype(float, copy=False)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = boxes[:, 1] + 0.5 * (heights - 1.0)
    dx, dy = box_deltas[:, 0:1], box_deltas[:, 1:2]
    dw, dh = box_deltas[:, 2:3], box_deltas[:, 3:4]
    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = np.exp(dw) * widths[:, None]
    pred_h = np.exp(dh) * heights[:, None]
    out = np.zeros(box_deltas.shape)
    out[:, 0:1] = pred_ctr_x - 0.5 * (pred_w - 1.0)
    out[:, 1:2] = pred_ctr_y - 0.5 * (pred_h - 1.0)
    out[:, 2:3] = pred_ctr_x + 0.5 * (pred_w - 1.0)
    out[:, 3:4] = pred_ctr_y + 0.5 * (pred_h - 1.0)
    return out


def _ref_landmark_pred(boxes, landmark_deltas):
    """processing/postprocess.py:186-202 oracle."""
    boxes = boxes.astype(float, copy=False)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = boxes[:, 1] + 0.5 * (heights - 1.0)
    pred = landmark_deltas.copy()
    for i in range(5):
        pred[:, i, 0] = landmark_deltas[:, i, 0] * widths + ctr_x
        pred[:, i, 1] = landmark_deltas[:, i, 1] * heights + ctr_y
    return pred


def test_anchors_plane_matches_reference():
    for stride in fanch.RETINAFACE_STRIDES:
        base = fanch.RETINAFACE_ANCHORS[stride]
        h, w = 7, 9
        ref = _ref_anchors_plane(h, w, stride, base).reshape(h * w * base.shape[0], 4)
        ours = fanch.anchors_plane(h, w, stride, base)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bbox_decode_matches_reference(rng):
    anchors = fanch.anchors_plane(5, 6, 16, fanch.RETINAFACE_ANCHORS[16])
    deltas = (rng.random((anchors.shape[0], 4)).astype(np.float32) - 0.5) * 0.4
    ref = _ref_bbox_pred(anchors, deltas)
    ours = np.asarray(fanch.bbox_decode(jnp.asarray(anchors), jnp.asarray(deltas)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_landmark_decode_matches_reference(rng):
    anchors = fanch.anchors_plane(4, 4, 32, fanch.RETINAFACE_ANCHORS[32])
    deltas = (rng.random((anchors.shape[0], 5, 2)).astype(np.float32) - 0.5) * 0.4
    ref = _ref_landmark_pred(anchors, deltas)
    ours = np.asarray(fanch.landmark_decode(jnp.asarray(anchors), jnp.asarray(deltas)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_clip_boxes(rng):
    boxes = (rng.random((10, 4)).astype(np.float32) - 0.2) * 800
    out = np.asarray(fanch.clip_boxes_xyxy(jnp.asarray(boxes), (480, 640)))
    assert out[:, 0].min() >= 0 and out[:, 0].max() <= 639
    assert out[:, 1].min() >= 0 and out[:, 1].max() <= 479


def test_yunet_grid_decode_shapes_and_math():
    h, w, stride = 3, 4, 8
    cls = np.full((h, w, 1), 0.81, np.float32)
    obj = np.full((h, w, 1), 0.49, np.float32)
    box = np.zeros((h, w, 4), np.float32)
    box[..., 2:] = np.log(2.0)  # w = h = 2*stride
    kps = np.zeros((h, w, 10), np.float32)
    boxes, lms, scores = fanch.yunet_grid_decode(
        jnp.asarray(cls), jnp.asarray(obj), jnp.asarray(box), jnp.asarray(kps), stride
    )
    np.testing.assert_allclose(np.asarray(scores), np.sqrt(0.81 * 0.49), atol=1e-6)
    b = np.asarray(boxes).reshape(h, w, 4)
    # cell (1,2): centre = (2*8, 1*8) = (16, 8); w=h=16 → x1=8, y1=0
    np.testing.assert_allclose(b[1, 2], [16 - 8, 8 - 8, 16 + 8, 8 + 8], atol=1e-5)
    lm = np.asarray(lms).reshape(h, w, 5, 2)
    np.testing.assert_allclose(lm[1, 2, 0], [16, 8], atol=1e-5)
