"""Anchor grids and box/landmark delta decoding (vectorised, jit-safe).

Device-side equivalents of the reference's numpy FPN post-processing
(processing/postprocess.py:146-232): identical anchor tables and decode
math, but computed once at trace time / as fused XLA ops instead of
per-frame numpy.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

# RetinaFace base anchors, verbatim contract from
# retinaface_face_detector.py:81-89 (strides 32/16/8, 2 anchors each).
RETINAFACE_STRIDES = (32, 16, 8)
RETINAFACE_ANCHORS: Dict[int, np.ndarray] = {
    32: np.array([[-248.0, -248.0, 263.0, 263.0], [-120.0, -120.0, 135.0, 135.0]], np.float32),
    16: np.array([[-56.0, -56.0, 71.0, 71.0], [-24.0, -24.0, 39.0, 39.0]], np.float32),
    8: np.array([[-8.0, -8.0, 23.0, 23.0], [0.0, 0.0, 15.0, 15.0]], np.float32),
}


def anchors_plane(height: int, width: int, stride: int, base: np.ndarray) -> np.ndarray:
    """Dense anchor grid, (H*W*A, 4) xyxy — vectorised version of
    processing/postprocess.py:221-232 (row-major: y, x, anchor)."""
    a = base.shape[0]
    xs = np.arange(width, dtype=np.float32) * stride
    ys = np.arange(height, dtype=np.float32) * stride
    shift = np.stack(
        [
            np.tile(xs[None, :], (height, 1)),
            np.tile(ys[:, None], (1, width)),
            np.tile(xs[None, :], (height, 1)),
            np.tile(ys[:, None], (1, width)),
        ],
        axis=-1,
    )  # (H, W, 4)
    out = shift[:, :, None, :] + base[None, None, :, :]
    return out.reshape(height * width * a, 4)


def bbox_decode(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Anchor-relative box decode, xyxy — processing/postprocess.py:146-183.

    ``anchors``: (N,4) xyxy; ``deltas``: (N,4) [dx,dy,dw,dh].
    Uses the legacy `+1`/`-1` pixel conventions of the reference.
    """
    widths = anchors[:, 2] - anchors[:, 0] + 1.0
    heights = anchors[:, 3] - anchors[:, 1] + 1.0
    ctr_x = anchors[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = anchors[:, 1] + 0.5 * (heights - 1.0)
    pred_ctr_x = deltas[:, 0] * widths + ctr_x
    pred_ctr_y = deltas[:, 1] * heights + ctr_y
    pred_w = jnp.exp(deltas[:, 2]) * widths
    pred_h = jnp.exp(deltas[:, 3]) * heights
    return jnp.stack(
        [
            pred_ctr_x - 0.5 * (pred_w - 1.0),
            pred_ctr_y - 0.5 * (pred_h - 1.0),
            pred_ctr_x + 0.5 * (pred_w - 1.0),
            pred_ctr_y + 0.5 * (pred_h - 1.0),
        ],
        axis=-1,
    )


def landmark_decode(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """5-point landmark decode — processing/postprocess.py:186-202.

    ``deltas``: (N, 5, 2) anchor-relative; returns (N, 5, 2) pixels.
    """
    widths = anchors[:, 2] - anchors[:, 0] + 1.0
    heights = anchors[:, 3] - anchors[:, 1] + 1.0
    ctr_x = anchors[:, 0] + 0.5 * (widths - 1.0)
    ctr_y = anchors[:, 1] + 0.5 * (heights - 1.0)
    px = deltas[..., 0] * widths[:, None] + ctr_x[:, None]
    py = deltas[..., 1] * heights[:, None] + ctr_y[:, None]
    return jnp.stack([px, py], axis=-1)


def clip_boxes_xyxy(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clip to [0, dim-1] — processing/postprocess.py:205-218."""
    h, w = im_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, h - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, w - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def yunet_grid_decode(
    cls: jnp.ndarray,
    obj: jnp.ndarray,
    box: jnp.ndarray,
    kps: jnp.ndarray,
    stride: int,
):
    """Anchor-free YuNet head decode (OpenCV FaceDetectorYN contract).

    The reference delegates this decode to OpenCV C++ (yunet.py:54-57);
    this is the on-device equivalent.  Per grid cell: score =
    sqrt(cls·obj); centre = (cell + offset)·stride; size =
    exp(pred)·stride; 5 landmarks likewise cell-relative.

    Args:
      cls, obj: (H, W, 1) sigmoid scores; box: (H, W, 4); kps: (H, W, 10)
    Returns:
      (boxes_xyxy (H*W, 4), landmarks (H*W, 5, 2), scores (H*W,))
    """
    h, w = cls.shape[0], cls.shape[1]
    score = jnp.sqrt(jnp.clip(cls[..., 0] * obj[..., 0], 0.0, 1.0))
    cols = jnp.arange(w, dtype=jnp.float32)[None, :]
    rows = jnp.arange(h, dtype=jnp.float32)[:, None]
    cx = (cols + box[..., 0]) * stride
    cy = (rows + box[..., 1]) * stride
    bw = jnp.exp(box[..., 2]) * stride
    bh = jnp.exp(box[..., 3]) * stride
    boxes = jnp.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1)
    k = kps.reshape(h, w, 5, 2)
    lx = (cols[..., None] + k[..., 0]) * stride
    ly = (rows[..., None] + k[..., 1]) * stride
    lm = jnp.stack([lx, ly], axis=-1)
    return boxes.reshape(-1, 4), lm.reshape(-1, 5, 2), score.reshape(-1)
