"""BlazeFace-class fast-path detector (the reference's MediaPipe slot).

The reference's fastest detector option is MediaPipe's C++/TFLite
BlazeFace graph (mediapipe_face_detector.py:28-33) — opaque native
code.  This is the TPU-native equivalent filling the same slot with the
same output contract (bbox + ≥3 keypoints + score,
mediapipe_face_detector.py:67-71): a 128×128 single-shot detector with
BlazeBlock feature extractor and the 896-anchor (16×16×2 + 8×8×6) SSD
grid, decoded and NMS'd on device.

Default confidence mirrors the reference wiring: 0.8 for detection,
0.5 for extraction (mediapipe_face_detector.py:13,111).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from fire_tpu.models.detections import Detections, pad_detections
from fire_tpu.ops import boxes as fbox

Dtype = Any


def blaze_anchors() -> np.ndarray:
    """(896, 2) anchor centres in [0,1] — 2 per 16×16 cell (stride 8)
    then 6 per 8×8 cell (stride 16), mediapipe's SSD anchor layout."""
    anchors = []
    for grid, per_cell in ((16, 2), (8, 6)):
        step = 1.0 / grid
        for y in range(grid):
            for x in range(grid):
                cx, cy = (x + 0.5) * step, (y + 0.5) * step
                anchors.extend([(cx, cy)] * per_cell)
    return np.asarray(anchors, np.float32)


class BlazeBlock(nn.Module):
    """Depthwise 5×5 + pointwise 1×1 with residual; optional stride-2
    (maxpool shortcut + zero channel pad, as in the BlazeFace paper)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        y = nn.Conv(
            cin, (5, 5), strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=cin, use_bias=True, dtype=self.dtype, name="dw",
        )(x)
        y = nn.Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype, name="pw")(y)
        if self.stride == 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        if self.features > cin:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, self.features - cin)])
        elif self.features < cin:
            x = x[..., : self.features]
        return nn.relu(x + y)


class BlazeFace(nn.Module):
    """128×128 fast face detector; returns raw SSD head tensors."""

    width: int = 24
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, 128, 128, 3) in [0,1] (model maps to [-1,1] internally).

        Returns (scores (B, 896), boxes+kps raw (B, 896, 16)).
        """
        w, dt = self.width, self.dtype
        x = (x.astype(dt) - 0.5) * 2.0
        x = nn.Conv(w, (5, 5), strides=(2, 2), padding="SAME", dtype=dt, name="stem")(x)
        x = nn.relu(x)
        for i in range(2):
            x = BlazeBlock(w, dtype=dt, name=f"b64_{i}")(x)
        x = BlazeBlock(w * 2, stride=2, dtype=dt, name="down32")(x)
        for i in range(2):
            x = BlazeBlock(w * 2, dtype=dt, name=f"b32_{i}")(x)
        x = BlazeBlock(w * 4, stride=2, dtype=dt, name="down16")(x)
        for i in range(2):
            x = BlazeBlock(w * 4, dtype=dt, name=f"b16_{i}")(x)
        f16 = x  # (B, 16, 16, 4w)
        x = BlazeBlock(w * 4, stride=2, dtype=dt, name="down8")(x)
        for i in range(2):
            x = BlazeBlock(w * 4, dtype=dt, name=f"b8_{i}")(x)
        f8 = x  # (B, 8, 8, 4w)

        b = f16.shape[0]
        # 2 anchors/cell at 16×16, 6 at 8×8; per anchor: 1 score + 16 regs
        s16 = nn.Conv(2 * 1, (1, 1), dtype=dt, name="score16")(f16).astype(jnp.float32)
        s8 = nn.Conv(6 * 1, (1, 1), dtype=dt, name="score8")(f8).astype(jnp.float32)
        r16 = nn.Conv(2 * 16, (1, 1), dtype=dt, name="reg16")(f16).astype(jnp.float32)
        r8 = nn.Conv(6 * 16, (1, 1), dtype=dt, name="reg8")(f8).astype(jnp.float32)
        scores = jnp.concatenate([s16.reshape(b, -1), s8.reshape(b, -1)], axis=1)
        regs = jnp.concatenate([r16.reshape(b, -1, 16), r8.reshape(b, -1, 16)], axis=1)
        return scores, regs


def decode_blazeface(
    scores: jnp.ndarray,
    regs: jnp.ndarray,
    frame_hw,
    conf_threshold: float = 0.8,
    nms_threshold: float = 0.3,
    max_faces: int = 32,
) -> Detections:
    """SSD decode + NMS → padded `Detections` in source-frame pixels.

    Raw score is clipped to ±100 then sigmoided (mediapipe convention);
    regressions are anchor-relative in units of the 128-px input.
    6 keypoints (right_eye, left_eye, nose, mouth, right_ear, left_ear)
    are mapped to the 5-point contract with mouth duplicated for both
    mouth corners.
    """
    h, w = frame_hw
    anchors = jnp.asarray(blaze_anchors())  # (896, 2) in [0,1]
    prob = nn.sigmoid(jnp.clip(scores[0], -100.0, 100.0))
    r = regs[0] / 128.0  # anchor-relative, normalised units
    cx = anchors[:, 0] + r[:, 0]
    cy = anchors[:, 1] + r[:, 1]
    bw = r[:, 2]
    bh = r[:, 3]
    boxes = jnp.stack(
        [(cx - bw / 2) * w, (cy - bh / 2) * h, (cx + bw / 2) * w, (cy + bh / 2) * h], axis=-1
    )
    kp = r[:, 4:16].reshape(-1, 6, 2)
    kx = (anchors[:, None, 0] + kp[..., 0]) * w
    ky = (anchors[:, None, 1] + kp[..., 1]) * h
    kps6 = jnp.stack([kx, ky], axis=-1)  # (896, 6, 2)
    # contract order: right_eye, left_eye, nose, mouth_right, mouth_left
    lms = jnp.stack([kps6[:, 0], kps6[:, 1], kps6[:, 2], kps6[:, 3], kps6[:, 3]], axis=1)

    keep_idx, keep_mask = fbox.nms(
        boxes, prob, nms_threshold, max_out=max_faces,
        score_threshold=conf_threshold, pre_top_k=256,
    )
    return pad_detections(fbox.xyxy_to_xywh(boxes), lms, prob, keep_idx, keep_mask)
