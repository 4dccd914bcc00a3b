"""Fixed-shape detection output contract shared by all detector backends.

The reference returns Python lists of dicts ``{bbox, landmarks,
confidence}`` (yunet_face_detector.py:49-58 etc.); on TPU every detector
instead emits a padded, masked struct with static shapes so the whole
detect → track → encode step stays inside one jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Detections(NamedTuple):
    """Padded per-frame detections (or batched with a leading axis).

    boxes_xywh: (N, 4) pixel-space [x, y, w, h] in the SOURCE frame.
    landmarks:  (N, 5, 2) pixel landmarks — order (right_eye, left_eye,
                nose, mouth_right, mouth_left), the YuNet/RetinaFace
                convention (yunet_face_detector.py:53-54,
                retinaface_face_detector.py:209-215).  Backends with
                fewer points (BlazeFace fast path) fill the mouth slots
                with their closest equivalents.
    scores:     (N,) detection confidence.
    mask:       (N,) bool — True for real detections.
    """

    boxes_xywh: jnp.ndarray
    landmarks: jnp.ndarray
    scores: jnp.ndarray
    mask: jnp.ndarray

    @property
    def landmarks3(self) -> jnp.ndarray:
        """(N, 3, 2) (left_eye, right_eye, nose) for 3-point alignment,
        matching the pts1 ordering at yunet_face_detector.py:142."""
        return jnp.stack(
            [self.landmarks[..., 1, :], self.landmarks[..., 0, :], self.landmarks[..., 2, :]],
            axis=-2,
        )


def pad_detections(boxes, landmarks, scores, keep_idx, keep_mask) -> Detections:
    """Gather NMS survivors into the padded struct (masked slots zeroed)."""
    b = boxes[keep_idx] * keep_mask[:, None]
    l = landmarks[keep_idx] * keep_mask[:, None, None]
    s = scores[keep_idx] * keep_mask
    return Detections(b, l, s, keep_mask)
