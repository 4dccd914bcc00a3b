"""BlazeFace short-range detector — the reference's MediaPipe slot.

The reference's fastest detector option is MediaPipe's C++/TFLite
BlazeFace graph (mediapipe_face_detector.py:28-33) — opaque native
code.  This is the TPU-native equivalent with the **actual published
short-range topology** (BlazeFace paper / MediaPipe
face_detection_short_range model): 5×5/2 stem to 24 channels, sixteen
single BlazeBlocks with the canonical channel progression
24→24→28→32→36→42→48→56→64→72→80→88→96→96×4 (stride-2 at the 32/48/96
steps), and the four SSD heads — 2 anchors/cell on the 16×16 stride-8
map (88 ch) and 6 anchors/cell on the 8×8 stride-16 map (96 ch), 896
anchors total, 1 score + 16 regression values (box + 6 keypoints) per
anchor.  Weight-loadable: :func:`blazeface_layer_order` defines the
execution-order import contract consumed by
``fire_tpu.models.onnx_import.assign_blazeface``, and
``onnx_export.export_blazeface`` emits the interchange file.

Output contract matches the reference wrapper (bbox + keypoints +
score, mediapipe_face_detector.py:67-71); confidence wiring mirrors it
too: 0.8 for detection, 0.5 for extraction
(mediapipe_face_detector.py:13,111).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from fire_tpu.models.detections import Detections, pad_detections
from fire_tpu.ops import boxes as fbox

Dtype = Any

# (features, stride) per BlazeBlock — the published short-range channel
# progression (stride-2 blocks feed the 64→32→16→8 pyramid).
BLAZE_BLOCKS: Tuple[Tuple[int, int], ...] = (
    (24, 1), (28, 1), (32, 2), (36, 1), (42, 1), (48, 2),
    (56, 1), (64, 1), (72, 1), (80, 1), (88, 1),
    (96, 2), (96, 1), (96, 1), (96, 1), (96, 1),
)


def blaze_anchors(input_px: int = 128) -> np.ndarray:
    """(A, 2) anchor centres in [0,1] — 2 per stride-8 cell then 6 per
    stride-16 cell; mediapipe's SSD anchor config for this model
    collapses to unit-size centre anchors.  At the published 128² input
    that is 896 anchors (16×16×2 + 8×8×6); the topology is fully
    convolutional, so the same weights-compatible head layout yields
    2016 anchors at 192² — the operating point the from-scratch trained
    weights use for a sharper localization tail (round 5)."""
    anchors = []
    for grid, per_cell in ((input_px // 8, 2), (input_px // 16, 6)):
        step = 1.0 / grid
        for y in range(grid):
            for x in range(grid):
                cx, cy = (x + 0.5) * step, (y + 0.5) * step
                anchors.extend([(cx, cy)] * per_cell)
    return np.asarray(anchors, np.float32)


class BlazeBlock(nn.Module):
    """Depthwise 5×5 + pointwise 1×1 with residual; stride-2 variants
    maxpool the shortcut, channel increases zero-pad it (BlazeFace
    paper fig. 1; biases present, BN folded — as in the TFLite file)."""

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
    """128×128 short-range face detector; returns raw SSD head tensors."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, 128, 128, 3) RGB in [0,1] (mapped to the model's
        [-1,1] input contract internally).

        Returns (scores (B, 896), regressions (B, 896, 16)) in anchor
        order: 16×16 grid (2/cell) then 8×8 grid (6/cell).
        """
        dt = self.dtype
        x = (x.astype(dt) - 0.5) * 2.0
        x = nn.Conv(24, (5, 5), strides=(2, 2), padding="SAME", use_bias=True,
                    dtype=dt, name="conv1")(x)
        x = nn.relu(x)
        f16 = None
        for i, (feats, stride) in enumerate(BLAZE_BLOCKS):
            if stride == 2 and feats == 96:
                f16 = x  # 16×16×88 map feeds the stride-8 heads
            x = BlazeBlock(feats, stride=stride, dtype=dt, name=f"b{i + 1}")(x)
        f8 = x  # 8×8×96

        b = f16.shape[0]
        # mediapipe head names: *_8 act on the stride-8 (16×16) map,
        # *_16 on the stride-16 (8×8) map
        c8 = nn.Conv(2, (1, 1), use_bias=True, dtype=dt, name="classifier_8")(f16).astype(jnp.float32)
        r8 = nn.Conv(32, (1, 1), use_bias=True, dtype=dt, name="regressor_8")(f16).astype(jnp.float32)
        c16 = nn.Conv(6, (1, 1), use_bias=True, dtype=dt, name="classifier_16")(f8).astype(jnp.float32)
        r16 = nn.Conv(96, (1, 1), use_bias=True, dtype=dt, name="regressor_16")(f8).astype(jnp.float32)
        scores = jnp.concatenate([c8.reshape(b, -1), c16.reshape(b, -1)], axis=1)
        regs = jnp.concatenate([r8.reshape(b, -1, 16), r16.reshape(b, -1, 16)], axis=1)
        return scores, regs


def blazeface_layer_order() -> List[Tuple]:
    """Parameterised layers in execution order for ONNX weight import
    (all plain biased convs — the TFLite file ships BN pre-folded)."""
    order: List[Tuple] = [("conv", ("conv1",))]
    for i in range(1, len(BLAZE_BLOCKS) + 1):
        order.append(("conv", (f"b{i}", "dw")))
        order.append(("conv", (f"b{i}", "pw")))
    for head in ("classifier_8", "regressor_8", "classifier_16", "regressor_16"):
        order.append(("conv", (head,)))
    return order


def decode_blazeface(
    scores: jnp.ndarray,
    regs: jnp.ndarray,
    scale,
    conf_threshold: float = 0.8,
    nms_threshold: float = 0.3,
    max_faces: int = 32,
    input_px: int = 128,
) -> Detections:
    """SSD decode + NMS → padded `Detections` in source-frame pixels.

    Raw score is clipped to ±100 then sigmoided (mediapipe convention);
    regressions are anchor-relative in units of the ``input_px`` model
    input.  ``scale`` is the letterbox resize factor the engine applied
    (source px × scale = canvas px): dividing the canvas-pixel decode by
    it is the letterbox removal MediaPipe's graph performs before
    emitting relative coordinates
    (mediapipe_face_detector.py:67-71 consumes post-removal boxes).
    6 keypoints (right_eye, left_eye, nose, mouth, right_ear, left_ear)
    are mapped to the 5-point contract with mouth duplicated for both
    mouth corners.
    """
    anchors = jnp.asarray(blaze_anchors(input_px)) * input_px  # (A, 2) canvas px
    prob = nn.sigmoid(jnp.clip(scores[0], -100.0, 100.0))
    r = regs[0] / scale  # anchor-relative canvas px → source px
    apx = anchors / scale  # anchor centres in source px
    cx = apx[:, 0] + r[:, 0]
    cy = apx[:, 1] + r[:, 1]
    bw = r[:, 2]
    bh = r[:, 3]
    boxes = jnp.stack(
        [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], axis=-1
    )
    kp = r[:, 4:16].reshape(-1, 6, 2)
    kx = apx[:, None, 0] + kp[..., 0]
    ky = apx[:, None, 1] + kp[..., 1]
    kps6 = jnp.stack([kx, ky], axis=-1)  # (896, 6, 2)
    # contract order: right_eye, left_eye, nose, mouth_right, mouth_left
    lms = jnp.stack([kps6[:, 0], kps6[:, 1], kps6[:, 2], kps6[:, 3], kps6[:, 3]], axis=1)

    keep_idx, keep_mask = fbox.nms(
        boxes, prob, nms_threshold, max_out=max_faces,
        score_threshold=conf_threshold, pre_top_k=256,
    )
    # MediaPipe resolves overlaps with *weighted* NMS (the C++ graph's
    # non_max_suppression_calculator in WEIGHTED mode): the emitted
    # location is the score-weighted mean of the overlapping cluster.
    # Plain argmax NMS was the deviation; blending also averages out
    # per-anchor regression noise (duplicated same-centre anchors agree
    # exactly, so GT round-trips stay bit-exact — tests/test_detect_blaze).
    bb, ll = fbox.weighted_blend(
        boxes, prob, keep_idx, keep_mask, nms_threshold, conf_threshold,
        payload=lms,
    )
    b = fbox.xyxy_to_xywh(bb) * keep_mask[:, None]
    l = ll * keep_mask[:, None, None]
    s = prob[keep_idx] * keep_mask
    return Detections(b, l, s, keep_mask)
