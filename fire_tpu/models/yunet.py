"""YuNet-class anchor-free face detector (Flax, NHWC).

TPU-native replacement for OpenCV's opaque ``cv.FaceDetectorYN``
pipeline (yunet.py:20-57): a compact depthwise-separable backbone with
detection heads at strides 8/16/32 and the FaceDetectorYN output
contract — per location ``score = sqrt(cls·obj)``, centre/size box
decode, 5 landmarks (see fire_tpu.ops.anchors.yunet_grid_decode) —
followed by on-device NMS.  Default thresholds mirror the reference
wiring: conf 0.90, NMS 0.3, topK 5000 (yunet_face_detector.py:10-11).

The graph is one jit from raw frame to padded `Detections`: letterbox →
backbone → heads → decode → NMS → un-letterbox, all static shapes.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fire_tpu.models.detections import Detections, pad_detections
from fire_tpu.ops import anchors as fanch
from fire_tpu.ops import boxes as fbox

Dtype = Any


class DWBlock(nn.Module):
    """Depthwise 3×3 + pointwise 1×1, both BN+ReLU (MobileNet-style)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        x = nn.Conv(
            cin, (3, 3), strides=self.strides, padding="SAME",
            feature_group_count=cin, use_bias=False, dtype=self.dtype, name="dw",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=self.dtype, name="dw_bn")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=self.dtype, name="pw_bn")(x)
        return nn.relu(x)


class YuNetHead(nn.Module):
    """Per-level prediction head: cls(1) + obj(1) + box(4) + kps(10)."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = DWBlock(x.shape[-1], dtype=self.dtype, name="feat")(x, train)
        cls = nn.Conv(1, (1, 1), dtype=self.dtype, name="cls")(f)
        obj = nn.Conv(1, (1, 1), dtype=self.dtype, name="obj")(f)
        box = nn.Conv(4, (1, 1), dtype=self.dtype, name="box")(f)
        kps = nn.Conv(10, (1, 1), dtype=self.dtype, name="kps")(f)
        return (
            nn.sigmoid(cls.astype(jnp.float32)),
            nn.sigmoid(obj.astype(jnp.float32)),
            box.astype(jnp.float32),
            kps.astype(jnp.float32),
        )


class YuNet(nn.Module):
    """Backbone + FPN-lite + anchor-free heads at strides 8/16/32."""

    width: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) float in [0, 1]; H, W divisible by 32.

        Returns per-stride head outputs
        ``{8: (cls, obj, box, kps), 16: ..., 32: ...}`` in NHWC.
        """
        w, dt = self.width, self.dtype
        x = x.astype(dt)
        # stride 2 → 4 stem
        x = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, dtype=dt, name="stem0")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=dt, name="stem0_bn")(x)
        x = nn.relu(x)
        x = DWBlock(w, strides=(2, 2), dtype=dt, name="stem1")(x, train)
        # stage s8
        c3 = DWBlock(w * 2, strides=(2, 2), dtype=dt, name="s8_0")(x, train)
        c3 = DWBlock(w * 2, dtype=dt, name="s8_1")(c3, train)
        # stage s16
        c4 = DWBlock(w * 4, strides=(2, 2), dtype=dt, name="s16_0")(c3, train)
        c4 = DWBlock(w * 4, dtype=dt, name="s16_1")(c4, train)
        # stage s32
        c5 = DWBlock(w * 8, strides=(2, 2), dtype=dt, name="s32_0")(c4, train)
        c5 = DWBlock(w * 8, dtype=dt, name="s32_1")(c5, train)

        # top-down FPN-lite (1×1 lateral + nearest upsample add)
        p5 = nn.Conv(w * 4, (1, 1), use_bias=False, dtype=dt, name="lat5")(c5)
        up5 = jnp.repeat(jnp.repeat(p5, 2, axis=1), 2, axis=2)
        p4 = nn.Conv(w * 4, (1, 1), use_bias=False, dtype=dt, name="lat4")(c4) + up5
        up4 = jnp.repeat(jnp.repeat(nn.Conv(w * 2, (1, 1), use_bias=False, dtype=dt, name="mid4")(p4), 2, axis=1), 2, axis=2)
        p3 = nn.Conv(w * 2, (1, 1), use_bias=False, dtype=dt, name="lat3")(c3) + up4

        out = {}
        for stride, feat in ((8, p3), (16, p4), (32, p5)):
            out[stride] = YuNetHead(dtype=dt, name=f"head_s{stride}")(feat, train)
        return out


def decode_yunet(
    head_outputs,
    scale: jnp.ndarray,
    conf_threshold: float = 0.90,
    nms_threshold: float = 0.3,
    max_faces: int = 32,
) -> Detections:
    """Heads → padded `Detections` in source-frame pixels.

    Mirrors FaceDetectorYN post-processing (delegated to C++ by the
    reference, yunet.py:54-57) with the reference thresholds
    (yunet_face_detector.py:10-11); NMS runs on device with strict `>`
    suppression like OpenCV's NMSBoxes.  ``scale`` is the letterbox
    scale; outputs are divided by it to land in source pixels.
    """
    all_boxes, all_lms, all_scores = [], [], []
    for stride, (cls, obj, box, kps) in head_outputs.items():
        # batch dim of 1 expected here; squeeze it
        b, l, s = fanch.yunet_grid_decode(cls[0], obj[0], box[0], kps[0], stride)
        all_boxes.append(b)
        all_lms.append(l)
        all_scores.append(s)
    boxes = jnp.concatenate(all_boxes, axis=0)
    lms = jnp.concatenate(all_lms, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)

    keep_idx, keep_mask = fbox.nms(
        boxes, scores, nms_threshold, max_out=max_faces,
        score_threshold=conf_threshold, pre_top_k=256,
    )
    dets = pad_detections(fbox.xyxy_to_xywh(boxes) / scale, lms / scale, scores, keep_idx, keep_mask)
    return dets
