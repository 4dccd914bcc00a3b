"""RetinaFace detector — ResNet-50 + FPN + SSH heads (Flax, NHWC).

TPU-native replacement for the reference's 118 MB ONNX RetinaFace
session + numpy FPN post-processing
(retinaface_face_detector.py:16-223).  The decode path reproduces the
reference's exact numeric contract — strides [32, 16, 8] with two
hard-coded base anchors per cell (retinaface_face_detector.py:79-91),
per-stride score slice / bbox delta decode / landmark decode / clip
(ibid.:115-159 via fire_tpu.ops.anchors), score threshold 0.9, legacy
`+1`-convention NMS at 0.4 with `>=` suppression
(processing/postprocess.py:235-279) — but runs fully on device with
static shapes.  The reference's output-tensor reorder
``[7,1,4,8,0,3,6,2,5]`` (retinaface_face_detector.py:108) is an ONNX
export artifact; here the heads are emitted already ordered
(score, bbox, landmark) per stride.

Input: fixed-size letterboxed frame (config.detect_size); the
reference's dynamic scale-to-[1024,1980] resize
(processing/preprocess.py:86-117) becomes a static letterbox so XLA
compiles one graph.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from fire_tpu.models.detections import Detections, pad_detections
from fire_tpu.ops import anchors as fanch
from fire_tpu.ops import boxes as fbox

Dtype = Any


class Bottleneck(nn.Module):
    """ResNet-v1 bottleneck: 1×1 → 3×3 → 1×1(×4) with projection."""

    features: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, dt = self.features, self.dtype
        needs_proj = (x.shape[-1] != f * 4) or self.strides != 1
        sc = x
        if needs_proj:
            sc = nn.Conv(f * 4, (1, 1), strides=(self.strides,) * 2, use_bias=False, dtype=dt, name="proj")(x)
            sc = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=dt, name="proj_bn")(sc)
        y = nn.Conv(f, (1, 1), use_bias=False, dtype=dt, name="c1")(x)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=dt, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(f, (3, 3), strides=(self.strides,) * 2, padding="SAME", use_bias=False, dtype=dt, name="c2")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=dt, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(f * 4, (1, 1), use_bias=False, dtype=dt, name="c3")(y)
        y = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=dt, name="bn3")(y)
        return nn.relu(y + sc)


class SSH(nn.Module):
    """SSH context module: 3×3 ∥ 5×5(2×3×3) ∥ 7×7(3×3×3) → concat."""

    features: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f, dt = self.features, self.dtype

        def conv_bn(z, feats, name, relu=True):
            z = nn.Conv(feats, (3, 3), padding="SAME", use_bias=False, dtype=dt, name=name)(z)
            z = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=dt, name=name + "_bn")(z)
            return nn.relu(z) if relu else z

        b3 = conv_bn(x, f // 2, "b3", relu=False)
        m = conv_bn(x, f // 4, "m")
        b5 = conv_bn(m, f // 4, "b5", relu=False)
        m2 = conv_bn(m, f // 4, "m2")
        b7 = conv_bn(m2, f // 4, "b7", relu=False)
        return nn.relu(jnp.concatenate([b3, b5, b7], axis=-1))


class RetinaFace(nn.Module):
    """ResNet-50 + FPN + SSH with 2-anchor heads at strides 8/16/32."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    num_anchors: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3), RGB float (reference feeds raw-pixel RGB,
        zero mean / unit std — processing/preprocess.py:130-143).
        H, W divisible by 32.

        Returns ``{stride: (face_prob (B,h,w,A), bbox (B,h,w,4A),
        lmk (B,h,w,10A))}`` for strides 8/16/32.
        """
        w, dt, A = self.width, self.dtype, self.num_anchors
        x = x.astype(dt)
        x = nn.Conv(w, (7, 7), strides=(2, 2), padding="SAME", use_bias=False, dtype=dt, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=1e-5, dtype=dt, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        feats = {}
        for i, n_blocks in enumerate(self.stage_sizes):
            f = w * (2 ** i)
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = Bottleneck(f, strides=strides, dtype=dt, name=f"stage{i}_block{j}")(x, train)
            if i >= 1:
                feats[2 ** (i + 2)] = x  # strides 8, 16, 32

        # FPN
        p5 = nn.Conv(256, (1, 1), use_bias=False, dtype=dt, name="lat32")(feats[32])
        up5 = jnp.repeat(jnp.repeat(p5, 2, axis=1), 2, axis=2)
        p4 = nn.Conv(256, (1, 1), use_bias=False, dtype=dt, name="lat16")(feats[16]) + up5
        p4 = nn.Conv(256, (3, 3), padding="SAME", use_bias=False, dtype=dt, name="smooth16")(p4)
        up4 = jnp.repeat(jnp.repeat(p4, 2, axis=1), 2, axis=2)
        p3 = nn.Conv(256, (1, 1), use_bias=False, dtype=dt, name="lat8")(feats[8]) + up4
        p3 = nn.Conv(256, (3, 3), padding="SAME", use_bias=False, dtype=dt, name="smooth8")(p3)

        out = {}
        for stride, feat in ((8, p3), (16, p4), (32, p5)):
            ctx = SSH(256, dtype=dt, name=f"ssh_s{stride}")(feat, train)
            logits = nn.Conv(2 * A, (1, 1), dtype=dt, name=f"cls_s{stride}")(ctx).astype(jnp.float32)
            # softmax over the (bg, face) pair per anchor — the ONNX
            # export's channel layout [bg_a0, bg_a1, face_a0, face_a1]
            # reduces to this same per-anchor face probability
            # (retinaface_face_detector.py:116-117).
            b, h, ww = logits.shape[0], logits.shape[1], logits.shape[2]
            pair = logits.reshape(b, h, ww, 2, A)
            prob = nn.softmax(pair, axis=-2)[:, :, :, 1, :]
            bbox = nn.Conv(4 * A, (1, 1), dtype=dt, name=f"bbox_s{stride}")(ctx).astype(jnp.float32)
            lmk = nn.Conv(10 * A, (1, 1), dtype=dt, name=f"lmk_s{stride}")(ctx).astype(jnp.float32)
            out[stride] = (prob, bbox, lmk)
        return out


def decode_retinaface(
    head_outputs,
    im_hw,
    scale: jnp.ndarray,
    threshold: float = 0.9,
    nms_threshold: float = 0.4,
    max_faces: int = 32,
) -> Detections:
    """Heads → padded `Detections`, reproducing the reference decode
    (retinaface_face_detector.py:110-180) on device.

    ``im_hw`` is the static network input size (used for clipping, as
    im_info does in the reference); ``scale`` is the letterbox scale
    back to source pixels (the reference's ``im_scale`` division at
    retinaface_face_detector.py:147,157).
    """
    all_boxes, all_lms, all_scores = [], [], []
    for stride in fanch.RETINAFACE_STRIDES:
        prob, bbox, lmk = head_outputs[stride]
        prob, bbox, lmk = prob[0], bbox[0], lmk[0]
        h, w, A = prob.shape
        anchors = jnp.asarray(
            fanch.anchors_plane(h, w, stride, fanch.RETINAFACE_ANCHORS[stride])
        )
        scores = prob.reshape(-1)
        deltas = bbox.reshape(-1, 4)
        boxes = fanch.bbox_decode(anchors, deltas)
        boxes = fanch.clip_boxes_xyxy(boxes, im_hw)
        ldeltas = lmk.reshape(-1, 5, 2)
        lms = fanch.landmark_decode(anchors, ldeltas)
        all_boxes.append(boxes)
        all_lms.append(lms)
        all_scores.append(scores)

    boxes = jnp.concatenate(all_boxes) / scale
    lms = jnp.concatenate(all_lms) / scale
    scores = jnp.concatenate(all_scores)

    # the reference divides by im_scale per stride BEFORE NMS
    # (retinaface_face_detector.py:147,176) → NMS in source pixel space
    keep_idx, keep_mask = fbox.nms(
        boxes,
        scores,
        nms_threshold,
        max_out=max_faces,
        score_threshold=threshold,
        plus_one=True,
        suppress_equal=True,
        pre_top_k=256,
    )
    return pad_detections(fbox.xyxy_to_xywh(boxes), lms, scores, keep_idx, keep_mask)
