"""YuNet 2023mar face detector (Flax, NHWC) — weight-loadable topology.

TPU-native replacement for OpenCV's opaque ``cv.FaceDetectorYN``
pipeline (yunet.py:20-57), implementing the *actual* architecture
behind ``face_detection_yunet_2023mar.onnx`` (libfacedetection's
"yunet_n") so the real file's weights load via
:func:`fire_tpu.models.onnx_import.assign_yunet`:

* stem ``Conv_head(3,16,16)``: 3×3 s2 conv+BN+ReLU, then a
  depthwise-separable ``ConvDPUnit``;
* backbone: ``Conv4layerBlock(16,64)`` then four ``(64,64)`` blocks with
  2×2 max-pools between stages (feature strides 8/16/32);
* a top-down FPN of ``ConvDPUnit`` merges (nearest ×2 upsample + add);
* per-level heads: shared ``ConvDPUnit(64,64)`` feature then four
  bias-only ``ConvDPUnit`` outputs — cls(1), obj(1), bbox(4), kps(10).

Parameter count at the canonical widths is exactly **75,856**, matching
the published 2023mar model.  Every unit is conv(1×1, bias) →
depthwise conv(3×3, bias) [→ BN(eps 1e-5, affine) → ReLU], the
``ConvDPUnit`` layout of libfacedetection.  Should a real weight file
ever disagree, import fails loudly (shape-checked per layer) and the
engine falls back to :mod:`fire_tpu.models.onnx_exec`, which runs the
file's exact graph regardless.

Post-processing keeps the FaceDetectorYN output contract — per
location ``score = sqrt(cls·obj)``, centre/size box decode, 5
landmarks (fire_tpu.ops.anchors.yunet_grid_decode) — followed by
on-device NMS.  Default thresholds mirror the reference wiring:
conf 0.90, NMS 0.3, topK 5000 (yunet_face_detector.py:10-11).

TPU notes: whole graph is one jit from raw frame to padded
`Detections`: letterbox → backbone → heads → decode → NMS →
un-letterbox, all static shapes.  Convs are NHWC so XLA tiles them
onto the MXU; compute in bfloat16 with f32 decode.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from fire_tpu.models.detections import Detections, pad_detections
from fire_tpu.ops import anchors as fanch
from fire_tpu.ops import boxes as fbox

Dtype = Any

_BN_EPS = 1e-5  # torch BatchNorm2d default, used by libfacedetection


class ConvDPUnit(nn.Module):
    """1×1 conv (bias) → 3×3 depthwise conv (bias) [→ BN → ReLU]."""

    features: int
    with_bn_relu: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        x = nn.Conv(f, (1, 1), use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.Conv(f, (3, 3), padding="SAME", feature_group_count=f,
                    use_bias=True, dtype=self.dtype, name="conv2")(x)
        if self.with_bn_relu:
            x = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                             dtype=self.dtype, name="bn")(x)
            x = nn.relu(x)
        return x


class ConvHead(nn.Module):
    """Stem: 3×3 s2 conv(bias)+BN+ReLU, then a ConvDPUnit."""

    mid: int
    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch padding=1 (NOT Flax SAME: stride 2 on even dims would
        # pad (0,1) instead of the real model's (1,1))
        x = nn.Conv(self.mid, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, epsilon=_BN_EPS,
                         dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        return ConvDPUnit(self.features, dtype=self.dtype, name="conv2")(x, train)


class Conv4LayerBlock(nn.Module):
    """Two stacked ConvDPUnits (in→in, in→out)."""

    features: int
    with_bn_relu: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvDPUnit(x.shape[-1], dtype=self.dtype, name="conv1")(x, train)
        return ConvDPUnit(self.features, with_bn_relu=self.with_bn_relu,
                          dtype=self.dtype, name="conv2")(x, train)


class YuNetHead(nn.Module):
    """Per-level head: shared DP feature + 4 output ConvDPUnits."""

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = ConvDPUnit(x.shape[-1], dtype=self.dtype, name="feat")(x, train)
        cls = ConvDPUnit(1, with_bn_relu=False, dtype=self.dtype, name="cls")(f, train)
        obj = ConvDPUnit(1, with_bn_relu=False, dtype=self.dtype, name="obj")(f, train)
        box = ConvDPUnit(4, with_bn_relu=False, dtype=self.dtype, name="box")(f, train)
        kps = ConvDPUnit(10, with_bn_relu=False, dtype=self.dtype, name="kps")(f, train)
        return (
            nn.sigmoid(cls.astype(jnp.float32)),
            nn.sigmoid(obj.astype(jnp.float32)),
            box.astype(jnp.float32),
            kps.astype(jnp.float32),
        )


def _up2(x):
    """Nearest ×2 upsample (the FPN merge; Resize-nearest in the ONNX)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YuNet(nn.Module):
    """yunet_n backbone + TFPN + anchor-free heads at strides 8/16/32.

    ``width`` scales the 64-channel trunk (16-channel stem = width//4)
    so tests can run tiny variants through the identical code path.
    """

    width: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) float in [0, 1]; H, W divisible by 32.

        Returns per-stride head outputs
        ``{8: (cls, obj, box, kps), 16: ..., 32: ...}`` in NHWC.
        """
        w, dt = self.width, self.dtype
        stem = max(w // 4, 2)
        x = (x * 255.0).astype(dt)  # FaceDetectorYN feeds raw-pixel BGR
        x = ConvHead(stem, stem, dtype=dt, name="model0")(x, train)        # s2
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                          # s4
        x = Conv4LayerBlock(w, dtype=dt, name="model1")(x, train)
        x = Conv4LayerBlock(w, dtype=dt, name="model2")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                          # s8
        c3 = Conv4LayerBlock(w, dtype=dt, name="model3")(x, train)
        x = nn.max_pool(c3, (2, 2), strides=(2, 2))                         # s16
        c4 = Conv4LayerBlock(w, dtype=dt, name="model4")(x, train)
        x = nn.max_pool(c4, (2, 2), strides=(2, 2))                         # s32
        c5 = Conv4LayerBlock(w, dtype=dt, name="model5")(x, train)

        # top-down FPN: merge by nearest-up + add, refine with a DP unit
        p5 = ConvDPUnit(w, dtype=dt, name="neck2")(c5, train)
        p4 = ConvDPUnit(w, dtype=dt, name="neck1")(c4 + _up2(p5), train)
        p3 = ConvDPUnit(w, dtype=dt, name="neck0")(c3 + _up2(p4), train)

        out = {}
        for stride, feat in ((8, p3), (16, p4), (32, p5)):
            out[stride] = YuNetHead(dtype=dt, name=f"head_s{stride}")(feat, train)
        return out


def yunet_layer_order() -> List[Tuple]:
    """Parameterised layers in execution order for ONNX weight import
    (see :func:`fire_tpu.models.onnx_import.assign_yunet`).  Entries are
    (kind, flax_path, layer_eps)."""
    order: List[Tuple] = []

    def dp(path, bn=True):
        order.append(("conv", path + ("conv1",)))
        order.append(("conv", path + ("conv2",)))
        if bn:
            order.append(("bn", path + ("bn",), _BN_EPS))

    order.append(("conv", ("model0", "conv1")))
    order.append(("bn", ("model0", "bn1"), _BN_EPS))
    dp(("model0", "conv2"))
    for i in range(1, 6):
        dp((f"model{i}", "conv1"))
        dp((f"model{i}", "conv2"))
    # ONNX graph order is execution order: neck2 (p5) runs first
    for neck in ("neck2", "neck1", "neck0"):
        dp((neck,))
    for s in (8, 16, 32):
        dp((f"head_s{s}", "feat"))
        for o in ("cls", "obj", "box", "kps"):
            dp((f"head_s{s}", o), bn=False)
    return order


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
