"""Training subsystem: encoder (ArcFace) + all three detector slots.

The reference ships pretrained ONNX weights and has no training code;
this subsystem lets the rebuild (re)train every network on TPU — needed
both for from-scratch weights (the reference snapshot ships only LFS
stubs) and for fine-tuning at deployment scale.

Entry points:
  python -m fire_tpu.train               FaceNet encoder (ArcFace, dp×mp)
  python -m fire_tpu.train.detect        YuNet detector
  python -m fire_tpu.train.detect_blaze  BlazeFace (mediapipe slot)
  python -m fire_tpu.train.detect_retina RetinaFace
  python -m fire_tpu.train.synth         synthetic identity dataset
"""

from fire_tpu.train.losses import arcface_logits  # noqa: F401
from fire_tpu.train.trainer import TrainState, make_train_step  # noqa: F401
