"""Encoder training: ArcFace margin loss + sharded train step.

The reference ships pretrained ONNX weights and has no training code;
this subsystem lets the rebuild (re)train FaceNet on TPU — needed both
for from-scratch weights (the reference snapshot ships only LFS stubs)
and for fine-tuning at deployment scale.
"""

from fire_tpu.train.losses import arcface_logits  # noqa: F401
from fire_tpu.train.trainer import TrainState, make_train_step  # noqa: F401
