"""Model families: FaceNet encoder + the three detector backends.

All models are Flax linen modules in NHWC layout with bf16 compute /
f32 params, designed so one jit covers preprocess → network → decode.
"""

from fire_tpu.models.facenet import FaceNet, facenet_128, facenet_512  # noqa: F401
from fire_tpu.models.yunet import YuNet  # noqa: F401
from fire_tpu.models.blazeface import BlazeFace  # noqa: F401
from fire_tpu.models.retinaface import RetinaFace  # noqa: F401
