"""End-to-end orchestration: device engine, recognizer, stream pipeline,
annotation, and stage timing."""

from fire_tpu.pipeline.engine import DeviceEngine  # noqa: F401
from fire_tpu.pipeline.recognizer import FaceRecognition  # noqa: F401
