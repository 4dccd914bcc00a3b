"""Reference-shaped factory entry points.

The reference exposes small factories users may call directly:
``initialize_detector(type) -> (detect_faces, extract_faces)``
(modules/detector.py:6-23), ``initialize_tracker() -> Sort``
(modules/tracker.py:6-7), and an ``Encoder`` wrapper with
``encode``/``preprocess_for_encoder`` (modules/encoder.py:9-27).
These shims provide the same call signatures on top of the TPU engine.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from fire_tpu.config import RecognizerConfig, TrackerConfig
from fire_tpu.pipeline.engine import DeviceEngine
from fire_tpu.track.sort import Sort


def initialize_detector(detector_type: str, cfg: Optional[RecognizerConfig] = None):
    """(detect_faces, extract_faces) duck-typed pair, one engine under
    the hood (modules/detector.py contract)."""
    detector_type = detector_type.lower()
    if detector_type not in ("yunet", "retinaface", "mediapipe", "blazeface"):
        raise ValueError(
            "Invalid detector_type. Choose from 'yunet', 'retinaface', 'mediapipe'."
        )
    cfg = (cfg or RecognizerConfig())
    import dataclasses

    cfg = dataclasses.replace(cfg, detector_type=detector_type).with_embedding_dim()
    engine = DeviceEngine(cfg)
    return engine.detect_faces, engine.extract_faces


def initialize_tracker() -> Sort:
    """Sort(max_age=4, min_hits=4, iou_threshold=0.3) — the reference
    wiring (modules/tracker.py:7)."""
    return Sort(TrackerConfig(max_age=4, min_hits=4, iou_threshold=0.3))


class Encoder:
    """modules/encoder.py:9-27 contract on the TPU engine.

    ``preprocess_for_encoder``: resize to 160×160 (area), /255, add
    batch dim — NHWC float like the reference.  ``encode``: batched
    FaceNet forward (unnormalized embedding, as the reference returns).
    """

    def __init__(self, encoder_model_type: str = "128", encoder_mode: str = "cpu_optimized",
                 engine: Optional[DeviceEngine] = None):
        import dataclasses

        cfg = dataclasses.replace(
            RecognizerConfig(), encoder_model_type=encoder_model_type or "128"
        ).with_embedding_dim()
        self.engine = engine or DeviceEngine(cfg)
        self.input_shape = (160, 160)
        self.output_shape = cfg.embedding_dim

    def preprocess_for_encoder(self, face_img: np.ndarray) -> np.ndarray:
        import cv2

        resized = cv2.resize(face_img, self.input_shape, interpolation=cv2.INTER_AREA)
        img = resized.astype(np.float32) / 255.0
        if not (img.ndim == 3 and img.shape[2] == 3):
            raise ValueError("Face image has incorrect shape for encoder.")
        return img[None]

    def encode(self, face_img: np.ndarray) -> np.ndarray:
        """(B, 160, 160, 3) float [0,1] → (B, D) embedding."""
        import jax

        emb = self.engine.encoder.apply(
            self.engine.enc_vars, jax.device_put(np.asarray(face_img, np.float32))
        )
        return np.asarray(emb)
