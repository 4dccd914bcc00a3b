"""Typed configuration for the whole framework.

Every numeric contract of the reference implementation (SURVEY.md §2.2)
lives here as an explicit, documented field instead of being scattered
through module-level constants.  Reference provenance is cited per field
(``file:line`` refers to /root/reference).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """SORT + UKF tracker parameters.

    Values mirror the reference wiring ``Sort(max_age=4, min_hits=4,
    iou_threshold=0.3)`` (modules/tracker.py:7) and the ``Track`` UKF
    constants (sort_UKF.py:95-153).
    """

    max_tracks: int = 64  # static capacity of the vmapped track table
    max_age: int = 4
    min_hits: int = 4
    iou_threshold: float = 0.3
    max_distance: float = 200.0  # centre-distance normaliser (sort_UKF.py:307)

    # UKF (sort_UKF.py:95-118)
    dim_x: int = 10
    dim_z: int = 4
    merwe_alpha: float = 1e-3
    merwe_beta: float = 2.0
    merwe_kappa: float = 0.0
    q_pos: float = 5.0
    q_vel: float = 70.0
    q_acc: float = 3.0
    r_diag: float = 10.0

    # State clamps (sort_UKF.py:78-79,150-153,274-275)
    # math.log, NOT jnp.log: importing config must never initialize a JAX
    # backend (a flaky TPU tunnel would make the whole package unimportable).
    min_log_area: float = math.log(10.0)
    min_log_aspect: float = math.log(0.5)
    max_velocity: float = 30.0
    max_acceleration: float = 20.0
    min_wh: float = 10.0
    max_wh: float = 720.0

    # "hungarian" = exact reference optimum, solved ON DEVICE inside jit
    # (JV shortest-augmenting-path, track/assignment.py:lap_assign);
    # "hungarian_host" = the same optimum on host (native C++/SciPy,
    # kept as the float64 oracle); "greedy" = cheaper device matching.
    assignment: str = "hungarian"


@dataclasses.dataclass(frozen=True)
class GalleryConfig:
    """Identity gallery (replaces hnswlib; modules/hnsw_manager.py).

    The device index is an exact cosine top-k over an HBM-resident
    normalized embedding matrix instead of an approximate HNSW graph.
    Capacity mirrors the reference hard cap of 100,000
    (modules/hnsw_manager.py:29).
    """

    capacity: int = 100_000
    embedding_dim: int = 128

    # Recent-embedding FIFO cache (face_recognition.py:157-159).
    max_recent: int = 200
    # New-embedding write buffer (face_recognition.py:161-163).
    max_new: int = 250

    # group-relabel search width (hnsw_manager.py:170,237)
    group_k: int = 50

    @property
    def padded_capacity(self) -> int:
        """Capacity rounded up to the TPU lane width for clean tiling."""
        return _round_up(self.capacity, 128)

    @property
    def padded_recent(self) -> int:
        return _round_up(self.max_recent, 128)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Static shapes + dtypes of the jitted device graphs."""

    # Per-frame face cap: detector outputs are padded/masked to this.
    max_faces: int = 32
    # Max faces encoded per device step (compacted, bucket-padded).
    max_encode: int = 16
    # Frames per device batch in the stream pipeline.
    frame_batch: int = 8
    # Detector input resolution (H, W); frames are letterboxed to this.
    detect_size: Tuple[int, int] = (640, 640)
    # RetinaFace (offline accuracy path) runs at higher resolution,
    # mirroring the reference's scale-to-[1024,1980] preprocess
    # (processing/preprocess.py:133).
    retinaface_size: Tuple[int, int] = (1024, 1024)
    # BlazeFace (mediapipe fast slot) input.  128 is the published
    # short-range contract (the resolution reference TFLite weights are
    # trained for — importing them forces this back to 128); the model
    # is fully convolutional, so the from-scratch trained weights run
    # at 192 (2016 anchors) for a sharper localization tail — the CLI's
    # trained-default, mirroring retinaface_size=512 (round 5).
    blazeface_size: Tuple[int, int] = (128, 128)
    # FaceNet input (facenet_gpu.py:110).
    encode_size: Tuple[int, int] = (160, 160)

    # Dtype for conv/matmul compute; params master in f32.
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Letterbox resampling runs in bf16 straight from uint8 by default
    # (half the HBM traffic; ≤0.4% intensity quantization — docs/DESIGN.md).
    # Set True to restore the reference's f32 preprocessing numerics for
    # strict parity runs (a borderline detection whose score sits exactly
    # at the confidence threshold can flip between the two).
    strict_f32_preprocess: bool = False
    # Sibling knob for the gallery: matching normally runs against a
    # resident bf16 shadow of the embedding matrix (half the HBM read;
    # ~0.4%/element quantization can flip borderline 0.7/0.75 threshold
    # decisions).  Set True to route query/find_similar through the f32
    # master for strict reference-parity numerics.
    strict_f32_match: bool = False

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def pdtype(self):
        return jnp.dtype(self.param_dtype)


@dataclasses.dataclass(frozen=True)
class RecognizerConfig:
    """End-to-end recognizer semantics (modules/face_recognition.py:26-47).

    Defaults mirror the reference constructor; the CLI overrides them
    exactly the way the reference ``main.py:80-97`` does
    (similarity_threshold=0.7, unknown_trigger_count=1, interval forced
    to 1 in image mode).
    """

    detector_type: str = "yunet"  # yunet | retinaface | mediapipe(=blazeface)
    align: bool = True
    encoder_model_type: str = "128"  # "128" | "512"
    encoder_mode: str = "gpu_optimized"  # accepted for CLI parity; ignored on TPU
    similarity_threshold: float = 0.5
    unknown_similarity_threshold: float = 0.6
    unknown_trigger_count: int = 3
    enable_logging: bool = True
    show: bool = False
    detection_interval: int = 3
    # Batched-path encode budget: cap crop+encode+match work at the
    # batch's top-N detections by score (None = encode every tracked
    # slot).  Tracking capacity (encode_k per frame) is unaffected;
    # budget-starved detections are tracked without an embedding this
    # batch and encoded on a later sighting.  With a typical
    # faces-per-frame ≪ encode_k, budget ≈ expected faces × batch
    # reclaims the encoder time spent on pad slots (the encoder is
    # ~48% of the fused step at B=256 — docs/DESIGN.md §3).
    encode_budget: Optional[int] = None
    encryption_password: Optional[str] = None
    interested_label: Optional[str] = None

    # Directory holding the reference's ONNX weight files
    # (weights/facenet{128,512}.onnx, face_detection_yunet_2023mar.onnx,
    # retinaface.onnx — facenet_gpu.py:14, yunet_face_detector.py:20).
    # When the files exist they are imported into the Flax models at
    # startup (fire_tpu.models.onnx_import); a topology mismatch falls
    # back to running the file's exact graph via onnx_exec.  Git-LFS
    # stubs / missing files leave the deterministic random init in place.
    weights_dir: Optional[str] = "weights"

    # storage layout roots (face_recognition.py:87-128)
    storage_root: str = "storage"
    hnsw_index_path: Optional[str] = None
    hnsw_labels_path: Optional[str] = None
    hnsw_db_ids_path: Optional[str] = None
    sqlite_db_path: Optional[str] = None
    sqlite_db_encrypted_path: Optional[str] = None

    tracker: TrackerConfig = dataclasses.field(default_factory=TrackerConfig)
    gallery: GalleryConfig = dataclasses.field(default_factory=GalleryConfig)
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)

    # detector thresholds, per backend (yunet_face_detector.py:10-11,
    # retinaface_face_detector.py:55,76, mediapipe_face_detector.py:13)
    yunet_conf_threshold: float = 0.90
    yunet_nms_threshold: float = 0.3
    yunet_top_k: int = 5000
    retinaface_threshold: float = 0.9
    retinaface_nms_threshold: float = 0.4
    blazeface_conf_threshold: float = 0.8
    # The reference's mediapipe extract_faces path runs a SECOND detector
    # config (model_selection=0, min_detection_confidence=0.5,
    # mediapipe_face_detector.py:109-131) — honored here as a lower
    # confidence threshold on the extraction detect variant.
    blazeface_extract_conf_threshold: float = 0.5

    @property
    def embedding_dim(self) -> int:
        return 512 if self.encoder_model_type == "512" else 128

    def with_embedding_dim(self) -> "RecognizerConfig":
        """Return a copy whose gallery dim matches the encoder."""
        gal = dataclasses.replace(self.gallery, embedding_dim=self.embedding_dim)
        return dataclasses.replace(self, gallery=gal)


# Canonical 3-point alignment template: (left_eye, right_eye, nose) in a
# 160x160 canvas — (0.35,0.35)/(0.65,0.35)/(0.5,0.55)·160
# (yunet_face_detector.py:145-148 and identically in the retinaface /
# mediapipe extractors).
ALIGN_TEMPLATE_160 = (
    (0.35 * 160.0, 0.35 * 160.0),
    (0.65 * 160.0, 0.35 * 160.0),
    (0.50 * 160.0, 0.55 * 160.0),
)
