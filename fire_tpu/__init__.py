"""FIRE-TPU: TPU-native real-time face identification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``IvanYachUkr/FACE-Identification-in-Real-time-Environments-FIRE``
(reference mounted at /root/reference): face detection (YuNet,
RetinaFace, BlazeFace-class fast path), FaceNet-128/512 embedding,
SORT tracking with a 10-dim UKF, exact cosine top-k gallery matching
(replacing hnswlib), SQLite + Fernet-encrypted persistence, and
image/video/webcam pipelines — redesigned TPU-first:

* All hot compute (detector CNNs, FaceNet, box decode, NMS, affine
  alignment, gallery matmul, UKF) runs inside jitted XLA graphs with
  static shapes and mask-based control flow.
* Faces are batched per frame and frames are batched per device step;
  nothing goes through the MXU one sample at a time.
* Multi-chip scale-up uses ``jax.sharding.Mesh`` + ``shard_map``
  (sharded gallery rows, data-parallel streams) — see
  :mod:`fire_tpu.parallel`.
* The host side (video I/O, SQLite, crypto, annotation) stays on CPU
  where the reference also used host libraries, overlapped with device
  compute by the stream pipeline.
"""

__version__ = "0.1.0"

from fire_tpu.config import (  # noqa: F401
    EngineConfig,
    RecognizerConfig,
    TrackerConfig,
    GalleryConfig,
)
