"""Exact storage layout + file naming contracts (SURVEY.md §2.2:
``storage/<detector>_<encoder>_<encrypted?>/{db,hnsw}/...`` with the
reference's file names, face_recognition.py:87-128)."""

import os

import numpy as np

from fire_tpu.config import TrackerConfig
from fire_tpu.pipeline.recognizer import FaceRecognition
from tests.test_pipeline import FakeEngine


def _make(tmp_path, password=None):
    return FaceRecognition(
        detector_type="yunet", encoder_model_type="128",
        similarity_threshold=0.7, unknown_trigger_count=1,
        detection_interval=1, enable_logging=False,
        storage_root=str(tmp_path / "storage"),
        encryption_password=password,
        engine=FakeEngine(), tracker_cfg=TrackerConfig(),
    )


def test_unencrypted_layout(tmp_path):
    fr = _make(tmp_path)
    fr.engine.scene = [([10, 10, 50, 50], 5)]
    for _ in range(6):
        fr.recognize_faces(np.zeros((100, 100, 3), np.uint8))
    fr.close()
    base = tmp_path / "storage" / "yunet_128_unencrypted"
    assert (base / "db" / "face_embeddings_yunet_128.db").exists()
    for name in ("hnsw_index_yunet_128.bin", "hnsw_labels_yunet_128.pkl",
                 "hnsw_db_ids_yunet_128.pkl"):
        assert (base / "hnsw" / name).exists(), name


def test_encrypted_layout(tmp_path):
    fr = _make(tmp_path, password="pw")
    fr.engine.scene = [([10, 10, 50, 50], 5)]
    for _ in range(6):
        fr.recognize_faces(np.zeros((100, 100, 3), np.uint8))
    fr.close()
    base = tmp_path / "storage" / "yunet_128_encrypted"
    assert (base / "db" / "face_embeddings_yunet_128.db.enc").exists()
    # no plaintext db present
    assert not (base / "db" / "face_embeddings_yunet_128.db").exists()
    # index triplet exists and is ciphertext (not a .npy header)
    idx = base / "hnsw" / "hnsw_index_yunet_128.bin"
    assert idx.exists()
    with open(idx, "rb") as f:
        assert not f.read(8).startswith(b"\x93NUMPY")


def test_custom_paths_respected(tmp_path):
    fr = FaceRecognition(
        detector_type="yunet", encoder_model_type="128",
        enable_logging=False, storage_root=str(tmp_path / "s"),
        hnsw_index_path=str(tmp_path / "custom_idx.bin"),
        hnsw_labels_path=str(tmp_path / "custom_lab.pkl"),
        hnsw_db_ids_path=str(tmp_path / "custom_ids.pkl"),
        sqlite_db_path=str(tmp_path / "custom.db"),
        engine=FakeEngine(), tracker_cfg=TrackerConfig(),
        unknown_trigger_count=1, detection_interval=1,
        similarity_threshold=0.7,
    )
    fr.engine.scene = [([10, 10, 50, 50], 5)]
    for _ in range(6):
        fr.recognize_faces(np.zeros((100, 100, 3), np.uint8))
    fr.close()
    assert (tmp_path / "custom_idx.bin").exists()
    assert (tmp_path / "custom.db").exists()


def test_webcam_duration_stops(tmp_path, monkeypatch):
    """process_webcam honours the duration parameter
    (face_recognition.py:805-807) using a fake capture device."""
    import itertools
    import time as _time

    class FakeCap:
        def __init__(self, *a):
            self.n = 0

        def isOpened(self):
            return True

        def read(self):
            self.n += 1
            _time.sleep(0.01)
            return True, np.zeros((64, 64, 3), np.uint8)

        def get(self, *a):
            return 30.0

        def release(self):
            pass

    import cv2

    monkeypatch.setattr(cv2, "VideoCapture", FakeCap)
    fr = _make(tmp_path)
    fr.engine.scene = []
    t0 = _time.time()
    fr.process_webcam(annotate=False, duration=1)
    assert _time.time() - t0 < 10
    assert fr.timer.frame_count > 0
