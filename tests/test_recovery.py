"""Failure-detection / recovery semantics (SURVEY.md §5)."""

import numpy as np

from fire_tpu.config import TrackerConfig
from fire_tpu.pipeline.recognizer import FaceRecognition
from tests.test_pipeline import FakeEngine


def _make(tmp_path, **kw):
    eng = FakeEngine()
    fr = FaceRecognition(
        detector_type="yunet", encoder_model_type="128",
        similarity_threshold=0.7, unknown_trigger_count=1,
        detection_interval=1, enable_logging=False,
        storage_root=str(tmp_path / "storage"), engine=eng,
        tracker_cfg=TrackerConfig(), **kw,
    )
    return fr, eng


def test_corrupt_gallery_rebuilds_from_sqlite(tmp_path, rng):
    """SQLite is the source of truth: a corrupted index file triggers a
    lossless rebuild (hnsw_manager.py:69-76 + face_recognition.py:151-155)."""
    fr, eng = _make(tmp_path)
    eng.scene = [([10, 10, 50, 50], 5)]
    for _ in range(6):
        fr.recognize_faces(np.zeros((100, 100, 3), np.uint8))
    label = fr.gallery.labels[0]
    assert fr.db_manager.count() == 1
    fr.close()

    # corrupt the persisted index triplet
    import glob

    for f in glob.glob(str(tmp_path / "storage" / "**" / "hnsw" / "*"), recursive=True):
        with open(f, "wb") as fh:
            fh.write(b"garbage")

    fr2, eng2 = _make(tmp_path)
    assert fr2.gallery.count == 1  # rebuilt from SQLite
    assert fr2.gallery.labels == [label]


def test_bad_frame_does_not_kill_stream(tmp_path, monkeypatch):
    """A frame that raises inside recognition is skipped; the stream
    keeps going (SURVEY.md §5: 'skip bad frame, never crash')."""
    import cv2

    fr, eng = _make(tmp_path)
    path = str(tmp_path / "clip.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"XVID"), 10, (64, 64))
    for _ in range(10):
        w.write(np.zeros((64, 64, 3), np.uint8))
    w.release()

    calls = {"n": 0}
    orig = fr.recognize_faces

    def flaky(frame, rename_label=None):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("boom on frame 3")
        return orig(frame, rename_label)

    fr.recognize_faces = flaky
    fr.process_video(path)
    assert calls["n"] == 10  # all frames attempted despite the failure


def test_degenerate_detection_floored_like_reference(tmp_path):
    """A 0×0 detection still becomes a track (the UKF floors box size
    to 10 px, sort_UKF.py:274-277) — behaviour parity, not a skip."""
    fr, eng = _make(tmp_path)
    eng.scene = [([50, 50, 0, 0], 5)]
    for _ in range(6):
        out = fr.recognize_faces(np.zeros((100, 100, 3), np.uint8))
    assert len(out) == 1
    assert out[0]["bbox"][2] >= 6  # floored box, clamped to frame


def test_out_of_frame_track_skipped(tmp_path):
    """A track fully outside the frame yields a zero-size crop and is
    skipped without crashing (face_recognition.py:417-420)."""
    fr, eng = _make(tmp_path)
    eng.scene = [([150, 150, 0, 0], 5)]
    for _ in range(6):
        out = fr.recognize_faces(np.zeros((100, 100, 3), np.uint8))
    assert out == []
    assert fr.gallery.count == 0


def test_corrupt_params_cache_regenerates(tmp_path):
    """A truncated params cache (e.g. a killed process mid-write) must
    regenerate from fresh init, not crash engine construction — the
    same recovery contract as the gallery index (SURVEY §5)."""
    import os

    from fire_tpu.config import EngineConfig, RecognizerConfig
    from fire_tpu.models.facenet import tiny_facenet
    from fire_tpu.models.yunet import YuNet
    from fire_tpu.pipeline.engine import DeviceEngine

    import jax.numpy as jnp

    cfg = RecognizerConfig(
        detector_type="yunet", encoder_model_type="128", weights_dir=None,
        engine=EngineConfig(detect_size=(64, 64), encode_size=(96, 96)),
    ).with_embedding_dim()
    pdir = str(tmp_path / "params")

    def make():
        return DeviceEngine(
            cfg, detector=YuNet(width=8, dtype=jnp.float32),
            encoder=tiny_facenet(128, dtype=jnp.float32), params_dir=pdir)

    eng = make()
    path = eng._params_path()
    assert os.path.exists(path)
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[: len(blob) // 2])  # truncated mid-write
    eng2 = make()  # must not raise
    assert os.path.getsize(eng2._params_path()) == len(blob)
