"""Pipeline integration tests on synthetic scenes.

A FakeEngine stands in for the device CNNs: detections come from a
scripted scene and embeddings from a fixed per-identity codebook, so
these tests pin down the ORCHESTRATION semantics (three-tier matching,
unknown lifecycle, rename/unify, persistence, frame skip) exactly as
SURVEY.md §2.2 specifies, independent of model weights.
"""

import os

import numpy as np
import pytest

from fire_tpu.config import TrackerConfig
from fire_tpu.pipeline.recognizer import FaceRecognition


class FakeEngine:
    """Minimal DeviceEngine stand-in driven by ``scene``:
    a list of (bbox_xywh, identity:int) pairs per frame."""

    def __init__(self, dim=128, seed=0):
        self.dim = dim
        rng = np.random.default_rng(seed)
        codes = rng.standard_normal((64, dim)).astype(np.float32)
        self.codebook = codes / np.linalg.norm(codes, axis=1, keepdims=True)
        self.scene = []  # [(bbox, ident), ...]
        self.encode_calls = 0

    def _ident_for_box(self, box):
        bx = np.asarray(box, np.float32)
        best, best_d = None, 1e18
        for sb, ident in self.scene:
            d = np.abs(np.asarray(sb, np.float32) - bx).sum()
            if d < best_d:
                best, best_d = ident, d
        return best

    def detect_faces(self, image):
        return [
            {"bbox": list(b), "landmarks": np.zeros((5, 2), np.int32), "confidence": 0.95}
            for b, _ in self.scene
        ]

    def extract_faces(self, image, align=True):
        return [np.zeros((160, 160, 3), np.float32) + ident for _, ident in self.scene]

    def encode_boxes(self, image, boxes):
        self.encode_calls += 1
        out = []
        for b in boxes:
            ident = self._ident_for_box(b)
            out.append(self.codebook[ident])
        return np.stack(out) if out else np.zeros((0, self.dim), np.float32)

    def encode_faces(self, faces):
        # extract_faces stashed the identity in the pixel values
        out = [self.codebook[int(round(float(f[0, 0, 0])))] for f in faces]
        return np.stack(out) if out else np.zeros((0, self.dim), np.float32)


@pytest.fixture
def recog(tmp_path):
    def make(**kw):
        eng = FakeEngine()
        defaults = dict(
            detector_type="yunet",
            encoder_model_type="128",
            similarity_threshold=0.7,
            unknown_trigger_count=1,
            detection_interval=1,
            enable_logging=False,
            storage_root=str(tmp_path / "storage"),
            engine=eng,
            tracker_cfg=TrackerConfig(),
        )
        defaults.update(kw)
        fr = FaceRecognition(**defaults)
        return fr, eng

    return make


def _track_until_confirmed(fr, eng, scene, frames=6):
    out = []
    for _ in range(frames):
        eng.scene = scene
        out = fr.recognize_faces(np.zeros((480, 640, 3), np.uint8))
    return out


def test_unknown_enrollment_and_reidentification(recog):
    fr, eng = recog()
    out = _track_until_confirmed(fr, eng, [([100, 100, 80, 80], 5)])
    assert len(out) == 1
    label = out[0]["label"]
    assert label.startswith("Unknown_")  # enrolled as Unknown_<8 hex> (face_recognition.py:317-320)
    assert len(label) == len("Unknown_") + 8
    assert fr.gallery.count == 1

    # same identity in a NEW session of tracks → re-identified, not re-enrolled
    fr.face_tracker.reset()
    fr.track_id_to_label.clear()
    fr.recent_embeddings = np.empty((0, eng.dim), np.float32)
    fr.recent_labels = []
    out = _track_until_confirmed(fr, eng, [([300, 200, 80, 80], 5)])
    assert out[0]["label"] == label
    assert fr.gallery.count == 1


def test_track_label_cache_avoids_reencode(recog):
    """Tier 1: once a track is labelled, no more encoding for it
    (face_recognition.py:408-410)."""
    fr, eng = recog()
    _track_until_confirmed(fr, eng, [([100, 100, 80, 80], 3)], frames=6)
    calls_before = eng.encode_calls
    _track_until_confirmed(fr, eng, [([104, 104, 80, 80], 3)], frames=5)
    assert eng.encode_calls == calls_before  # cached label, zero encodes


def test_recent_cache_tier(recog):
    """Tier 2: a new track of a recently-seen identity matches the
    recent cache (face_recognition.py:450-456)."""
    fr, eng = recog()
    out = _track_until_confirmed(fr, eng, [([100, 100, 80, 80], 7)])
    label = out[0]["label"]
    assert fr.recent_embeddings.shape[0] == 1
    # wipe gallery to prove the recent cache alone can answer
    fr.gallery.labels[0] = label
    fr.face_tracker.reset()
    fr.track_id_to_label.clear()
    out = _track_until_confirmed(fr, eng, [([400, 300, 80, 80], 7)])
    assert out[0]["label"] == label


def test_rename_label_streaming(recog):
    """webcam --label semantics: matched/new faces renamed
    (face_recognition.py:467-469,322-334)."""
    fr, eng = recog()
    eng.scene = [([50, 50, 60, 60], 2)]
    for _ in range(6):
        out = fr.recognize_faces(np.zeros((480, 640, 3), np.uint8), rename_label="ivan")
    assert out[0]["label"] == "ivan"
    assert "ivan" in fr.gallery.labels


def test_interested_label_filters(recog):
    fr, eng = recog(interested_label="nobody")
    out = _track_until_confirmed(fr, eng, [([10, 10, 50, 50], 1)])
    assert out == []  # enrolled but filtered from results (face_recognition.py:479-480)
    assert fr.gallery.count == 1


def test_frame_skip_detection_interval(recog):
    fr, eng = recog(detection_interval=3)
    fr.detection_interval = 3
    det_calls = {"n": 0}
    orig = eng.detect_faces

    def counting(image):
        det_calls["n"] += 1
        return orig(image)

    fr.detect_faces = counting
    eng.scene = [([100, 100, 80, 80], 4)]
    for _ in range(9):
        fr.recognize_faces(np.zeros((480, 640, 3), np.uint8))
    # frames 3, 6, 9 → 3 detector calls (face_recognition.py:376-393)
    assert det_calls["n"] == 3


def test_add_face_and_dedup(recog):
    fr, eng = recog()
    eng.scene = [([10, 10, 50, 50], 9)]
    assert fr.add_face(np.zeros((100, 100, 3), np.uint8), "grace")
    fr._flush_new_embeddings()
    assert fr.gallery.labels == ["grace"]
    # adding the same face again is refused (face_recognition.py:231-238)
    assert not fr.add_face(np.zeros((100, 100, 3), np.uint8), "grace2")
    assert fr.gallery.count == 1


def test_persistence_across_sessions(recog, tmp_path):
    fr, eng = recog()
    _track_until_confirmed(fr, eng, [([100, 100, 80, 80], 11)])
    label = fr.gallery.labels[0]
    fr.close()

    # new session, same storage: gallery reloads (or rebuilds from SQLite)
    fr2, eng2 = recog()
    assert fr2.gallery.count == 1
    assert fr2.gallery.labels == [label]
    out = _track_until_confirmed(fr2, eng2, [([200, 100, 80, 80], 11)])
    assert out[0]["label"] == label


def test_shrink_db_ids_unifies(recog):
    fr, eng = recog()
    # enroll two near-identical embeddings under different unknown labels
    base = eng.codebook[20]
    for i, eps in enumerate((0.0, 0.01)):
        v = base + eps
        v = v / np.linalg.norm(v)
        did = fr.db_manager.add(f"Unknown_aa{i}", v.astype(np.float32))
        fr.gallery.add(v.astype(np.float32), f"Unknown_aa{i}", did)
    fr.shrink_db_ids(0.75)
    assert len(set(fr.gallery.labels)) == 1


def test_encrypted_end_to_end(tmp_path):
    eng = FakeEngine()
    kw = dict(
        detector_type="yunet", encoder_model_type="128",
        similarity_threshold=0.7, unknown_trigger_count=1,
        detection_interval=1, enable_logging=False,
        storage_root=str(tmp_path / "enc_storage"),
        encryption_password="s3cret", engine=eng,
    )
    fr = FaceRecognition(**kw)
    eng.scene = [([100, 100, 80, 80], 13)]
    for _ in range(6):
        out = fr.recognize_faces(np.zeros((480, 640, 3), np.uint8))
    label = out[0]["label"]
    fr.close()

    # files on disk are encrypted
    enc_dir = tmp_path / "enc_storage" / "yunet_128_encrypted"
    db_files = list((enc_dir / "db").glob("*.enc"))
    assert db_files and db_files[0].stat().st_size > 0
    with open(db_files[0], "rb") as f:
        assert b"SQLite format 3" not in f.read(100)

    # reopen with the right password
    eng2 = FakeEngine()
    fr2 = FaceRecognition(**{**kw, "engine": eng2})
    assert fr2.gallery.labels == [label]


def test_process_frames_in_ram_source(tmp_path):
    """process_frames: pre-decoded in-RAM frames run the identical
    batched stream loop (annotate + write + enroll) with no video file
    (VERDICT r3 #7 bench surface; FrameSequenceCapture shim)."""
    import cv2
    from tests.test_batch_engine import _fake_engine, _frame

    eng = _fake_engine()
    eng.detect_faces = lambda img: []
    eng.extract_faces = lambda img, align=True: []
    fr = FaceRecognition(
        detector_type="yunet", encoder_model_type="128",
        similarity_threshold=0.7, unknown_trigger_count=1,
        detection_interval=1, enable_logging=False,
        storage_root=str(tmp_path / "storage"), engine=eng,
        tracker_cfg=TrackerConfig(),
    )
    out_path = str(tmp_path / "out.avi")
    # a generator source: 10 frames with one face throughout
    fr.process_frames(
        (_frame([((10, 20, 16, 16), 4)]) for _ in range(10)),
        annotate=True, save_path=out_path, batch_size=4,
    )
    assert fr.gallery.count == 1  # identity enrolled through the loop
    fr.close()
    cap = cv2.VideoCapture(out_path)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 10  # all real frames written, pad frames dropped

    # empty source: clean no-op
    fr2 = FaceRecognition(
        detector_type="yunet", encoder_model_type="128",
        enable_logging=False, storage_root=str(tmp_path / "s2"), engine=eng,
        tracker_cfg=TrackerConfig(),
    )
    fr2.process_frames(iter(()), batch_size=4)
    fr2.close()


def test_batched_video_encrypted_output(tmp_path):
    """--password with --batch_size N must encrypt the output video via
    the temp-file flow, exactly like the classic path
    (face_recognition.py:750-758,810-821) — VERDICT r1 gap #3."""
    import cv2
    from tests.test_batch_engine import _fake_engine, _frame
    from fire_tpu.gallery.crypto import Encryptor

    src = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"XVID"), 10, (64, 64))
    for _ in range(10):
        w.write(_frame([]))  # no faces: codec noise cannot break parsing
    w.release()

    eng = _fake_engine()
    eng.detect_faces = lambda img: []
    eng.extract_faces = lambda img, align=True: []
    fr = FaceRecognition(
        detector_type="yunet", encoder_model_type="128",
        similarity_threshold=0.7, unknown_trigger_count=1,
        detection_interval=1, enable_logging=False,
        storage_root=str(tmp_path / "storage"),
        encryption_password="s3cret", engine=eng,
        tracker_cfg=TrackerConfig(),
    )
    out_path = str(tmp_path / "out.avi")
    fr.process_video(src, annotate=True, save_path=out_path, batch_size=4)
    fr.close()

    assert os.path.exists(out_path)
    with open(out_path, "rb") as f:
        blob = f.read()
    assert not blob.startswith(b"RIFF")  # encrypted on disk
    plain = Encryptor("s3cret").decrypt_data(blob)
    assert plain.startswith(b"RIFF")  # decrypts to a real AVI
    dec = str(tmp_path / "dec.avi")
    with open(dec, "wb") as f:
        f.write(plain)
    cap = cv2.VideoCapture(dec)
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 10  # tail batch padded + truncated correctly
