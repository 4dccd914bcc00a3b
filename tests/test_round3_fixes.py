"""Regression tests for the round-3 fix batch (VERDICT r2 items 4-6, 8
+ ADVICE r2 findings): batched shrink_db_ids semantics, cross-process
weight determinism, loud frame-skip batch rounding, embedding-dim
validation, the all-paths enrollment dedup window, and strict journal
record validation.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from fire_tpu.config import TrackerConfig
from fire_tpu.pipeline.recognizer import FaceRecognition
from tests.test_pipeline import FakeEngine


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
        return FaceRecognition(**defaults), eng

    return make


# ------------------------------------------------ batched shrink_db_ids ---

def _enroll(fr, label, vec):
    v = np.asarray(vec, np.float32)
    v = v / np.linalg.norm(v)
    did = fr.db_manager.add(label, v)
    fr.gallery.add(v, label, did)


def test_shrink_conflict_refusal_preserved(recog):
    """The batched pass must keep the reference's refusal to unify a
    group holding >1 distinct known labels (hnsw_manager.py:151-199,
    face_recognition.py:265-315)."""
    fr, eng = recog()
    base = eng.codebook[30]
    _enroll(fr, "alice", base)
    _enroll(fr, "bob", base + 0.01)           # conflicting known labels
    _enroll(fr, "Unknown_x1", base + 0.005)   # unknown caught in the group
    fr.shrink_db_ids(0.75)
    # nothing unified: alice and bob survive distinct
    assert "alice" in fr.gallery.labels and "bob" in fr.gallery.labels


def test_shrink_unifies_unknowns_into_known(recog):
    fr, eng = recog()
    base = eng.codebook[31]
    _enroll(fr, "carol", base)
    _enroll(fr, "Unknown_a", base + 0.01)
    _enroll(fr, "Unknown_b", base + 0.02)
    other = eng.codebook[32]
    _enroll(fr, "dave", other)
    fr.shrink_db_ids(0.75)
    assert fr.gallery.labels[:3] == ["carol", "carol", "carol"]
    assert fr.gallery.labels[3] == "dave"
    # SQLite (source of truth) relabelled too
    rows = {db_id: label for db_id, label, _ in fr.db_manager.load_all()}
    assert sorted(rows.values()) == ["carol", "carol", "carol", "dave"]


def test_shrink_saves_once(recog):
    """shrink defers the per-group compaction: one gallery.save() for
    the whole pass (VERDICT r2 missing #4 — O(N) host-synced queries
    and O(groups) snapshot rewrites both gone)."""
    fr, eng = recog()
    for i, col in enumerate((40, 41, 42)):
        base = eng.codebook[col]
        _enroll(fr, f"Unknown_p{i}", base)
        _enroll(fr, f"Unknown_q{i}", base + 0.01)
    calls = {"n": 0}
    orig = fr.gallery.save

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    fr.gallery.save = counting
    fr.shrink_db_ids(0.75)
    assert calls["n"] == 1
    assert len(set(fr.gallery.labels)) == 3  # three unified groups


def test_shrink_batched_queries(recog):
    """One query_batch pass instead of one host-synced query per id."""
    fr, eng = recog()
    for i in range(6):
        _enroll(fr, f"Unknown_{i}", eng.codebook[i])
    calls = {"batch": 0, "single": 0}
    orig_qb = fr.gallery.query_batch

    def counting_qb(embs, k=1):
        calls["batch"] += 1
        return orig_qb(embs, k)

    fr.gallery.query_batch = counting_qb
    fr.shrink_db_ids(0.75)
    assert calls["batch"] == 1


# ------------------------------------- cross-process weight determinism ---

_MATERIALIZE_SNIPPET = r"""
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin overrides the env var
import numpy as np, zlib
import jax.numpy as jnp
import flax.linen as nn
from fire_tpu.pipeline.engine import _materialize

class M(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(8)(x)
        x = nn.BatchNorm(use_running_average=True)(x)
        return nn.Dense(4)(x)

shapes = jax.eval_shape(M().init, jax.random.PRNGKey(0), jnp.zeros((1, 6)))
tree = _materialize(shapes, seed=3)
leaves = jax.tree_util.tree_leaves_with_path(tree)
acc = 0
for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
    acc = zlib.crc32(np.asarray(leaf).tobytes(), acc)
print(acc)
"""


def test_materialize_identical_across_processes(tmp_path):
    """VERDICT r2 weak #2: hash() is PYTHONHASHSEED-salted per process,
    so params_dir=None paths got different 'deterministic' weights every
    run.  The crc32 digest must yield bit-identical trees under
    different hash seeds."""
    outs = []
    for hash_seed in ("1", "271828"):
        env = dict(os.environ, PYTHONHASHSEED=hash_seed, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-c", _MATERIALIZE_SNIPPET],
            capture_output=True, text=True, env=env, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1]


# --------------------------------------------- frame-skip batch rounding ---

def test_batched_frameskip_rounds_batch_up(tmp_path, monkeypatch):
    """VERDICT r2 weak #1: batch_size not a multiple of the interval
    used to silently fall back to interval=1 (full per-frame detection).
    Now the batch rounds UP and frame-skip is preserved."""
    import cv2

    from fire_tpu.pipeline import batch_engine as be
    from tests.test_batch_engine import _fake_engine, _frame

    src = str(tmp_path / "in.avi")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"XVID"), 10, (64, 64))
    for _ in range(10):
        w.write(_frame([]))
    w.release()

    seen = {}
    real_bse = be.BatchStreamEngine

    class SpyBSE(real_bse):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            seen["interval"] = self.interval

        def submit(self, frames):
            seen.setdefault("batches", []).append(frames.shape[0])
            return super().submit(frames)

    monkeypatch.setattr(be, "BatchStreamEngine", SpyBSE)
    eng = _fake_engine()
    eng.detect_faces = lambda img: []
    eng.extract_faces = lambda img, align=True: []
    fr = FaceRecognition(
        detector_type="yunet", encoder_model_type="128",
        similarity_threshold=0.7, unknown_trigger_count=1,
        detection_interval=3, enable_logging=False,
        storage_root=str(tmp_path / "storage"),
        engine=eng, tracker_cfg=TrackerConfig(),
    )
    fr.process_video(src, annotate=False, batch_size=5)  # 5 % 3 != 0
    fr.close()
    assert seen["interval"] == 3          # frame-skip honored, not dropped
    assert all(b == 6 for b in seen["batches"])  # rounded 5 -> 6


# ------------------------------------------- embedding-dim validation ---

def test_recognize_skips_wrong_dim_embedding(recog):
    """face_recognition.py:436-439 parity: an embedding of the wrong
    size is skipped with an error, never matched or enrolled."""
    fr, eng = recog()
    eng.scene = [([100, 100, 80, 80], 5)]
    bad = np.ones((1, 64), np.float32)  # wrong dim (engine dim is 128)
    eng.encode_boxes = lambda image, boxes: np.repeat(bad, boxes.shape[0], 0)
    out = None
    for _ in range(6):
        out = fr.recognize_faces(np.zeros((480, 640, 3), np.uint8))
    assert out == []           # face skipped every frame
    assert fr.gallery.count == 0  # nothing enrolled


# --------------------------------------- all-paths enrollment dedup window ---

def test_enroll_window_sees_per_frame_enrollments(recog):
    """ADVICE r2: rows enrolled through _enroll_now (per-frame path)
    must be visible to the batched path's device-checked dedup."""
    fr, eng = recog()
    v = eng.codebook[7]
    fr._enroll_now("Unknown_seed0", v)  # per-frame style enrollment
    # batched path: device snapshot predates this row, so the batch
    # engine could not have checked it; the host window must catch it
    label = fr.enroll_unknown_now(v.copy(), device_checked=True)
    assert label == "Unknown_seed0"
    assert fr.gallery.count == 1


def test_enroll_window_sees_image_mode_enrollments(recog, tmp_path):
    """Image-mode enrollments route through _enroll_now too."""
    import cv2

    fr, eng = recog()
    eng.scene = [([10, 10, 50, 50], 21)]
    img = str(tmp_path / "x.jpg")
    cv2.imwrite(img, np.zeros((100, 100, 3), np.uint8))
    fr.process_image(img, annotate=False)
    assert fr.gallery.count == 1
    label = fr.gallery.labels[0]
    dup = fr.enroll_unknown_now(eng.codebook[21].copy(), device_checked=True)
    assert dup == label
    assert fr.gallery.count == 1


# ----------------------------------------------- journal strictness ---

def test_journal_index_less_record_migrates(tmp_path):
    """ADVICE r3 reversed the r2 stance: a legacy (round-2, index-less)
    journal written by an older build is VALID sequential data — migrate
    it instead of discarding it as corruption.  Full coverage lives in
    tests/test_gallery.py::test_gallery_legacy_journal_migrates; this
    pins the non-destructive outcome."""
    import pickle

    from fire_tpu.gallery.index import DeviceGallery

    paths = [str(tmp_path / n) for n in ("idx.bin", "lab.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    v = np.ones(16, np.float32)
    g.add(v, "a", 1)
    g.save(compact=True)
    # hand-write a legacy-format record (bare row list, no start index)
    payload = pickle.dumps([("b", 2, v.tobytes())])
    with open(paths[0] + ".journal", "ab") as f:
        f.write(len(payload).to_bytes(4, "little"))
        f.write(payload)
    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.labels == ["a", "b"]  # migrated, not discarded
    assert g2._force_compact  # and rewritten in the indexed format on save


def test_retinaface_size_flag_reaches_engine(tmp_path):
    """--retinaface_size N flows CLI → engine_cfg → DeviceEngine input
    (the deploy knob for `python -m fire_tpu.train.detect_retina`
    weights, which train at 512, vs the reference ONNX operating point
    of 1024)."""
    from fire_tpu.cli import build_parser
    from fire_tpu.config import EngineConfig
    from fire_tpu.pipeline.recognizer import FaceRecognition

    args = build_parser().parse_args(["--retinaface_size", "512"])
    assert args.retinaface_size == 512

    fr = FaceRecognition(
        detector_type="retinaface", encoder_model_type="128",
        enable_logging=False, storage_root=str(tmp_path / "s"),
        weights_dir=None,
        engine_cfg=EngineConfig(retinaface_size=(64, 64),
                                detect_size=(64, 64)),
    )
    assert fr.engine._detect_input == (64, 64)
    fr.close()
