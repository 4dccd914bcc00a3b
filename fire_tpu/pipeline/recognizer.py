"""FaceRecognition orchestrator — the reference's L2 pipeline runtime,
re-designed around batched device steps.

API, storage layout, and behavioural contracts mirror
modules/face_recognition.py (every rule of SURVEY.md §2.2):

* storage layout ``storage/<detector>_<encoder>_<encrypted?>/{db,hnsw}``
  with the reference's file names (face_recognition.py:87-128);
* three-tier matching — track-label cache → ≤200-entry recent cache →
  gallery query — with cosine threshold semantics
  (face_recognition.py:408-469);
* unknown-face lifecycle: per-track accumulation, mean-embedding
  enrollment as ``Unknown_<uuid4hex[:8]>`` after ``unknown_trigger_count``
  sightings unless within threshold of an existing entry
  (face_recognition.py:317-369);
* enrollment dedup in add_face (face_recognition.py:231-238), write
  buffer of ``max_new`` (face_recognition.py:177-196);
* rename/merge semantics incl. ``shrink_db_ids``
  (face_recognition.py:265-315,511-565);
* frame skipping: detection every Nth frame, tracker coasting between
  (face_recognition.py:376-393);
* ``interested_label`` filtering (face_recognition.py:479-480);
* encrypted outputs via temp files (face_recognition.py:567-575,
  683-692, 750-758, 810-821); per-run timing reports
  (face_recognition.py:577-581,694-698,865-876).

What changed (TPU-first):

* detection, alignment and encoding are jitted batched device graphs
  (fire_tpu.pipeline.engine) — all faces of a frame encode in one
  MXU pass instead of one ``session.run`` per face;
* hnswlib is replaced by the exact HBM cosine top-k gallery
  (fire_tpu.gallery.index);
* the tracker is the vmapped device SORT (fire_tpu.track.sort);
* video decode is prefetched on a host thread
  (fire_tpu.pipeline.stream) so I/O overlaps device compute;
* both encode paths feed RGB (the documented deviation from the
  reference's BGR-crop quirk, SURVEY.md §2.2).
"""

from __future__ import annotations

import logging
import os
import tempfile
import time
import uuid
from typing import List, Optional

import cv2
import numpy as np

from fire_tpu.config import (
    EngineConfig,
    GalleryConfig,
    RecognizerConfig,
    TrackerConfig,
)
from fire_tpu.gallery.crypto import Encryptor
from fire_tpu.gallery.index import DeviceGallery
from fire_tpu.gallery.store import FaceStore
from fire_tpu.pipeline.annotate import annotate_faces, resize_frame_to_screen
from fire_tpu.pipeline.engine import DeviceEngine
from fire_tpu.pipeline.stream import PrefetchReader
from fire_tpu.pipeline.timing import StageTimer
from fire_tpu.track.sort import Sort

log = logging.getLogger(__name__)


def _ensure_parent_dir(path: str) -> None:
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)


class FaceRecognition:
    def __init__(
        self,
        detector_type: str = "yunet",
        align: bool = True,
        align_video: bool = False,
        encoder_model_type: str = "128",
        encoder_mode: str = "gpu_optimized",
        similarity_threshold: float = 0.5,
        unknown_similarity_threshold: float = 0.6,
        unknown_trigger_count: int = 3,
        enable_logging: bool = True,
        show: bool = False,
        detection_interval: int = 3,
        hnsw_index_path: Optional[str] = None,
        hnsw_labels_path: Optional[str] = None,
        hnsw_db_ids_path: Optional[str] = None,
        hnsw_ef_construction: int = 200,  # accepted for API parity; the
        hnsw_m: int = 16,                 # exact gallery needs no graph params
        max_recent: int = 200,
        max_new: int = 250,
        sqlite_db_path: Optional[str] = None,
        sqlite_db_encrypted_path: Optional[str] = None,
        encryption_password: Optional[str] = None,
        interested_label: Optional[str] = None,
        storage_root: str = "storage",
        engine: Optional[DeviceEngine] = None,
        tracker_cfg: Optional[TrackerConfig] = None,
        weights_dir: Optional[str] = "weights",
        trained_encoder: Optional[str] = None,
        trained_detector: Optional[str] = None,
        sharded_gallery: Optional[bool] = None,
        engine_cfg: Optional["EngineConfig"] = None,
        encode_budget: Optional[int] = None,
    ):
        encoder_model_type = encoder_model_type or "128"
        self.cfg = RecognizerConfig(
            detector_type=detector_type.lower(),
            align=align,
            encoder_model_type=encoder_model_type,
            encoder_mode=encoder_mode,
            similarity_threshold=similarity_threshold,
            unknown_similarity_threshold=unknown_similarity_threshold,
            unknown_trigger_count=unknown_trigger_count,
            enable_logging=enable_logging,
            show=show,
            detection_interval=detection_interval,
            encode_budget=encode_budget,
            encryption_password=encryption_password,
            interested_label=interested_label,
            storage_root=storage_root,
            weights_dir=weights_dir,
            gallery=GalleryConfig(max_recent=max_recent, max_new=max_new),
            engine=engine_cfg or EngineConfig(),
        ).with_embedding_dim()
        cfg = self.cfg
        self.similarity_threshold = similarity_threshold
        self.unknown_similarity_threshold = unknown_similarity_threshold
        self.unknown_trigger_count = unknown_trigger_count
        self.detection_interval = detection_interval
        self.align = align
        # Landmark-aligned crops in the VIDEO loop (off = reference
        # parity: face_recognition.py:412-429 encodes the raw track-box
        # crop).  Alignment is the lever that separates near-threshold
        # identity pairs the raw crops merge — the retinaface slot's
        # 4/4 separation vs yunet's seed-0 merge traced to crop quality
        # (README round-4/5 A/B) — so it is exposed per-run here and as
        # --align_video on the CLI.
        self.align_video = align_video
        self.show = show
        self.enable_logging = enable_logging
        self.interested_label = interested_label
        self.embedding_dim = cfg.embedding_dim
        self.frame_index = 0

        logging.basicConfig(
            level=logging.INFO if enable_logging else logging.CRITICAL,
            format="%(asctime)s - %(levelname)s - %(message)s",
        )

        # encryption (face_recognition.py:77-85)
        self.encryption_password = encryption_password
        self.encryptor = Encryptor(encryption_password) if encryption_password else None
        status = "encrypted" if encryption_password else "unencrypted"
        log.info("Encryption is %s.", "enabled for file operations" if self.encryptor else "disabled")

        # storage layout (face_recognition.py:87-128)
        pipeline_dir = os.path.join(
            storage_root, f"{cfg.detector_type}_{encoder_model_type}_{status}"
        )
        db_dir = os.path.join(pipeline_dir, "db")
        hnsw_dir = os.path.join(pipeline_dir, "hnsw")
        os.makedirs(db_dir, exist_ok=True)
        os.makedirs(hnsw_dir, exist_ok=True)
        stem = f"{cfg.detector_type}_{encoder_model_type}"
        hnsw_index_path = hnsw_index_path or os.path.join(hnsw_dir, f"hnsw_index_{stem}.bin")
        hnsw_labels_path = hnsw_labels_path or os.path.join(hnsw_dir, f"hnsw_labels_{stem}.pkl")
        hnsw_db_ids_path = hnsw_db_ids_path or os.path.join(hnsw_dir, f"hnsw_db_ids_{stem}.pkl")
        if encryption_password:
            sqlite_db_encrypted_path = sqlite_db_encrypted_path or os.path.join(
                db_dir, f"face_embeddings_{stem}.db.enc"
            )
            sqlite_db_path = None
        else:
            sqlite_db_path = sqlite_db_path or os.path.join(
                db_dir, f"face_embeddings_{stem}.db"
            )
            sqlite_db_encrypted_path = None

        # device engine (detector + encoder jit graphs)
        self.engine = engine or DeviceEngine(cfg, params_dir=os.path.join(pipeline_dir, "params"))
        if trained_encoder:
            # encoder variables from `python -m fire_tpu.train` — the
            # train→deploy loop the reference lacks (it ships frozen
            # ONNX weights only, facenet_gpu.py:99-114)
            self.engine.load_trained_encoder(trained_encoder)
        if trained_detector:
            # detector variables from `python -m fire_tpu.train.detect`
            self.engine.load_trained_detector(trained_detector)
        self.detect_faces = self.engine.detect_faces
        self.extract_faces = self.engine.extract_faces

        # persistence + gallery
        self.db_manager = FaceStore(
            sqlite_db_path, sqlite_db_encrypted_path, self.encryptor, self.embedding_dim
        )
        self.gallery = DeviceGallery(
            self.embedding_dim,
            hnsw_index_path,
            hnsw_labels_path,
            hnsw_db_ids_path,
            self.encryptor,
            capacity=cfg.gallery.capacity,
            strict_f32_match=cfg.engine.strict_f32_match,
        )
        # cold-start hydrate from SQLite (face_recognition.py:151-155)
        if self.gallery.count == 0:
            self.gallery.load_rows(self.db_manager.load_all())
            self.gallery.save()

        # multi-chip gallery adoption (SURVEY.md §2.4(d)): with more
        # than one device, identity queries route through a row-sharded
        # view (local MXU top-k per shard + ICI all-gather of candidate
        # sets); mutations stay on the host-side DeviceGallery, and the
        # view re-syncs incrementally.  ``sharded_gallery=None`` =
        # auto-adopt on real multi-chip hardware; pass True to force it
        # (e.g. on the virtual CPU mesh in tests).
        self.mesh = None
        self._matcher = self.gallery
        use_sharded = sharded_gallery
        if use_sharded is None:
            import jax

            use_sharded = len(jax.devices()) > 1 and jax.default_backend() != "cpu"
        if use_sharded:
            import jax

            from fire_tpu.gallery.index import ShardedGalleryView
            from fire_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh()
            self._matcher = ShardedGalleryView(self.gallery, self.mesh)
            log.info(
                "Sharded gallery view active over %d device(s).",
                len(jax.devices()),
            )

        # caches + buffers (face_recognition.py:157-172)
        self.recent_embeddings = np.empty((0, self.embedding_dim), np.float32)
        self.recent_labels: List[str] = []
        self.max_recent = max_recent
        self.new_embeddings: List[np.ndarray] = []
        self.new_labels: List[str] = []
        self.max_new = max_new
        self.unknown_faces: dict = {}
        self.track_id_to_label: dict = {}
        # host-side window of recent enrollments: covers gallery rows
        # added after the batched step's device snapshot (see
        # enroll_unknown_now).  EVERY enrollment path feeds it via
        # _enroll_now — per-frame unknowns, batched enrollments, image
        # mode — so mixing paths in one session cannot slip a duplicate
        # identity past the device-checked dedup.
        self._recent_enrollments: list = []

        self.face_tracker = Sort(tracker_cfg or TrackerConfig())
        self.timer = StageTimer()
        # observability counters (SURVEY.md §5 metrics note: faces/frame,
        # cache-hit tier, gallery size)
        self.counters = {
            "faces_detected": 0, "tier1_track_cache": 0,
            "tier2_recent_cache": 0, "tier3_gallery": 0,
            "unknown_enrolled": 0,
        }

    # ------------------------------------------------------------- buffers --

    def _flush_new_embeddings(self) -> None:
        """face_recognition.py:177-196."""
        try:
            for label, emb in zip(self.new_labels, self.new_embeddings):
                db_id = self.db_manager.add(label, emb)
                if db_id == -1:
                    continue
                self.gallery.add(emb, label, db_id)
            self.new_embeddings, self.new_labels = [], []
            self.gallery.save()
        except Exception as e:
            log.error("Error flushing new embeddings: %s", e)

    def save_database_to_sqlite(self) -> None:
        if self.new_embeddings:
            self._flush_new_embeddings()
        log.info("Saved new embeddings to SQLite and the gallery index.")

    # ---------------------------------------------------------- enrollment --

    def add_face(self, image: np.ndarray, label: str) -> bool:
        """Buffered enrollment with dedup (face_recognition.py:198-251)."""
        try:
            faces = self.extract_faces(image, align=self.align)
            if not faces:
                log.warning("No faces detected to add.")
                return False
            t0 = time.time()
            embs = self.engine.encode_faces(np.stack(faces))
            self.timer.add("encoding", time.time() - t0)
            success = False
            for emb in embs:
                if np.linalg.norm(emb) == 0:
                    log.error("Received zero vector from encoder. Skipping this face.")
                    continue
                if self.gallery.count > 0:
                    ids, dists = self._matcher.query(emb, k=1)
                    if ids is not None and 1.0 - dists[0][0] > self.similarity_threshold:
                        log.info(
                            "Face is too similar to an existing face (Label: %s). Not adding.",
                            self.gallery.labels[ids[0][0]],
                        )
                        continue
                self.new_embeddings.append(emb)
                self.new_labels.append(label)
                log.info("Added face for label '%s' to the new embeddings buffer.", label)
                success = True
            if len(self.new_embeddings) >= self.max_new:
                self._flush_new_embeddings()
            return success
        except Exception as e:
            log.error("Error in add_face: %s", e)
            return False

    def _add_to_recent(self, emb: np.ndarray, label: str) -> None:
        """FIFO recent cache (face_recognition.py:253-258)."""
        self.recent_embeddings = np.vstack([self.recent_embeddings, emb[None]])
        self.recent_labels.append(label)
        if self.recent_embeddings.shape[0] > self.max_recent:
            self.recent_embeddings = self.recent_embeddings[1:]
            self.recent_labels.pop(0)

    # ----------------------------------------------------- rename / shrink --

    def update_label(self, gallery_id: int, new_label: str) -> None:
        self.gallery.update_label(
            gallery_id, new_label, self.db_manager,
            similarity_threshold=self.similarity_threshold,
        )

    def shrink_db_ids(self, similarity_threshold: float = 0.75) -> None:
        """Unify similar groups unless known labels conflict
        (face_recognition.py:265-315).

        The reference loops one hnswlib query per gallery id — fine at
        microsecond query latency.  On the tunnelled TPU every query is
        a host-synced readback, so all N neighbour sets are computed
        up-front in ONE batched device pass (a handful of MXU matmuls;
        at the 100k cap this turns hours of round-trips into seconds).
        Group semantics are identical: neighbour sets depend only on
        the stored vectors (one SQLite read, renormalized — the
        reference's _get_embedding_from_db_id contract,
        hnsw_manager.py:246-262), while the conflict check reads labels
        lazily at visit time, exactly like the sequential loop.
        """
        n = len(self.gallery.labels)
        if n == 0:
            log.info("DB ID shrinking completed with 0 unification operations.")
            return
        by_id = {}
        for db_id, _, blob in self.db_manager.load_all():
            emb = np.frombuffer(blob, np.float32)
            norm = np.linalg.norm(emb)
            if emb.shape[0] == self.embedding_dim and norm > 0:
                by_id[int(db_id)] = emb / norm
        embs = np.zeros((n, self.embedding_dim), np.float32)
        have = np.zeros(n, bool)
        for gid in range(n):
            vec = by_id.get(int(self.gallery.db_ids[gid]))
            if vec is not None:
                embs[gid] = vec
                have[gid] = True
        k = min(self.cfg.gallery.group_k, n)
        ids, dists = self._matcher.query_batch(embs, k=k)
        processed = set()
        total = 0
        for gid in range(n):
            if gid in processed or not have[gid]:
                continue
            similar = [
                int(i) for i, d in zip(ids[gid], dists[gid])
                if 1.0 - d >= similarity_threshold
            ]
            if len(similar) <= 1:
                processed.add(gid)
                continue
            labels = [self.gallery.labels[s] for s in similar]
            known = [l for l in labels if not l.lower().startswith("unknown")]
            if len(set(known)) > 1:
                processed.update(similar)
                continue
            final = known[0] if known else self.gallery.labels[gid]
            self.gallery.unify_labels(similar, final, self.db_manager, save=False)
            total += 1
            processed.update(similar)
        if total:
            self.gallery.save()  # one compaction for the whole pass
        log.info("DB ID shrinking completed with %d unification operations.", total)

    # ------------------------------------------------------------ unknowns --

    @staticmethod
    def _generate_unique_label() -> str:
        return f"Unknown_{uuid.uuid4().hex[:8]}"

    def _enroll_now(self, label: str, emb: np.ndarray) -> None:
        if self.gallery.count < self.gallery.capacity:
            db_id = self.db_manager.add(label, emb)
            if db_id != -1 and self.gallery.add(emb, label, db_id):
                # mirror the gallery row (normalized) into the recent-
                # enrollment window so the batched path's device-checked
                # dedup sees rows enrolled through ANY path
                vec = np.asarray(emb, np.float32).reshape(-1)
                n = np.linalg.norm(vec)
                self._recent_enrollments.append(
                    (vec / n if n > 0 else vec, self.gallery.count - 1)
                )
                del self._recent_enrollments[:-64]
        else:
            log.warning("Gallery has reached its maximum capacity. Cannot add more embeddings.")

    def _handle_unknown_embedding(
        self, track_id: int, emb: np.ndarray, rename_label: Optional[str] = None
    ) -> str:
        """face_recognition.py:322-369."""
        if rename_label:
            # NOTE deviation: the reference both buffers AND immediately
            # inserts the same embedding, then flushes the buffer — storing
            # every such face twice (face_recognition.py:324-333 +
            # :177-188).  We enroll exactly once.
            log.info("Enrolling face with label '%s'.", rename_label)
            self._enroll_now(rename_label, emb)
            self._flush_new_embeddings()
            return rename_label

        entry = self.unknown_faces.setdefault(track_id, {"embeddings": [], "count": 0})
        entry["embeddings"].append(emb)
        entry["count"] += 1
        if entry["count"] < self.unknown_trigger_count:
            return "Unknown"

        avg = np.mean(entry["embeddings"], axis=0)
        if self.gallery.count > 0:
            ids, dists = self._matcher.query(avg, k=1)
            if ids is not None and 1.0 - dists[0][0] > self.similarity_threshold:
                gid = int(ids[0][0])
                existing = (
                    self.gallery.labels[gid] if gid < len(self.gallery.labels) else "Unknown"
                )
                log.info("Unknown face is too similar to an existing face. Not adding.")
                return existing
        label = self._generate_unique_label()
        # single insert (see the rename-path note on the reference's
        # double-insert at face_recognition.py:354-365)
        log.info("Enrolling unknown face as '%s'.", label)
        self._enroll_now(label, avg)
        self._flush_new_embeddings()
        del self.unknown_faces[track_id]
        return label

    # ----------------------------------------------------------- hot path --

    def enroll_unknown_now(self, emb: np.ndarray, rename_label: Optional[str] = None,
                           device_checked: bool = False) -> str:
        """Immediate enrollment for the batched pipeline, where the
        unknown-trigger accumulation already happened on device
        (fire_tpu.pipeline.batch_engine): dedup against the gallery,
        then enroll under ``rename_label`` or a fresh Unknown_* label.

        ``device_checked=True`` asserts the batched step already
        compared this embedding against the gallery snapshot at step
        time (the enroll flag only fires when that similarity is ≤ the
        threshold — otherwise the track takes the identity), so the
        per-enrollment device query (a ~50 ms stall on the tunnelled
        platform, face_recognition.py:342-352 semantics) is skipped.
        Rows enrolled AFTER the snapshot — same batch, a previous batch
        still in flight under submit/collect pipelining, or any
        per-frame/image-mode enrollment interleaved with the batched
        path — are covered by the host-side ``_recent_enrollments``
        window, which _enroll_now feeds on every successful add; its
        size (64) dominates the pipelining bound of 2·MAX_ENROLL=16
        post-snapshot rows.
        """
        if rename_label:
            self._enroll_now(rename_label, emb)
            self.gallery.save()
            return rename_label
        if device_checked:
            # only the post-snapshot rows need checking
            for vec, gid in self._recent_enrollments:
                if float(vec @ emb) > self.similarity_threshold and gid < self.gallery.count:
                    return self.gallery.labels[gid]
        elif self.gallery.count > 0:
            ids, dists = self._matcher.query(emb, k=1)
            if ids is not None and 1.0 - dists[0][0] > self.similarity_threshold:
                return self.gallery.labels[int(ids[0][0])]
        label = self._generate_unique_label()
        self._enroll_now(label, emb)
        self.gallery.save()
        return label

    def recognize_faces(self, image: np.ndarray, rename_label: Optional[str] = None):
        """Per-frame recognition (face_recognition.py:371-489) with all
        per-frame encoding batched into one device call."""
        self.timer.start()
        self.frame_index += 1

        # one H2D transfer per frame, shared by detect + encode (eager
        # per-stage conversion costs ~130ms on the tunnelled platform)
        if isinstance(image, np.ndarray):
            import jax

            image_dev = jax.device_put(image)
        else:
            image_dev = image

        if self.frame_index % self.detection_interval == 0:
            t0 = time.time()
            detected = self.detect_faces(image_dev)
            self.timer.add("detection", time.time() - t0)
            self.counters["faces_detected"] += len(detected)
            formatted = [
                {"bbox": d.get("bbox", [0, 0, 0, 0]), "confidence": d.get("confidence", 1.0)}
                for d in detected
            ]
            tracks = self.face_tracker.update(formatted)
        else:
            tracks = self.face_tracker.update([])

        # drop state of dead tracks (face_recognition.py:396-401)
        active = {t["id"] for t in tracks}
        for tid in set(self.track_id_to_label) - active:
            del self.track_id_to_label[tid]
            self.unknown_faces.pop(tid, None)

        # split cached / to-encode tracks
        h, w = image.shape[:2]
        to_encode = []
        for trk in tracks:
            if trk["id"] in self.track_id_to_label:
                continue
            x, y, bw, bh = trk["bbox"]
            x, y = max(0, x), max(0, y)
            bw, bh = max(0, bw), max(0, bh)
            bw, bh = min(bw, w - x), min(bh, h - y)
            if bw <= 0 or bh <= 0:
                log.warning("Face image has zero size for track ID %s. Skipping.", trk["id"])
                continue
            to_encode.append((trk["id"], [x, y, bw, bh], trk.get("src_det", -1)))

        # one batched encode for every new face in the frame.  With
        # align_video on, tracks that were updated by a detection THIS
        # frame encode a landmark-aligned crop (src_det → the
        # detection's 5-pt landmarks, 3-pt affine on device); coasting
        # tracks fall back to the raw box crop.
        embs = {}
        if to_encode:
            t0 = time.time()
            lms_of = {}
            if self.align_video and self.frame_index % self.detection_interval == 0:
                for si, d in enumerate(detected):
                    lm = np.asarray(d.get("landmarks", ()), np.float32)
                    if lm.shape == (5, 2) and np.abs(lm).sum() > 0:
                        # (left_eye, right_eye, nose) — Detections order
                        # is (right, left, nose, ...), landmarks3 swap
                        lms_of[si] = lm[[1, 0, 2]]
            ali = [(i, lms_of[src]) for i, (_, _, src) in enumerate(to_encode)
                   if src in lms_of]
            rest = [i for i in range(len(to_encode)) if i not in {j for j, _ in ali}]
            batch = np.zeros((len(to_encode), self.embedding_dim), np.float32)
            bad = set()  # wrong-dim embeddings are skipped, never
            # matched or enrolled (face_recognition.py:436-439)

            def _store(i, e):
                e = np.asarray(e, np.float32).reshape(-1)
                if e.shape[0] != self.embedding_dim:
                    log.error(
                        "Embedding size mismatch for track %s: got %d, "
                        "expected %d. Skipping.",
                        to_encode[i][0], e.shape[0], self.embedding_dim)
                    bad.add(i)
                else:
                    batch[i] = e

            if ali:
                lms3 = np.stack([l for _, l in ali])
                out = self.engine.encode_landmarks(image_dev, lms3)
                for (i, _), e in zip(ali, out):
                    _store(i, e)
            if rest:
                boxes = np.asarray([to_encode[i][1] for i in rest], np.float32)
                out = self.engine.encode_boxes(image_dev, boxes)
                for i, e in zip(rest, out):
                    _store(i, e)
            self.timer.add("encoding", time.time() - t0)
            # one batched gallery query for the same faces
            gal_ids, gal_dists = (None, None)
            if self.gallery.count > 0:
                gal_ids, gal_dists = self._matcher.query_batch(batch, k=1)
            for i, (tid, _, _src) in enumerate(to_encode):
                if i in bad:
                    continue
                embs[tid] = (
                    batch[i],
                    None if gal_ids is None else int(gal_ids[i][0]),
                    None if gal_dists is None else float(1.0 - gal_dists[i][0]),
                )

        results = []
        for trk in tracks:
            tid = trk["id"]
            if tid in self.track_id_to_label:
                label = self.track_id_to_label[tid]
                confidence = 1.0
                self.counters["tier1_track_cache"] += 1
            elif tid in embs:
                emb, gal_gid, gal_sim = embs[tid]
                if emb.shape[0] != self.embedding_dim:
                    # face_recognition.py:436-439
                    log.error(
                        "Invalid embedding size: expected %d, got %d",
                        self.embedding_dim, emb.shape[0],
                    )
                    continue
                if np.linalg.norm(emb) == 0:
                    log.error("Received zero vector from encoder. Skipping this face.")
                    continue
                label, confidence = "Unknown", 0.0
                # tier 2: recent-embedding cache (face_recognition.py:450-456)
                if self.recent_embeddings.shape[0] > 0:
                    sims = self.recent_embeddings @ emb
                    mi = int(np.argmax(sims))
                    if sims[mi] > self.similarity_threshold:
                        label = self.recent_labels[mi]
                        confidence = float(sims[mi])
                        self.counters["tier2_recent_cache"] += 1
                # tier 3: gallery (face_recognition.py:459-469)
                if label == "Unknown" and gal_gid is not None:
                    if gal_sim > self.similarity_threshold:
                        label = self.gallery.labels[gal_gid]
                        confidence = gal_sim
                        self.counters["tier3_gallery"] += 1
                        if rename_label:
                            self.update_label(gal_gid, rename_label)
                            label = rename_label
                if label == "Unknown":
                    label = self._handle_unknown_embedding(tid, emb, rename_label)
                    confidence = 1.0
                    if label != "Unknown":
                        self.counters["unknown_enrolled"] += 1
                self.track_id_to_label[tid] = label
                self._add_to_recent(emb, label)
            else:
                continue  # degenerate box skipped above

            if self.interested_label is not None and label != self.interested_label:
                continue
            results.append(
                {"label": self.track_id_to_label[tid], "confidence": float(confidence), "bbox": trk["bbox"]}
            )

        self.timer.tick_frame()
        return results

    # --------------------------------------------------------- image mode --

    def process_image(
        self,
        image_path: str,
        annotate: bool = True,
        save_path: Optional[str] = None,
        label: Optional[str] = None,
    ) -> None:
        """face_recognition.py:491-701 — no tracker; batched encode."""
        try:
            timer = StageTimer()
            t0 = time.time()
            image = cv2.imread(image_path)
            if image is None:
                log.error("Image not found at path: %s", image_path)
                return
            timer.add("Image Loading", time.time() - t0)

            t0 = time.time()
            detected = self.detect_faces(image)
            timer.add("Face Detection", time.time() - t0)

            # clamp boxes, drop degenerates (face_recognition.py:514-527)
            h, w = image.shape[:2]
            valid = []
            for fd in detected:
                x, y, bw, bh = [max(0, int(v)) for v in fd.get("bbox", [0, 0, 0, 0])]
                bw, bh = min(bw, w - x), min(bh, h - y)
                if bw == 0 or bh == 0:
                    log.warning("Detected face with zero width or height.")
                    continue
                valid.append({"bbox": [x, y, bw, bh]})

            embs = np.zeros((0, self.embedding_dim), np.float32)
            if valid:
                t0 = time.time()
                boxes = np.asarray([f["bbox"] for f in valid], np.float32)
                embs = self.engine.encode_boxes(image, boxes)
                timer.add("Face Encoding", time.time() - t0)

            if label:
                # relabel path (face_recognition.py:511-565)
                for emb in embs:
                    if np.linalg.norm(emb) == 0:
                        continue
                    matched = False
                    if self.gallery.count > 0:
                        ids, dists = self._matcher.query(emb, k=1)
                        if ids is not None and 1.0 - dists[0][0] > self.similarity_threshold:
                            gid = int(ids[0][0])
                            self.update_label(gid, label)
                            log.info("Updated label for gallery id %d to '%s'.", gid, label)
                            matched = True
                    if not matched:
                        # parity verified against the reference: its
                        # image-mode label path also only warns on
                        # no-match — it never enrolls under the given
                        # label (face_recognition.py:564-565; the
                        # add-new-face branch exists only in the
                        # label-less recognition path, :640-661)
                        log.warning("No matching face found to update with the provided label.")
                self._save_image(image, save_path)
                timer.print_image_report()
                return

            # recognition path (face_recognition.py:583-698)
            recognized = []
            new_embs, new_labels = [], []
            t0 = time.time()
            if self.gallery.count > 0 and len(embs):
                ids, dists = self._matcher.query_batch(embs, k=1)
            else:
                ids = dists = None
            for i, face in enumerate(valid):
                emb = embs[i]
                if np.linalg.norm(emb) == 0:
                    continue
                found = None
                if ids is not None and 1.0 - dists[i][0] > self.similarity_threshold:
                    found = self.gallery.labels[int(ids[i][0])]
                if found is None:
                    found = self._generate_unique_label()
                    new_embs.append(emb)
                    new_labels.append(found)
                recognized.append({"label": found, "bbox": face["bbox"]})
            timer.add("Face Recognition", time.time() - t0)

            t0 = time.time()
            for lbl, emb in zip(new_labels, new_embs):
                self._enroll_now(lbl, emb)
            if new_embs:
                self.gallery.save()
            timer.add("Flushing Embeddings", time.time() - t0)

            t0 = time.time()
            out = annotate_faces(image, recognized) if annotate else image.copy()
            timer.add("Image Annotation", time.time() - t0)

            if self.show:
                cv2.imshow("Face Recognition - Image", out)
                cv2.waitKey(0)
                cv2.destroyAllWindows()

            t0 = time.time()
            self._save_image(out, save_path)
            timer.add("Image Saving", time.time() - t0)
            timer.print_image_report()
        except Exception as e:
            log.error("Error in process_image: %s", e)

    def _save_image(self, image: np.ndarray, save_path: Optional[str]) -> None:
        """Optionally-encrypted image save (face_recognition.py:567-575)."""
        if not save_path:
            return
        _ensure_parent_dir(save_path)
        if self.encryptor:
            ok, buf = cv2.imencode(".jpg", image)
            self.encryptor.encrypt_and_write(save_path, buf.tobytes())
        else:
            cv2.imwrite(save_path, image)
            log.info("Processed image saved to %s", save_path)

    # -------------------------------------------------------- stream modes --

    def _process_stream(
        self,
        cap,
        annotate: bool = True,
        save_path: Optional[str] = None,
        duration: int = 0,
        name: Optional[str] = None,
        stream_type: str = "video",
    ) -> None:
        """face_recognition.py:739-834 with a decode-ahead reader."""
        out = None
        temp_video_path = None
        reader = None
        try:
            if save_path:
                _ensure_parent_dir(save_path)
                fourcc = cv2.VideoWriter_fourcc(*"XVID")
                fps = cap.get(cv2.CAP_PROP_FPS) or 30
                if fps == 0:
                    fps = 30
                wh = (
                    int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                    int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                )
                if self.encryptor:
                    fd, temp_video_path = tempfile.mkstemp(suffix=".avi")
                    os.close(fd)
                    out = cv2.VideoWriter(temp_video_path, fourcc, fps, wh)
                else:
                    out = cv2.VideoWriter(save_path, fourcc, fps, wh)
                if not out.isOpened():
                    log.error("Failed to open video writer.")
                    return

            self.timer = StageTimer()
            self.timer.start()
            reader = PrefetchReader(cap)
            for frame in reader.frames():
                # one bad frame never kills the stream (SURVEY.md §5
                # failure-detection contract; face_recognition.py:700,828)
                try:
                    faces = self.recognize_faces(frame, rename_label=name)
                except Exception as e:
                    log.error("Error recognizing frame %d: %s", self.frame_index, e)
                    faces = []
                annotated = annotate_faces(frame, faces, with_confidence=True) if annotate else frame.copy()
                if self.show:
                    cv2.imshow(
                        f"Face Recognition - {stream_type.capitalize()}",
                        resize_frame_to_screen(annotated),
                    )
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        log.info("User requested to quit %s processing.", stream_type)
                        break
                if out is not None:
                    out.write(annotated)
                if duration > 0 and (time.time() - self.timer.start_time) >= duration:
                    log.info("Duration of %d seconds reached. Stopping.", duration)
                    break
        except Exception as e:
            log.error("Error in _process_stream: %s", e)
        finally:
            if reader is not None:
                reader.close()
            cap.release()
            if out is not None:
                out.release()
                if self.encryptor and save_path and temp_video_path:
                    try:
                        with open(temp_video_path, "rb") as f:
                            self.encryptor.encrypt_and_write(save_path, f.read())
                        os.remove(temp_video_path)
                        log.info("Encrypted video saved to %s", save_path)
                    except Exception as e:
                        log.error("Error during encryption of video: %s", e)
                elif save_path:
                    log.info("Annotated video saved to %s", save_path)
            if self.show:
                cv2.destroyAllWindows()

    def process_video(
        self,
        video_path: str,
        annotate: bool = True,
        save_path: Optional[str] = None,
        batch_size: int = 0,
        duration: int = 0,
        name: Optional[str] = None,
    ) -> None:
        """``batch_size > 0`` selects the batched device-resident
        pipeline (fire_tpu.pipeline.batch_engine) — B frames per device
        step, the maximum-throughput path.  Both paths honor the full
        stream contract: encrypted output, --show with 'q' quit,
        duration, rename label (face_recognition.py:739-834)."""
        cap = cv2.VideoCapture(video_path)
        if not cap.isOpened():
            log.error("Cannot open video file: %s", video_path)
            return
        if batch_size > 0:
            self._process_stream_batched(
                cap, annotate, save_path, batch_size, duration, name,
                stream_type="video",
            )
        else:
            self._process_stream(cap, annotate, save_path, duration, name,
                                 stream_type="video")

    def process_frames(
        self,
        frames,
        annotate: bool = True,
        save_path: Optional[str] = None,
        batch_size: int = 0,
        duration: int = 0,
        name: Optional[str] = None,
        fps: float = 30.0,
    ) -> None:
        """Run the full video pipeline over pre-decoded in-RAM frames
        (an iterable of BGR uint8 ndarrays) — cameras delivering raw
        buffers, decode-excluded benchmarking (VERDICT r3 #7), test
        harnesses.  Identical semantics to :meth:`process_video`
        (annotate, encrypted save, show/quit, duration, rename label);
        only the frame source differs."""
        from fire_tpu.pipeline.stream import FrameSequenceCapture

        cap = FrameSequenceCapture(frames, fps=fps)
        if not cap.isOpened():
            log.error("process_frames received no frames.")
            return
        if batch_size > 0:
            self._process_stream_batched(
                cap, annotate, save_path, batch_size, duration, name,
                stream_type="video",
            )
        else:
            self._process_stream(cap, annotate, save_path, duration, name,
                                 stream_type="video")

    def _process_stream_batched(
        self, cap, annotate: bool, save_path: Optional[str], batch_size: int,
        duration: int = 0, name: Optional[str] = None,
        stream_type: str = "video",
    ) -> None:
        """Batched stream loop with one batch in flight: batch i+1 is
        submitted before batch i is collected, so host annotate/write
        and the next H2D overlap device compute (the double-buffering
        SURVEY.md §2.3 calls for).  Behavioural contract matches
        _process_stream: encrypted temp-file output
        (face_recognition.py:750-758,810-821), --show + 'q' quit
        (:795-800), duration cap, rename label."""
        from fire_tpu.pipeline.batch_engine import BatchStreamEngine, stream_results

        # the device step runs the detector on every interval-th frame
        # of a batch, so the batch must be a multiple of the interval —
        # round the batch UP rather than silently detecting every frame
        # (which would cost the user the full detector price they asked
        # frame-skip to avoid)
        interval = max(self.detection_interval, 1)
        if batch_size % interval != 0:
            rounded = ((batch_size + interval - 1) // interval) * interval
            log.warning(
                "batch_size %d is not a multiple of detection_interval %d; "
                "rounding batch up to %d to preserve frame-skip semantics.",
                batch_size, interval, rounded,
            )
            batch_size = rounded
        bse = BatchStreamEngine(
            self.engine, self.gallery, self.cfg, detection_interval=interval,
            encode_budget=self.cfg.encode_budget,
        )
        out = None
        temp_video_path = None
        if save_path:
            _ensure_parent_dir(save_path)
            fps = cap.get(cv2.CAP_PROP_FPS) or 30
            if fps == 0:
                fps = 30
            wh = (
                int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
            )
            fourcc = cv2.VideoWriter_fourcc(*"XVID")
            if self.encryptor:
                fd, temp_video_path = tempfile.mkstemp(suffix=".avi")
                os.close(fd)
                out = cv2.VideoWriter(temp_video_path, fourcc, fps, wh)
            else:
                out = cv2.VideoWriter(save_path, fourcc, fps, wh)
            if not out.isOpened():
                log.error("Failed to open video writer.")
                return
        self.timer = StageTimer()
        self.timer.start()
        reader = PrefetchReader(cap)

        def emit(token, frames) -> bool:
            """Collect one in-flight batch, annotate/show/write its
            frames.  Returns False when the loop must stop.

            Each host-plane stage is timed separately (VERDICT r4 #2):
            the stall on the device result, the host unpack/label/enroll
            pass, annotation and writer.write — so the end-of-run report
            decomposes the loop into device round-trip latency (a tunnel
            artifact on the dev platform) vs genuine host work, and a
            co-located-host FPS can be projected from the host columns.
            """
            t0 = time.time()
            res = bse.collect(token)
            # fused detect+encode+match+track device step (stall time —
            # compute overlapped with the host work since submit)
            self.timer.add("device step (detect+encode+match+track)",
                           time.time() - t0)
            # count only the real frames of a (possibly padded) tail
            # batch; in the batched path the closest observable to the
            # per-frame path's len(detected) is confirmed tracks/frame
            self.counters["faces_detected"] += int(res.mask[: len(frames)].sum())
            t0 = time.time()
            labelled = list(stream_results(self, res, rename_label=name))
            self.timer.add("host unpack+label+enroll", time.time() - t0)
            t_ann = t_write = 0.0
            for frame, faces in zip(frames, labelled):
                self.timer.tick_frame()
                t0 = time.time()
                annotated = (
                    annotate_faces(frame, faces, with_confidence=True)
                    if annotate else frame
                )
                t_ann += time.time() - t0
                if self.show:
                    cv2.imshow(
                        f"Face Recognition - {stream_type.capitalize()}",
                        resize_frame_to_screen(annotated),
                    )
                    if cv2.waitKey(1) & 0xFF == ord("q"):
                        log.info("User requested to quit %s processing.", stream_type)
                        return False
                if out is not None:
                    t0 = time.time()
                    out.write(annotated)
                    t_write += time.time() - t0
            self.timer.add("host annotate", t_ann)
            self.timer.add("host writer.write", t_write)
            if duration > 0 and (time.time() - self.timer.start_time) >= duration:
                log.info("Duration of %d seconds reached. Stopping.", duration)
                return False
            return True

        inflight = None  # (token, frames) — one batch pipelined ahead
        try:
            batch = []
            stopped = False
            frame_iter = reader.frames()
            while True:
                t0 = time.time()
                frame = next(frame_iter, None)
                self.timer.add("read (decode+prefetch stall)",
                               time.time() - t0)
                if frame is None:
                    break
                batch.append(frame)
                if len(batch) == batch_size:
                    t0 = time.time()
                    token = bse.submit(np.stack(batch))
                    self.timer.add("submit (stack+H2D+dispatch)",
                                   time.time() - t0)
                    prev, inflight = inflight, (token, batch)
                    batch = []
                    if prev is not None and not emit(*prev):
                        stopped = True
                        break
            if not stopped and batch:
                # tail: pad by repeating the last frame; drop pad outputs
                pad = batch + [batch[-1]] * (batch_size - len(batch))
                token = bse.submit(np.stack(pad))
                if inflight is not None:
                    stopped = not emit(*inflight)
                inflight = (token, batch)  # emit() zips only real frames
            if not stopped and inflight is not None:
                emit(*inflight)
        finally:
            reader.close()
            cap.release()
            if out is not None:
                out.release()
                if self.encryptor and save_path and temp_video_path:
                    try:
                        with open(temp_video_path, "rb") as f:
                            self.encryptor.encrypt_and_write(save_path, f.read())
                        os.remove(temp_video_path)
                        log.info("Encrypted video saved to %s", save_path)
                    except Exception as e:
                        log.error("Error during encryption of video: %s", e)
                elif save_path:
                    log.info("Annotated video saved to %s", save_path)
            if self.show:
                cv2.destroyAllWindows()

    def process_videos(
        self,
        video_paths: List[str],
        annotate: bool = True,
        save_path: Optional[str] = None,
        batch_size: int = 8,
        duration: int = 0,
        name: Optional[str] = None,
    ) -> None:
        """Multi-stream data-parallel video processing — the product
        surface for SURVEY.md §2.4(e) (the reference has no parallelism
        at all; this is the multi-chip scale-out path).

        Each video becomes one stream, sharded one-per-device over a
        ``dp`` mesh (fire_tpu.parallel.multistream.MultiStreamEngine);
        every device runs the exact single-stream batched step with its
        own tracker state, against a shared replicated gallery, so an
        identity enrolled from one stream is recognized in the others.
        With fewer streams than devices the remainder run blank pad
        streams (outputs dropped).  With ``--save``, stream i writes
        ``<stem>_stream<i><ext>``.

        All inputs must share one resolution (one compiled step serves
        every stream; mixed resolutions would need one jit per shape).
        """
        import jax

        from fire_tpu.parallel.mesh import make_mesh
        from fire_tpu.parallel.multistream import MultiStreamEngine
        from fire_tpu.pipeline.batch_engine import stream_results

        caps = []
        try:
            wh = None
            for p in video_paths:
                cap = cv2.VideoCapture(p)
                if not cap.isOpened():
                    log.error("Cannot open video file: %s", p)
                    return
                cwh = (
                    int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
                    int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)),
                )
                if wh is None:
                    wh = cwh
                elif cwh != wh:
                    log.error(
                        "All streams must share one resolution: %s is %s, expected %s.",
                        p, cwh, wh,
                    )
                    return
                caps.append(cap)

            mesh = self.mesh or make_mesh()
            n_streams = mesh.shape["dp"]
            if len(caps) > n_streams:
                log.error(
                    "%d streams exceed the %d-device dp mesh; run in groups of %d.",
                    len(caps), n_streams, n_streams,
                )
                return

            interval = max(self.detection_interval, 1)
            if batch_size % interval != 0:
                rounded = ((batch_size + interval - 1) // interval) * interval
                log.warning(
                    "batch_size %d rounded up to %d (multiple of detection_interval %d).",
                    batch_size, rounded, interval,
                )
                batch_size = rounded

            mse = MultiStreamEngine(
                self.engine, self.gallery, self.cfg, mesh,
                detection_interval=interval,
                encode_budget=self.cfg.encode_budget,
            )
            n_real = len(caps)
            writers = [None] * n_real
            out_paths = [None] * n_real
            temp_paths = [None] * n_real
            fps = caps[0].get(cv2.CAP_PROP_FPS) or 30
            if fps == 0:
                fps = 30
            if save_path:
                stem, ext = os.path.splitext(save_path)
                fourcc = cv2.VideoWriter_fourcc(*"XVID")
                for i in range(n_real):
                    out_p = f"{stem}_stream{i}{ext or '.avi'}"
                    _ensure_parent_dir(out_p)
                    out_paths[i] = out_p
                    if self.encryptor:
                        # encrypted-at-rest outputs: write plaintext to a
                        # temp file, encrypt to the final path at close —
                        # the same flow as the single-stream paths
                        # (face_recognition.py:750-758,810-821)
                        fd, temp_paths[i] = tempfile.mkstemp(suffix=".avi")
                        os.close(fd)
                        writers[i] = cv2.VideoWriter(temp_paths[i], fourcc, fps, wh)
                    else:
                        writers[i] = cv2.VideoWriter(out_p, fourcc, fps, wh)

            self.timer = StageTimer()
            self.timer.start()
            readers = [PrefetchReader(c) for c in caps]
            iters = [r.frames() for r in readers]
            done = [False] * n_real

            def next_batches():
                """(S, B, H, W, 3) batch + per-stream real-frame lists +
                per-stream active flags (finished/padding-only streams
                skip the host fill here and the H2D in submit — the
                device reuses a cached zero batch for them)."""
                per_stream = []
                for i in range(n_real):
                    frames = []
                    while len(frames) < batch_size and not done[i]:
                        f = next(iters[i], None)
                        if f is None:
                            done[i] = True
                        else:
                            frames.append(f)
                    per_stream.append(frames)
                if all(len(f) == 0 for f in per_stream):
                    return None, None, None
                stacked = np.zeros(
                    (n_streams, batch_size, wh[1], wh[0], 3), np.uint8
                )
                active = [False] * n_streams
                for i in range(n_real):
                    frames = per_stream[i]
                    if not frames:
                        continue  # finished stream: cached zero shard
                    active[i] = True
                    pad = frames[-1]
                    for b in range(batch_size):
                        stacked[i, b] = frames[b] if b < len(frames) else pad
                return stacked, per_stream, active

            def emit(token, per_stream) -> bool:
                t0 = time.time()
                results = mse.collect(token)
                self.timer.add("device step (S streams)", time.time() - t0)
                for i in range(n_real):
                    frames = per_stream[i]
                    if not frames:
                        continue
                    for frame, faces in zip(
                        frames, stream_results(self, results[i], rename_label=name)
                    ):
                        self.timer.tick_frame()
                        annotated = (
                            annotate_faces(frame, faces, with_confidence=True)
                            if annotate else frame
                        )
                        if self.show:
                            cv2.imshow(
                                f"Face Recognition - Stream {i}",
                                resize_frame_to_screen(annotated),
                            )
                            if cv2.waitKey(1) & 0xFF == ord("q"):
                                log.info("User requested to quit video processing.")
                                return False
                        if writers[i] is not None:
                            writers[i].write(annotated)
                if duration > 0 and (time.time() - self.timer.start_time) >= duration:
                    log.info("Duration of %d seconds reached. Stopping.", duration)
                    return False
                return True

            inflight = None
            while True:
                stacked, per_stream, active = next_batches()
                if stacked is None:
                    break
                token = mse.submit(stacked, active=active)
                prev, inflight = inflight, (token, per_stream)
                if prev is not None and not emit(*prev):
                    inflight = None
                    break
            if inflight is not None:
                emit(*inflight)
        finally:
            for r in locals().get("readers", []):
                r.close()
            for c in caps:
                c.release()
            for i, wtr in enumerate(locals().get("writers", [])):
                if wtr is None:
                    continue
                wtr.release()
                tmp_p = locals().get("temp_paths", [None] * (i + 1))[i]
                out_p = locals().get("out_paths", [None] * (i + 1))[i]
                if self.encryptor and tmp_p and out_p:
                    try:
                        with open(tmp_p, "rb") as f:
                            self.encryptor.encrypt_and_write(out_p, f.read())
                        os.remove(tmp_p)
                        log.info("Encrypted video saved to %s", out_p)
                    except Exception as e:
                        log.error("Error during encryption of video: %s", e)
                elif out_p:
                    log.info("Annotated video saved to %s", out_p)
            if self.show:
                cv2.destroyAllWindows()

    def process_webcam(
        self, annotate: bool = True, save_path: Optional[str] = None,
        duration: int = 0, name: Optional[str] = None, batch_size: int = 0,
    ) -> None:
        """``batch_size > 0`` routes the webcam through the batched
        device pipeline (B frames per step — throughput over latency:
        results trail the live feed by up to 2·B frames from the
        submit/collect pipelining); 0 keeps the per-frame path, the
        reference's behavior (face_recognition.py:836-854)."""
        cap = cv2.VideoCapture(0)
        if not cap.isOpened():
            log.error("Cannot open webcam.")
            return
        if batch_size > 0:
            self._process_stream_batched(
                cap, annotate, save_path, batch_size, duration, name,
                stream_type="webcam",
            )
        else:
            self._process_stream(cap, annotate, save_path, duration, name,
                                 stream_type="webcam")

    # -------------------------------------------------------------- close --

    def close(self) -> None:
        """Flush + persist + report (face_recognition.py:856-876)."""
        try:
            self.save_database_to_sqlite()
            # fold any journaled enrollments into the snapshot triplet
            self.gallery.save(compact=True)
            self.db_manager.save()
            log.info("Closed FaceRecognition system and saved all data.")
        except Exception as e:
            log.error("Error closing FaceRecognition system: %s", e)
        if self.enable_logging:
            self.timer.log_stream_report()
            log.info(
                "Counters: %s; gallery size: %d",
                self.counters, self.gallery.count,
            )
