"""HBM-resident exact cosine top-k gallery — the hnswlib replacement.

The reference keeps identities in an approximate HNSW graph
(modules/hnsw_manager.py): cosine space, 100k element cap, parallel
Python lists mapping insertion counter → label / SQLite row id.  On TPU
the right structure is simpler and *exact*: a row-normalized
(capacity, D) matrix pinned in HBM; a query batch is one bf16 MXU
matmul + ``lax.top_k`` (fire_tpu.ops.gallery_match).  At the 100k×512
cap that is ~0.1 GFLOP — exactness costs nothing, and the matrix shards
trivially across chips by rows (fire_tpu.parallel.sharded_gallery).

API mirrors HNSWManager so the orchestrator semantics carry over
1:1 — ids are insertion counters, ``query`` returns (ids, cosine
distances = 1 − similarity) (hnsw_manager.py:145-149), group relabel
refuses to unify conflicting known labels (hnsw_manager.py:151-199),
and a corrupt/missing persisted index falls back to a fresh one
rebuilt from SQLite (hnsw_manager.py:69-76, face_recognition.py:151-155).

Persistence keeps the reference's file-triplet layout (index/labels/
db_ids at the same paths, each optionally Fernet-encrypted via the same
whole-file format) — the index file holds our dense matrix (.npy bytes)
rather than an hnswlib graph; a legacy hnswlib .bin fails to parse and
triggers the rebuild-from-SQLite recovery path, which is lossless since
SQLite is the source of truth.

Saves are **incremental**: the triplet is a compacted snapshot, and
rows enrolled since the last compaction are appended to a sidecar
journal (``<index>.journal``, length-prefixed records, individually
encrypted in encrypted mode).  A busy stream's per-enrollment flush
(face_recognition.py:358-365 semantics) appends ~2 KB instead of
rewriting the full 100k×512 matrix (~200 MB); compaction folds the
journal back into the snapshot when it exceeds a threshold, when
labels change (rename/unify), or on close.  A corrupt journal is
treated like a corrupt index: fresh gallery, rebuilt from SQLite.
"""

from __future__ import annotations

import io
import logging
import os
import pickle
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fire_tpu.gallery.crypto import Encryptor
from fire_tpu.ops.gallery_match import cosine_topk, cosine_topk_f32

log = logging.getLogger(__name__)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# NOTE on donation (round-5 hardening): these writes used
# donate_argnums=(0, 1) through round 4.  That aliases buffers a queued
# computation may still read: the pipelined stream loop submits batch
# i+1 (whose async step captures gal16), then collect(i)'s enrollment
# flush donates the SAME buffer for the row write.  Mature PJRT
# backends copy-on-donate under outstanding usage holds, but this
# platform is experimental and the r1-r4 random-weight benches never
# enrolled mid-flight, so the pattern was never actually exercised.
# A non-donated update copies the 300 MB master+shadow once per flush
# — ~0.4 ms of HBM bandwidth, the correct price for never aliasing a
# possibly-live operand.
@jax.jit
def _set_row(gal: jnp.ndarray, gal16: jnp.ndarray, idx, vec):
    """Row write into the f32 master AND its bf16 matmul shadow."""
    return gal.at[idx].set(vec), gal16.at[idx].set(vec.astype(jnp.bfloat16))


@jax.jit
def _set_rows(gal: jnp.ndarray, gal16: jnp.ndarray, start, block):
    """Contiguous multi-row write: one dispatch for a whole burst of
    enrollments.  ``block`` is zero-padded to a bucket size so only a
    handful of shapes ever compile; padding rows land beyond ``count``
    where every query masks them out."""
    gal = jax.lax.dynamic_update_slice(gal, block, (start, 0))
    gal16 = jax.lax.dynamic_update_slice(
        gal16, block.astype(jnp.bfloat16), (start, 0)
    )
    return gal, gal16


@partial(jax.jit, static_argnames=("k", "strict"))
def _query(gal: jnp.ndarray, queries: jnp.ndarray, count, k: int,
           strict: bool = False):
    valid = jnp.arange(gal.shape[0]) < count
    fn = cosine_topk_f32 if strict else cosine_topk
    return fn(queries, gal, valid, k=k)


def _use_pallas() -> bool:
    """The fused kernel needs a real TPU backend (tests run interpret
    mode explicitly)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


class DeviceGallery:
    """Exact cosine top-k index with HNSWManager-compatible semantics."""

    def __init__(
        self,
        embedding_dim: int,
        index_path: Optional[str] = None,
        labels_path: Optional[str] = None,
        db_ids_path: Optional[str] = None,
        encryptor: Optional[Encryptor] = None,
        capacity: int = 100_000,
        journal_compact_threshold: int = 4096,
        strict_f32_match: bool = False,
    ):
        self.embedding_dim = embedding_dim
        self.capacity = capacity
        # large galleries pad to the Pallas kernel's preferred 2048-row
        # tile (at the 100k cap: 102400 = 50 × 2048, vs the 256-row
        # tiles the old 128-row padding forced); small test galleries
        # keep the lane-width padding
        self.padded = _round_up(capacity, 2048 if capacity >= 2048 else 128)
        self.index_path = index_path
        self.labels_path = labels_path
        self.db_ids_path = db_ids_path
        self.encryptor = encryptor
        self.journal_compact_threshold = journal_compact_threshold
        # EngineConfig.strict_f32_match: route matching through the f32
        # master instead of the bf16 shadow (reference-parity numerics
        # for borderline 0.7-enroll / 0.75-unify threshold decisions).
        self.strict_f32_match = strict_f32_match

        self.labels: List[str] = []
        self.db_ids: List[int] = []
        self._gal = jnp.zeros((self.padded, embedding_dim), jnp.float32)
        # bf16 shadow of the matrix: every hot-path matmul (XLA and
        # Pallas) computes in bf16 anyway, so keeping a resident bf16
        # copy halves the per-query HBM read AND removes the per-call
        # 200 MB f32->bf16 cast both paths were silently paying.  The
        # f32 master stays authoritative for persistence.
        self._gal16 = jnp.zeros((self.padded, embedding_dim), jnp.bfloat16)
        # incremental-persistence bookkeeping: rows covered by the
        # snapshot triplet / the sidecar journal on disk
        self._snapshot_rows = 0
        self._journal_rows = 0
        self._labels_dirty = False  # a rename touched snapshot rows
        self._force_compact = False  # recovery left stale files on disk
        # Lazy enrollment: ``add`` buffers rows host-side; one bucketed
        # device write flushes them before the next query.  A per-add
        # device dispatch (plus the journal's D2H readback of fresh
        # rows) was measurably stalling the pipelined batched step —
        # the tunnel dispatch/readback floor is ~ms-scale here.
        self._pending: List[np.ndarray] = []
        # host copies of rows added since the last compaction: the
        # journal append reads these instead of a device readback.
        # Bounded by journal_compact_threshold (compaction clears it).
        self._fresh_host: List[np.ndarray] = []
        self._fresh_start = 0  # absolute row index of _fresh_host[0]

        paths = [index_path, labels_path, db_ids_path]
        if all(p and os.path.exists(p) for p in paths):
            self._load()
        else:
            log.info("Initialized new device gallery (capacity %d).", capacity)

    # -- size --------------------------------------------------------------

    @property
    def count(self) -> int:
        return len(self.labels)

    def get_current_count(self) -> int:  # hnswlib API parity
        return self.count

    @property
    def gal_matmul(self) -> jnp.ndarray:
        """The matmul operand for hot-path engines (batched step,
        multi-stream, sharded view).  bf16 shadow by default — same
        values the f32 path would cast per call, at half the HBM
        traffic; the f32 master under ``strict_f32_match``."""
        self._flush_pending()
        return self._gal if self.strict_f32_match else self._gal16

    def _flush_pending(self) -> None:
        """Write all host-buffered enrollments to the device in ONE
        bucketed dispatch (8/64/512/4096-row blocks, zero-padded; the
        padding rows sit beyond ``count`` and are masked by every
        query).  Falls back to per-row writes only when a block would
        run past the padded matrix end near the capacity cap."""
        if not self._pending:
            return
        n = len(self._pending)
        start = self.count - n
        block = np.stack(self._pending)
        bucket = 8
        while bucket < n:
            bucket *= 8
        if start + bucket <= self.padded:
            if bucket > n:
                block = np.concatenate(
                    [block, np.zeros((bucket - n, self.embedding_dim), np.float32)]
                )
            self._gal, self._gal16 = _set_rows(
                self._gal, self._gal16, start, jax.device_put(block)
            )
        else:
            for i in range(n):
                self._gal, self._gal16 = _set_row(
                    self._gal, self._gal16, start + i, jax.device_put(block[i])
                )
        self._pending.clear()

    # -- persistence -------------------------------------------------------

    def _read(self, path: str) -> bytes:
        if self.encryptor:
            return self.encryptor.read_and_decrypt(path)
        with open(path, "rb") as f:
            return f.read()

    def _write(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        # atomic replace: a crash mid-write leaves the previous file
        # intact instead of a torn one (torn triplets force a full
        # rebuild-from-SQLite on next start — lossless but slow)
        tmp = path + ".tmp"
        if self.encryptor:
            self.encryptor.encrypt_and_write(tmp, data)
        else:
            with open(tmp, "wb") as f:
                f.write(data)
        os.replace(tmp, path)

    @property
    def _journal_path(self) -> Optional[str]:
        return self.index_path + ".journal" if self.index_path else None

    def _read_journal(self):
        """Yield (abs_row_index, label, db_id, vec) from the sidecar
        journal.  Raises on any malformed record (caller treats as
        corrupt and rebuilds from SQLite).

        Legacy (round-2) records are bare [(label, db_id, blob), ...]
        lists without a row index; they were replayed strictly
        sequentially after the snapshot, so migrate them in place by
        assigning sequential indices from the snapshot end and forcing
        an immediate compaction (which rewrites the journal in the
        indexed format) instead of discarding a valid journal.
        """
        path = self._journal_path
        if not path or not os.path.exists(path):
            return
        with open(path, "rb") as f:
            data = f.read()
        off = 0
        next_row = self._snapshot_rows  # sequential cursor for legacy records
        legacy_seen = False
        while off < len(data):
            if off + 4 > len(data):
                raise ValueError("truncated journal record header")
            n = int.from_bytes(data[off : off + 4], "little")
            off += 4
            if off + n > len(data):
                raise ValueError("truncated journal record payload")
            payload = data[off : off + n]
            off += n
            if self.encryptor:
                payload = self.encryptor.decrypt_data(payload)
            rec = pickle.loads(payload)
            if isinstance(rec, dict):
                start = int(rec["start"])
                rows = rec["rows"]
            elif isinstance(rec, (list, tuple)):
                if not legacy_seen:
                    legacy_seen = True
                    self._force_compact = True  # rewrite in indexed format
                    log.warning(
                        "Legacy (index-less) gallery journal detected — "
                        "migrating sequentially and compacting on next save."
                    )
                start = next_row
                rows = rec
            else:
                raise ValueError("unrecognized journal record type")
            for i, (label, db_id, blob) in enumerate(rows):
                vec = np.frombuffer(blob, np.float32)
                if vec.shape[0] != self.embedding_dim:
                    raise ValueError("journal row dim mismatch")
                yield start + i, label, int(db_id), vec
            next_row = max(next_row, start + len(rows))

    def _append_journal(self, rows, start_row: int) -> None:
        """Append one length-prefixed record holding ``rows`` =
        [(label, db_id, vec), ...] destined for gallery rows
        ``start_row..start_row+len(rows)``.  The absolute index makes
        replay idempotent: rows a crash left both in a fresh snapshot
        AND in the journal are skipped on load instead of duplicated."""
        payload = pickle.dumps({
            "start": int(start_row),
            "rows": [
                (label, db_id, np.asarray(vec, np.float32).tobytes())
                for label, db_id, vec in rows
            ],
        })
        if self.encryptor:
            payload = self.encryptor.encrypt_data(payload)
        with open(self._journal_path, "ab") as f:
            f.write(len(payload).to_bytes(4, "little"))
            f.write(payload)

    def _load(self) -> None:
        try:
            buf = io.BytesIO(self._read(self.index_path))
            mat = np.load(buf, allow_pickle=False)
            labels = pickle.loads(self._read(self.labels_path))
            db_ids = pickle.loads(self._read(self.db_ids_path))
            if mat.shape != (len(labels), self.embedding_dim):
                raise ValueError(f"index shape {mat.shape} != {len(labels)} labels")
            self.labels = list(labels)
            self.db_ids = list(db_ids)
            gal = np.zeros((self.padded, self.embedding_dim), np.float32)
            gal[: len(labels)] = mat
            self._snapshot_rows = len(labels)
            # replay rows journaled since the last compaction; indexed
            # records are idempotent (skip rows the snapshot already
            # holds — the crash window between snapshot write and
            # journal removal would otherwise duplicate them)
            n_journal = 0
            for abs_idx, label, db_id, vec in self._read_journal():
                if abs_idx < self._snapshot_rows:
                    continue  # already compacted into the snapshot
                if abs_idx != self.count:
                    raise ValueError(
                        f"journal discontinuity: row {abs_idx} vs count {self.count}"
                    )
                if self.count >= self.capacity:
                    break
                gal[self.count] = vec
                self.labels.append(label)
                self.db_ids.append(db_id)
                n_journal += 1
            self._journal_rows = n_journal
            self._gal = jnp.asarray(gal)
            self._gal16 = self._gal.astype(jnp.bfloat16)
            self._fresh_host = []
            self._fresh_start = self.count
            log.info(
                "Loaded gallery (%d identities: %d snapshot + %d journal) from disk.",
                self.count, self._snapshot_rows, n_journal,
            )
        except Exception as e:
            # corrupt/legacy index or journal → fresh, caller rebuilds
            # from SQLite (hnsw_manager.py:69-76)
            log.error("Error loading gallery index: %s", e)
            self.labels, self.db_ids = [], []
            self._gal = jnp.zeros((self.padded, self.embedding_dim), jnp.float32)
            self._gal16 = jnp.zeros((self.padded, self.embedding_dim), jnp.bfloat16)
            self._snapshot_rows = self._journal_rows = 0
            self._pending, self._fresh_host, self._fresh_start = [], [], 0
            # the stale snapshot/journal files are still on disk; the
            # next save must replace them wholesale or every later
            # startup re-fails the load and re-appends the rebuilt rows
            # to a journal that never shrinks
            self._force_compact = True
            log.info("Initialized a new gallery due to loading failure.")

    def save(self, compact: bool = False) -> None:
        """Persist state (hnsw_manager.py:78-112 triplet layout).

        Incremental by default: new rows since the last write are
        appended to the journal; the full snapshot is rewritten only
        when ``compact`` is set, labels changed (rename/unify), the
        journal crossed ``journal_compact_threshold`` rows, or no
        snapshot exists yet.
        """
        if not (self.index_path and self.labels_path and self.db_ids_path):
            return
        persisted = self._snapshot_rows + self._journal_rows
        have_snapshot = os.path.exists(self.index_path)
        journal_after = self._journal_rows + (self.count - persisted)
        must_compact = (
            compact
            or self._labels_dirty
            or self._force_compact
            or not have_snapshot
            or journal_after > self.journal_compact_threshold
        )
        if not must_compact:
            if self.count == persisted:
                return  # nothing new
            if persisted >= self._fresh_start:
                # the usual case: every unpersisted row was added via
                # ``add`` since the last compaction, so its host copy is
                # in _fresh_host — no device readback on the hot path
                off = persisted - self._fresh_start
                fresh = self._fresh_host[off : off + (self.count - persisted)]
            else:
                self._flush_pending()
                fresh = np.asarray(self._gal[persisted : self.count])  # one D2H
            rows = [
                (self.labels[i], self.db_ids[i], fresh[i - persisted])
                for i in range(persisted, self.count)
            ]
            self._append_journal(rows, start_row=persisted)
            self._journal_rows += len(rows)
            log.info("Appended %d rows to gallery journal.", len(rows))
            return
        self._flush_pending()
        if self._fresh_start == 0 and len(self._fresh_host) >= self.count:
            # every live row has a host copy (fresh bulk hydrate and/or
            # adds since startup) — compact without a device readback
            mat = (
                np.stack(self._fresh_host[: self.count])
                if self.count
                else np.zeros((0, self.embedding_dim), np.float32)
            )
        else:
            mat = np.asarray(self._gal[: self.count])  # one D2H
        buf = io.BytesIO()
        np.save(buf, mat, allow_pickle=False)
        self._write(self.index_path, buf.getvalue())
        self._write(self.labels_path, pickle.dumps(self.labels))
        self._write(self.db_ids_path, pickle.dumps(self.db_ids))
        jp = self._journal_path
        if jp and os.path.exists(jp):
            os.remove(jp)
        self._snapshot_rows = self.count
        self._journal_rows = 0
        self._labels_dirty = False
        self._force_compact = False
        # compaction bound: the snapshot now covers everything, so the
        # journal host copies can be dropped
        self._fresh_host = []
        self._fresh_start = self.count
        log.info("Saved gallery index and mappings to disk (compacted).")

    save_hnswlib_index = save  # orchestrator-facing alias

    # -- mutation ----------------------------------------------------------

    def add(self, embedding: np.ndarray, label: str, db_id: int) -> bool:
        """Append one identity (hnsw_manager.py:135-143; returns False at
        the capacity cap)."""
        if self.count >= self.capacity:
            log.warning("Gallery has reached its maximum capacity. Cannot add more embeddings.")
            return False
        vec = np.asarray(embedding, np.float32).reshape(-1)
        n = np.linalg.norm(vec)
        if n > 0:
            vec = vec / n
        # deferred device write: buffered host-side, flushed in one
        # bucketed dispatch by the next query/save (_flush_pending)
        self._pending.append(vec)
        self._fresh_host.append(vec)
        self.labels.append(label)
        self.db_ids.append(int(db_id))
        return True

    add_embedding = add

    def load_rows(self, rows) -> None:
        """Bulk hydrate from SQLite rows with re-normalization
        (hnsw_manager.py:114-133); one host→device transfer."""
        vecs, labels, db_ids = [], [], []
        for db_id, label, blob in rows:
            emb = np.frombuffer(blob, np.float32)
            if emb.shape[0] != self.embedding_dim:
                log.warning("Embedding size mismatch for label '%s'. Skipping.", label)
                continue
            n = np.linalg.norm(emb)
            if n == 0:
                log.warning("Zero vector found for label '%s'. Skipping.", label)
                continue
            vecs.append(emb / n)
            labels.append(label)
            db_ids.append(int(db_id))
        if not vecs:
            return
        take = min(len(vecs), self.capacity - self.count)
        if take < len(vecs):
            log.warning("Gallery capacity cap: loading %d of %d rows.", take, len(vecs))
        self._flush_pending()
        start = self.count
        block = np.stack(vecs[:take])
        # Device-side scatter: H2D of the NEW rows only.  The previous
        # implementation round-tripped the whole 200 MB matrix through
        # the host (D2H + H2D) — minutes over a slow dev tunnel.
        self._gal, self._gal16 = _set_rows(
            self._gal, self._gal16, start, jax.device_put(block)
        )
        self.labels.extend(labels[:take])
        self.db_ids.extend(db_ids[:take])
        # Keep host copies (≤205 MB at the 100k cap): journal appends
        # and the next compaction read these instead of a device
        # readback; compaction drops them again.
        if self._fresh_start + len(self._fresh_host) == start:
            self._fresh_host.extend(block)
        else:
            self._fresh_host = list(block)
            self._fresh_start = start
        log.info("Loaded %d embeddings into device gallery.", take)

    load_embeddings_into_hnswlib = load_rows

    # -- queries -----------------------------------------------------------

    def query(self, embedding: np.ndarray, k: int = 1):
        """(ids, cosine distances) like hnswlib knn_query; (None, None)
        when empty (hnsw_manager.py:145-149)."""
        return self.query_batch(np.asarray(embedding, np.float32).reshape(1, -1), k)

    def query_batch(self, embeddings: np.ndarray, k: int = 1):
        """Batched variant used by the pipeline (one matmul for all
        faces of a frame batch).  k=1 on TPU uses the fused Pallas
        kernel (fire_tpu.ops.pallas_topk); everything else the XLA path.
        """
        if self.count == 0:
            return None, None
        self._flush_pending()
        q = jax.device_put(np.asarray(embeddings, np.float32))
        if self.strict_f32_match:
            # f32-master numerics (the Pallas kernel is bf16-only)
            sims, idx = _query(self._gal, q, self.count, min(k, self.count),
                               strict=True)
            return np.asarray(idx), 1.0 - np.asarray(sims)
        if k == 1 and _use_pallas():
            from fire_tpu.ops.pallas_topk import pallas_cosine_top1

            sims, idx = pallas_cosine_top1(q, self._gal16, self.count)
            return np.asarray(idx)[:, None], 1.0 - np.asarray(sims)[:, None]
        sims, idx = _query(self._gal16, q, self.count, min(k, self.count))
        return np.asarray(idx), 1.0 - np.asarray(sims)

    def find_similar(self, embedding: np.ndarray, threshold: float, k: int = 50) -> List[int]:
        """All ids with similarity ≥ threshold among the top
        min(k, count) (hnsw_manager.py:227-244)."""
        if self.count == 0:
            return []
        ids, dists = self.query(embedding, k=min(k, self.count))
        out = []
        for i, d in zip(ids[0], dists[0]):
            if 1.0 - d >= threshold:
                out.append(int(i))
        return out

    find_similar_embeddings = find_similar

    # -- relabel / unify ---------------------------------------------------

    def rename_single(self, gid: int, new_label: str, store) -> None:
        """hnsw_manager.py:201-207."""
        db_id = self.db_ids[gid]
        store.update_label(db_id, new_label)
        self.labels[gid] = new_label
        self._labels_dirty = True  # snapshot rows changed → compact
        self.save()

    def unify_labels(self, gids: List[int], new_label: str, store,
                     save: bool = True) -> None:
        """Rename a whole similar group in DB + memory
        (hnsw_manager.py:209-225).  ``save=False`` defers the snapshot
        compaction so a caller doing many unifications (shrink_db_ids)
        pays one rewrite at the end instead of one per group."""
        store.update_labels([self.db_ids[g] for g in gids], new_label)
        for g in gids:
            self.labels[g] = new_label
        self._labels_dirty = True  # snapshot rows changed → compact
        log.info("Unified %d embeddings under label '%s'.", len(gids), new_label)
        if save:
            self.save()

    def update_label(self, gid: int, new_label: str, store, similarity_threshold: float = 0.7) -> None:
        """Group relabel with conflict refusal (hnsw_manager.py:151-199):
        unify all neighbours ≥ threshold under ``new_label`` unless more
        than one distinct known (non-Unknown) label is present."""
        if gid < 0 or gid >= self.count:
            log.error("Invalid gallery id for update_label.")
            return
        ref = store.get_embedding(self.db_ids[gid])
        if ref is None:
            self.rename_single(gid, new_label, store)
            return
        similar = self.find_similar(ref, similarity_threshold, k=50)
        if not similar:
            self.rename_single(gid, new_label, store)
            return
        known = [self.labels[s] for s in similar if not self.labels[s].lower().startswith("unknown")]
        if len(set(known)) > 1:
            log.warning("Conflicting known labels found. Not unifying this group.")
            self.rename_single(gid, new_label, store)
            return
        self.unify_labels(similar, new_label, store)


class ShardedGalleryView:
    """Multi-chip view of a DeviceGallery: rows sharded over the mesh's
    ``dp`` axis, queries answered with local MXU top-k + an ICI
    all-gather of the tiny candidate sets (SURVEY.md §2.4(d)).

    The host-side DeviceGallery stays the mutation point (labels,
    SQLite); call :meth:`refresh` after enrollments to re-shard.
    """

    _BLOCK = 128  # incremental-refresh granularity (gallery.padded is a multiple)

    def __init__(self, gallery: DeviceGallery, mesh, axis: str = "dp"):
        from fire_tpu.parallel.sharded_gallery import shard_gallery

        self.gallery = gallery
        self.mesh = mesh
        self.axis = axis
        self._shard = shard_gallery
        self._gal_sharded = None
        self._synced = 0  # gallery rows reflected in the sharded copy
        self.refresh()

    def refresh(self, force: bool = False) -> None:
        """Sync the sharded copy with the host gallery.

        Enrollment appends rows, so the usual case re-ships only the
        128-row blocks touched since the last sync (a donated sharded
        dynamic-update-slice, O(block) traffic); a full re-shard happens
        only on first build, shrink (rebuild-from-SQLite recovery), or
        mesh-size change.  Validity needs no mask array at all — the
        query derives it per shard from the replicated row count.
        """
        from fire_tpu.parallel.sharded_gallery import update_sharded_rows

        gal = self.gallery.gal_matmul  # bf16 shadow: half the shard traffic
        n = self.mesh.shape[self.axis]
        pad = ((gal.shape[0] + n - 1) // n) * n
        count = self.gallery.count
        if (
            force
            or self._gal_sharded is None
            or count < self._synced
            or self._gal_sharded.shape[0] != pad
        ):
            if pad != gal.shape[0]:
                gal = jnp.pad(gal, ((0, pad - gal.shape[0]), (0, 0)))
            self._gal_sharded = self._shard(self.mesh, gal, self.axis)
            self._synced = count
            return
        bk = self._BLOCK
        for bs in range((self._synced // bk) * bk, count, bk):
            # gallery.padded is a multiple of _BLOCK, and count ≤
            # capacity ≤ padded ≤ sharded pad, so every dirty block is
            # full and in range — no clamping, which would silently
            # misalign the write
            assert bs + bk <= gal.shape[0] <= self._gal_sharded.shape[0]
            # device-side slice → replicated placement on the mesh:
            # the rows never round-trip through host memory
            block = jax.device_put(
                jax.lax.dynamic_slice_in_dim(gal, bs, bk, 0),
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec(None, None)
                ),
            )
            self._gal_sharded = update_sharded_rows(self._gal_sharded, block, bs)
        self._synced = count

    def query(self, embedding: np.ndarray, k: int = 1):
        """Single-query convenience (DeviceGallery.query contract)."""
        return self.query_batch(np.asarray(embedding, np.float32).reshape(1, -1), k)

    @property
    def count(self) -> int:
        return self.gallery.count

    @property
    def labels(self):
        return self.gallery.labels

    def query_batch(self, embeddings: np.ndarray, k: int = 1):
        """Same contract as DeviceGallery.query_batch, sharded."""
        from fire_tpu.parallel.sharded_gallery import sharded_cosine_topk

        count = self.gallery.count
        if count == 0:
            return None, None
        if count != self._synced:
            self.refresh()
        q = jax.device_put(np.asarray(embeddings, np.float32))
        sims, idx = sharded_cosine_topk(
            self.mesh, q, self._gal_sharded, jnp.int32(count),
            k=min(k, count), axis=self.axis,
        )
        return np.asarray(idx), 1.0 - np.asarray(sims)
