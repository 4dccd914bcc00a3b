"""Gallery subsystem: crypto round-trips, SQLite store, device index."""

import numpy as np
import pytest

from fire_tpu.gallery.crypto import Encryptor
from fire_tpu.gallery.index import DeviceGallery
from fire_tpu.gallery.store import FaceStore


def _emb(rng, d=32):
    v = rng.standard_normal(d).astype(np.float32)
    return v / np.linalg.norm(v)


# ---------------------------------------------------------------- crypto ---

def test_fernet_roundtrip():
    enc = Encryptor("hunter2")
    blob = enc.encrypt_data(b"secret payload")
    assert blob[:16] != b"secret payload"[:16]
    assert enc.decrypt_data(blob) == b"secret payload"
    # fresh salt every time → different ciphertexts
    assert enc.encrypt_data(b"x") != enc.encrypt_data(b"x")


def test_fernet_wrong_password_fails():
    from cryptography.fernet import InvalidToken

    blob = Encryptor("right").encrypt_data(b"data")
    with pytest.raises(InvalidToken):
        Encryptor("wrong").decrypt_data(blob)


def test_reference_file_format_shape():
    """salt(16) ‖ Fernet token — the exact on-disk layout of
    modules/encryption.py:30-35."""
    import base64

    blob = Encryptor("pw").encrypt_data(b"payload")
    salt, token = blob[:16], blob[16:]
    assert len(salt) == 16
    # Fernet tokens are urlsafe-base64 and start with version 0x80
    raw = base64.urlsafe_b64decode(token)
    assert raw[0] == 0x80


# ----------------------------------------------------------------- store ---

def test_store_roundtrip(tmp_path, rng):
    db = tmp_path / "faces.db"
    s = FaceStore(str(db), embedding_dim=32)
    e1, e2 = _emb(rng), _emb(rng)
    id1 = s.add("alice", e1)
    id2 = s.add("bob", e2)
    assert id2 == id1 + 1
    rows = s.load_all()
    assert [r[1] for r in rows] == ["alice", "bob"]
    np.testing.assert_allclose(s.get_embedding(id1), e1, atol=1e-6)
    s.update_label(id1, "alicia")
    assert s.load_all()[0][1] == "alicia"
    s.save()
    # reopen from disk
    s2 = FaceStore(str(db), embedding_dim=32)
    assert s2.count() == 2


def test_store_encrypted_roundtrip(tmp_path, rng):
    enc = Encryptor("pw")
    path = tmp_path / "faces.db.enc"
    s = FaceStore(None, str(path), enc, embedding_dim=16)
    s.add("carol", _emb(rng, 16))
    s.save()
    assert path.exists()
    # ciphertext on disk, decryptable reopen
    s2 = FaceStore(None, str(path), enc, embedding_dim=16)
    rows = s2.load_all()
    assert len(rows) == 1 and rows[0][1] == "carol"
    # wrong password → empty DB, no crash (database.py:44-46)
    s3 = FaceStore(None, str(path), Encryptor("nope"), embedding_dim=16)
    assert s3.count() == 0


# ----------------------------------------------------------------- index ---

def test_gallery_add_query(rng):
    g = DeviceGallery(embedding_dim=32, capacity=1000)
    embs = [_emb(rng) for _ in range(10)]
    for i, e in enumerate(embs):
        assert g.add(e, f"person{i}", db_id=100 + i)
    assert g.count == 10
    ids, dists = g.query(embs[7], k=1)
    assert ids[0][0] == 7
    assert dists[0][0] < 1e-2  # cosine distance ≈ 0 for itself
    assert g.labels[ids[0][0]] == "person7"


def test_gallery_query_empty():
    g = DeviceGallery(embedding_dim=8)
    assert g.query(np.ones(8, np.float32)) == (None, None)


def test_gallery_persistence_roundtrip(tmp_path, rng):
    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    for i in range(5):
        g.add(_emb(rng, 16), f"p{i}", i)
    g.save()
    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.count == 5
    assert g2.labels == [f"p{i}" for i in range(5)]
    assert g2.db_ids == list(range(5))


def test_gallery_encrypted_persistence(tmp_path, rng):
    enc = Encryptor("pw")
    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, encryptor=enc, capacity=100)
    g.add(_emb(rng, 16), "dave", 1)
    g.save()
    g2 = DeviceGallery(16, *paths, encryptor=enc, capacity=100)
    assert g2.labels == ["dave"]


def test_gallery_corrupt_index_reinitializes(tmp_path, rng):
    """hnsw_manager.py:69-76 recovery semantics: garbage file → fresh
    empty gallery (caller then rebuilds from SQLite)."""
    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    for p in paths:
        with open(p, "wb") as f:
            f.write(b"not a real index")
    g = DeviceGallery(16, *paths, capacity=100)
    assert g.count == 0


def test_gallery_hydrate_from_store(tmp_path, rng):
    db = tmp_path / "f.db"
    s = FaceStore(str(db), embedding_dim=16)
    for i in range(4):
        s.add(f"u{i}", _emb(rng, 16) * 3.0)  # unnormalized on purpose
    g = DeviceGallery(16, capacity=100)
    g.load_rows(s.load_all())
    assert g.count == 4
    # rows were renormalized on load (hnsw_manager.py:122-126)
    ids, dists = g.query(s.get_embedding(1), k=1)
    assert g.db_ids[ids[0][0]] == 1


def test_gallery_capacity_cap(rng):
    g = DeviceGallery(8, capacity=3)
    for i in range(3):
        assert g.add(_emb(rng, 8), f"x{i}", i)
    assert not g.add(_emb(rng, 8), "overflow", 99)
    assert g.count == 3


def test_update_label_unifies_group(tmp_path, rng):
    """Group relabel + conflict refusal (hnsw_manager.py:151-199)."""
    db = tmp_path / "f.db"
    s = FaceStore(str(db), embedding_dim=16)
    g = DeviceGallery(16, capacity=100)
    base = _emb(rng, 16)
    # three near-duplicates labelled unknown + one far entry
    for i in range(3):
        v = base + 0.05 * rng.standard_normal(16).astype(np.float32)
        v /= np.linalg.norm(v)
        did = s.add(f"Unknown_{i}", v)
        g.add(v, f"Unknown_{i}", did)
    far = _emb(rng, 16)
    did = s.add("eve", far)
    g.add(far, "eve", did)

    g.update_label(0, "frank", s, similarity_threshold=0.7)
    assert g.labels[:3] == ["frank", "frank", "frank"]
    assert g.labels[3] == "eve"
    assert [r[1] for r in s.load_all()[:3]] == ["frank", "frank", "frank"]


def test_update_label_conflict_refusal(tmp_path, rng):
    db = tmp_path / "f.db"
    s = FaceStore(str(db), embedding_dim=16)
    g = DeviceGallery(16, capacity=100)
    base = _emb(rng, 16)
    for name in ("alice", "bob"):  # two distinct KNOWN labels, similar
        v = base + 0.02 * rng.standard_normal(16).astype(np.float32)
        v /= np.linalg.norm(v)
        did = s.add(name, v)
        g.add(v, name, did)
    g.update_label(0, "carol", s, similarity_threshold=0.5)
    # conflict → only the requested entry renamed
    assert g.labels == ["carol", "bob"]


# ------------------------------------------------- incremental journal ---

def test_gallery_journal_appends_without_snapshot_rewrite(tmp_path, rng):
    """VERDICT r1 #8: per-enrollment save() must append to the journal,
    not rewrite the full matrix."""
    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    for i in range(3):
        g.add(_emb(rng, 16), f"base{i}", i)
    g.save()  # no snapshot yet -> full write
    snap_mtime = __import__("os").path.getmtime(paths[0])
    snap_bytes = open(paths[0], "rb").read()

    for i in range(3, 8):
        g.add(_emb(rng, 16), f"p{i}", i)
        g.save()  # each of these must journal-append
    assert open(paths[0], "rb").read() == snap_bytes  # snapshot untouched
    assert __import__("os").path.exists(paths[0] + ".journal")

    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.count == 8
    assert g2.labels == g.labels and g2.db_ids == g.db_ids
    # gal_matmul flushes lazily-buffered adds before the private read
    g.gal_matmul
    ids, dists = g2.query(np.asarray(g._gal[6]), k=1)
    assert int(ids[0][0]) == 6 and float(dists[0][0]) < 1e-5


def test_gallery_journal_encrypted_roundtrip(tmp_path, rng):
    enc = Encryptor("pw")
    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, encryptor=enc, capacity=100)
    g.add(_emb(rng, 16), "a", 1)
    g.save()
    g.add(_emb(rng, 16), "b", 2)
    g.save()  # journaled, encrypted record
    raw = open(paths[0] + ".journal", "rb").read()
    assert b"b" not in raw[4:20] or len(raw) > 60  # ciphertext, not pickle
    g2 = DeviceGallery(16, *paths, encryptor=enc, capacity=100)
    assert g2.labels == ["a", "b"] and g2.db_ids == [1, 2]


def test_gallery_compaction_folds_journal(tmp_path, rng):
    import os

    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100, journal_compact_threshold=2)
    g.add(_emb(rng, 16), "a", 1)
    g.save()
    for i in range(2, 5):
        g.add(_emb(rng, 16), f"p{i}", i)
        g.save()
    # 3rd journaled add exceeds the threshold (2) -> compacted
    assert not os.path.exists(paths[0] + ".journal")
    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.count == 4 and g2._snapshot_rows == 4


def test_gallery_explicit_compact_removes_journal(tmp_path, rng):
    import os

    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    g.add(_emb(rng, 16), "a", 1)
    g.save()
    g.add(_emb(rng, 16), "b", 2)
    g.save()
    assert os.path.exists(paths[0] + ".journal")
    g.save(compact=True)
    assert not os.path.exists(paths[0] + ".journal")
    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.labels == ["a", "b"] and g2._journal_rows == 0


def test_gallery_rename_forces_compaction(tmp_path, rng):
    """A relabel mutates snapshot rows the journal can't express -> the
    next save must rewrite the snapshot."""
    import os

    from fire_tpu.gallery.store import FaceStore

    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    store = FaceStore(str(tmp_path / "db.sqlite"))
    g = DeviceGallery(16, *paths, capacity=100)
    e = _emb(rng, 16)
    db_id = store.add("old", e.tobytes())
    g.add(e, "old", db_id)
    g.save()
    g.add(_emb(rng, 16), "x", store.add("x", _emb(rng, 16).tobytes()))
    g.save()  # journaled
    g.rename_single(0, "new", store)  # dirty -> compacts inside save()
    assert not os.path.exists(paths[0] + ".journal")
    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.labels == ["new", "x"]


def test_gallery_legacy_journal_migrates(tmp_path, rng):
    """A pre-round-3 journal (bare [(label, db_id, blob), ...] records,
    no row index) is migrated sequentially instead of being treated as
    corruption, and the next save compacts it into the indexed format."""
    import os
    import pickle

    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    e0 = _emb(rng, 16)
    g.add(e0, "snap", 1)
    g.save(compact=True)
    # hand-write a legacy journal record exactly as the round-2 writer did
    e1, e2 = _emb(rng, 16), _emb(rng, 16)
    payload = pickle.dumps([("j1", 2, e1.tobytes()), ("j2", 3, e2.tobytes())])
    with open(paths[0] + ".journal", "ab") as f:
        f.write(len(payload).to_bytes(4, "little"))
        f.write(payload)

    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.labels == ["snap", "j1", "j2"] and g2.db_ids == [1, 2, 3]
    np.testing.assert_allclose(np.asarray(g2._gal[1]), e1, rtol=1e-6)
    assert g2._force_compact  # migration rewrites on next save
    g2.save()
    assert not os.path.exists(paths[0] + ".journal")
    g3 = DeviceGallery(16, *paths, capacity=100)
    assert g3.labels == ["snap", "j1", "j2"] and g3._snapshot_rows == 3


def test_gallery_strict_f32_match_routes_master(tmp_path, rng):
    """strict_f32_match: queries run against the f32 master — a vector
    whose bf16 rounding would misrank two near-identical candidates
    still ranks exactly as f32 does."""
    g = DeviceGallery(16, capacity=100, strict_f32_match=True)
    base = _emb(rng, 16)
    # two candidates whose similarity gap to the query (~5e-5) is far
    # above f32 resolution but far below bf16 resolution (~4e-3)
    a = base.copy()
    b = base + 0.01 * _emb(rng, 16)
    b /= np.linalg.norm(b)
    g.add(a, "a", 1)
    g.add(b, "b", 2)
    q = (a + 0.002 * _emb(rng, 16)).astype(np.float32)
    q /= np.linalg.norm(q)
    ids, dists = g.query(q, k=2)
    sims_f32 = np.array([q.astype(np.float64) @ a, q.astype(np.float64) @ b])
    assert list(ids[0]) == list(np.argsort(-sims_f32))
    np.testing.assert_allclose(1.0 - dists[0][0], sims_f32.max(), atol=1e-6)
    # and the hot-path matmul operand is the f32 master itself
    assert g.gal_matmul.dtype == np.float32


def test_gallery_corrupt_journal_recovers_fresh(tmp_path, rng):
    """Truncated/garbage journal == corrupt index: fresh gallery so the
    orchestrator's rebuild-from-SQLite path kicks in."""
    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    g.add(_emb(rng, 16), "a", 1)
    g.save()
    with open(paths[0] + ".journal", "wb") as f:
        f.write(b"\x40\x00\x00\x00garbage")  # claims 64 bytes, has 7
    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.count == 0


def test_journal_replay_idempotent_after_crash_window(tmp_path, rng):
    """A crash between the compaction's snapshot write and journal
    removal leaves rows in BOTH files; indexed journal records must be
    skipped on load, not duplicated."""
    import os

    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    for i in range(3):
        g.add(_emb(rng, 16), f"p{i}", i)
    g.save()  # snapshot(3)
    for i in range(3, 6):
        g.add(_emb(rng, 16), f"p{i}", i)
    g.save()  # journal rows 3..6
    journal = open(paths[0] + ".journal", "rb").read()

    g.save(compact=True)  # snapshot(6), journal removed
    # simulate the crash window: journal still on disk after snapshot
    open(paths[0] + ".journal", "wb").write(journal)

    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.count == 6  # not 9
    assert g2.labels == [f"p{i}" for i in range(6)]
    # and the resurrected journal rows match the snapshot contents
    ids, dists = g2.query(np.asarray(g._gal[4]), k=1)
    assert int(ids[0][0]) == 4 and float(dists[0][0]) < 1e-2  # bf16 matmul


def test_recovery_save_replaces_stale_files(tmp_path, rng):
    """After a corrupt-index recovery + rebuild-from-SQLite, the next
    save must write a fresh snapshot and drop the stale journal —
    otherwise every startup re-fails the load and appends the rebuilt
    rows to a journal that never shrinks."""
    import os

    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    for i in range(4):
        g.add(_emb(rng, 16), f"p{i}", i)
    g.save()
    g.add(_emb(rng, 16), "p4", 4)
    g.save()  # journal exists
    open(paths[0], "wb").write(b"not an npy file")  # corrupt snapshot

    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.count == 0  # recovery: fresh gallery
    rows = [(i, f"p{i}", _emb(rng, 16).tobytes()) for i in range(4)]
    g2.load_rows(rows)  # the SQLite rebuild path
    g2.save()
    assert not os.path.exists(paths[0] + ".journal")  # compacted

    g3 = DeviceGallery(16, *paths, capacity=100)  # loads cleanly now
    assert g3.count == 4 and g3.labels == [f"p{i}" for i in range(4)]


def test_lazy_add_flushes_before_query(rng):
    """``add`` defers the device write; the next query must see every
    buffered row (round-3 lazy enrollment: one bucketed dispatch per
    step instead of one per add)."""
    g = DeviceGallery(embedding_dim=32, capacity=1000)
    embs = [_emb(rng) for _ in range(11)]  # > one 8-row bucket
    for i, e in enumerate(embs):
        assert g.add(e, f"p{i}", db_id=i)
    assert len(g._pending) == 11  # nothing dispatched yet
    ids, dists = g.query(embs[9], k=1)
    assert ids[0][0] == 9 and dists[0][0] < 1e-2
    assert not g._pending
    # matmul-view accessor flushes too
    g.add(_emb(rng), "late", 99)
    mat = np.asarray(g.gal_matmul, np.float32)
    assert np.linalg.norm(mat[g.count - 1]) > 0.5


def test_lazy_add_incremental_save_uses_host_copies(tmp_path, rng):
    """An incremental journal append after buffered adds must persist
    the right vectors WITHOUT forcing a device readback (host copies
    are kept until compaction)."""
    paths = [str(tmp_path / n) for n in ("idx.bin", "labels.pkl", "ids.pkl")]
    g = DeviceGallery(16, *paths, capacity=100)
    g.add(_emb(rng, 16), "base", 0)
    g.save(compact=True)  # snapshot exists → later saves are journal appends
    vecs = [_emb(rng, 16) for _ in range(3)]
    for i, v in enumerate(vecs):
        g.add(v, f"j{i}", 10 + i)
        g.save()  # per-enrollment flush, as the streaming path does
    assert len(g._pending) == 3  # saves never touched the device

    g2 = DeviceGallery(16, *paths, capacity=100)
    assert g2.labels == ["base", "j0", "j1", "j2"]
    for i, v in enumerate(vecs):
        ids, dists = g2.query(v, k=1)
        assert ids[0][0] == 1 + i and dists[0][0] < 1e-2


def test_lazy_add_bucket_fallback_near_capacity(rng):
    """Bursts landing within a bucket of the padded matrix end take the
    per-row path; results must stay exact right up to the cap."""
    g = DeviceGallery(embedding_dim=16, capacity=128)  # padded == 128
    embs = [_emb(rng, 16) for _ in range(128)]
    for i in range(124):
        assert g.add(embs[i], f"p{i}", i)
    g.query(embs[0], k=1)  # flush the big burst
    for i in range(124, 128):
        assert g.add(embs[i], f"p{i}", i)  # start+8 > padded → row path
    assert not g.add(_emb(rng, 16), "overflow", 999)
    ids, _ = g.query(embs[126], k=1)
    assert ids[0][0] == 126
