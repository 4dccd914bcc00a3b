"""SQLite persistence — schema- and file-compatible with the reference.

Same single-table schema as modules/database.py:53-59
(``faces(id INTEGER PRIMARY KEY AUTOINCREMENT, label TEXT NOT NULL,
embedding BLOB NOT NULL)``, embeddings as raw f32 ``tobytes()``) and the
same encrypted-mode flow: an in-memory database hydrated by
decrypt → tempfile → ``sqlite3.backup`` (modules/database.py:22-46) and
persisted by backup → tempfile → whole-file Fernet encryption
(modules/database.py:63-80).  A reference-created .db/.db.enc opens
here unchanged.

SQLite is the durable source of truth; the device gallery
(fire_tpu.gallery.index) is a cache rebuilt from these rows on startup
(SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import logging
import os
import sqlite3
import tempfile
from typing import List, Optional, Tuple

import numpy as np

from fire_tpu.gallery.crypto import Encryptor

log = logging.getLogger(__name__)


class FaceStore:
    def __init__(
        self,
        sqlite_db_path: Optional[str],
        sqlite_db_encrypted_path: Optional[str] = None,
        encryptor: Optional[Encryptor] = None,
        embedding_dim: int = 128,
    ):
        self.sqlite_db_path = sqlite_db_path
        self.sqlite_db_encrypted_path = sqlite_db_encrypted_path
        self.encryptor = encryptor
        self.embedding_dim = embedding_dim
        self.conn: Optional[sqlite3.Connection] = None
        self._open()

    # -- lifecycle ---------------------------------------------------------

    def _open(self) -> None:
        if self.encryptor and self.sqlite_db_encrypted_path:
            self.conn = sqlite3.connect(":memory:")
            if os.path.exists(self.sqlite_db_encrypted_path):
                try:
                    blob = self.encryptor.read_and_decrypt(self.sqlite_db_encrypted_path)
                    fd, tmp = tempfile.mkstemp(suffix=".db")
                    os.close(fd)
                    try:
                        with open(tmp, "wb") as f:
                            f.write(blob)
                        disk = sqlite3.connect(tmp)
                        disk.backup(self.conn)
                        disk.close()
                    finally:
                        os.remove(tmp)
                    log.info("Decrypted and loaded existing database into memory.")
                except Exception as e:  # keep running with empty DB (database.py:44-46)
                    log.error("Failed to load encrypted database: %s", e)
        else:
            assert self.sqlite_db_path is not None
            d = os.path.dirname(self.sqlite_db_path)
            if d:
                os.makedirs(d, exist_ok=True)
            self.conn = sqlite3.connect(self.sqlite_db_path)
            # WAL + NORMAL sync: per-enrollment commits in the streaming
            # hot path stop paying a full-journal fsync each (~ms).  Any
            # sqlite3 ≥3.7 (incl. the reference's) opens WAL files.
            self.conn.execute("PRAGMA journal_mode=WAL")
            self.conn.execute("PRAGMA synchronous=NORMAL")
        self.conn.execute(
            "CREATE TABLE IF NOT EXISTS faces ("
            " id INTEGER PRIMARY KEY AUTOINCREMENT,"
            " label TEXT NOT NULL,"
            " embedding BLOB NOT NULL)"
        )
        self.conn.commit()

    def save(self) -> None:
        """Flush to disk and close (modules/database.py:63-84)."""
        if self.conn is None:
            return
        if self.encryptor and self.sqlite_db_encrypted_path:
            fd, tmp = tempfile.mkstemp(suffix=".db")
            os.close(fd)
            try:
                disk = sqlite3.connect(tmp)
                self.conn.backup(disk)
                disk.close()
                with open(tmp, "rb") as f:
                    blob = f.read()
            finally:
                os.remove(tmp)
            d = os.path.dirname(self.sqlite_db_encrypted_path)
            if d:
                os.makedirs(d, exist_ok=True)
            self.encryptor.encrypt_and_write(self.sqlite_db_encrypted_path, blob)
            self.conn.close()
        else:
            self.conn.commit()
            self.conn.close()
        self.conn = None

    # -- rows --------------------------------------------------------------

    def add(self, label: str, embedding: np.ndarray) -> int:
        """Insert; returns the new row id or −1 on failure
        (modules/database.py:86-96)."""
        try:
            cur = self.conn.execute(
                "INSERT INTO faces (label, embedding) VALUES (?, ?)",
                (label, np.asarray(embedding, np.float32).tobytes()),
            )
            self.conn.commit()
            return int(cur.lastrowid)
        except Exception as e:
            log.error("Error adding face to SQLite: %s", e)
            return -1

    def load_all(self) -> List[Tuple[int, str, bytes]]:
        """(id, label, embedding_blob) for every row
        (modules/database.py:98-105)."""
        try:
            return list(self.conn.execute("SELECT id, label, embedding FROM faces"))
        except Exception as e:
            log.error("Error loading embeddings from SQLite: %s", e)
            return []

    def get_embedding(self, db_id: int) -> Optional[np.ndarray]:
        """Re-read + renormalize one embedding (hnsw_manager.py:246-262)."""
        row = self.conn.execute(
            "SELECT embedding FROM faces WHERE id=?", (db_id,)
        ).fetchone()
        if row is None:
            return None
        emb = np.frombuffer(row[0], np.float32).copy()
        n = np.linalg.norm(emb)
        if n > 0:
            emb /= n
        return emb

    def update_label(self, db_id: int, new_label: str) -> None:
        self.conn.execute("UPDATE faces SET label = ? WHERE id = ?", (new_label, db_id))
        self.conn.commit()

    def update_labels(self, db_ids: List[int], new_label: str) -> None:
        self.conn.executemany(
            "UPDATE faces SET label = ? WHERE id = ?",
            [(new_label, i) for i in db_ids],
        )
        self.conn.commit()

    def count(self) -> int:
        return int(self.conn.execute("SELECT COUNT(*) FROM faces").fetchone()[0])
