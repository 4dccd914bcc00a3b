"""At-rest encryption, format-compatible with the reference.

Same scheme as modules/encryption.py: PBKDF2-HMAC-SHA256 with 610,000
iterations deriving a 32-byte key (modules/encryption.py:17-19), a
fresh 16-byte random salt per encryption prepended to the ciphertext
(`salt(16) ‖ Fernet token`, modules/encryption.py:30-35), and Fernet
(AES-128-CBC + HMAC-SHA256) for the payload.  Files written by the
reference decrypt here and vice versa.

Note: the reference README claims "AES-256" but the implementation is
Fernet/AES-128 (SURVEY.md §2.1); we match the implementation, which is
what on-disk compatibility requires.

Crypto is I/O-plane, not compute-plane — it stays on host
(`cryptography` package); there is no TPU role (SURVEY.md §2.3).
"""

from __future__ import annotations

import base64
import logging
import os

from cryptography.fernet import Fernet
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.kdf.pbkdf2 import PBKDF2HMAC

log = logging.getLogger(__name__)

PBKDF2_ITERATIONS = 610_000
KEY_LENGTH = 32
SALT_BYTES = 16


class Encryptor:
    """Password-based file/bytes encryption (reference format)."""

    def __init__(self, password: str):
        self._password = password.encode()

    def _key(self, salt: bytes) -> bytes:
        kdf = PBKDF2HMAC(
            algorithm=hashes.SHA256(),
            length=KEY_LENGTH,
            salt=salt,
            iterations=PBKDF2_ITERATIONS,
        )
        return base64.urlsafe_b64encode(kdf.derive(self._password))

    def encrypt_data(self, data: bytes) -> bytes:
        salt = os.urandom(SALT_BYTES)
        token = Fernet(self._key(salt)).encrypt(data)
        return salt + token

    def decrypt_data(self, blob: bytes) -> bytes:
        salt, token = blob[:SALT_BYTES], blob[SALT_BYTES:]
        return Fernet(self._key(salt)).decrypt(token)

    def encrypt_and_write(self, path: str, data: bytes) -> None:
        with open(path, "wb") as f:
            f.write(self.encrypt_data(data))
        log.info("Encrypted and saved data to %s.", path)

    def read_and_decrypt(self, path: str) -> bytes:
        with open(path, "rb") as f:
            blob = f.read()
        data = self.decrypt_data(blob)
        log.info("Decrypted and loaded data from %s.", path)
        return data
