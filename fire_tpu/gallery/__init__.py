"""Identity gallery: host persistence (SQLite + Fernet) and the
HBM-resident exact cosine top-k device index that replaces hnswlib."""

from fire_tpu.gallery.crypto import Encryptor  # noqa: F401
from fire_tpu.gallery.store import FaceStore  # noqa: F401
from fire_tpu.gallery.index import DeviceGallery  # noqa: F401
