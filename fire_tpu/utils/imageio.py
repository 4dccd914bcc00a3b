"""Image input helpers — processing/preprocess.py:10-83 equivalents.

The reference's RetinaFace path accepts a filesystem path, a pre-loaded
BGR ndarray, a base64 data-URI, or an HTTP(S) URL (get_image at
processing/preprocess.py:10-53).  Same contract here; the URL branch is
gated on ``requests`` availability (zero-egress environments).
"""

from __future__ import annotations

import base64
import os
from pathlib import Path
from typing import Union

import cv2
import numpy as np


def load_base64_image(uri: str) -> np.ndarray:
    """data:image/...;base64 → BGR ndarray (preprocess.py:56-68)."""
    encoded = uri.split(",")[1]
    arr = np.frombuffer(base64.b64decode(encoded), np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


def load_image_from_web(url: str) -> np.ndarray:
    """HTTP(S) URL → BGR ndarray (preprocess.py:71-83)."""
    import requests  # optional dependency; gated

    response = requests.get(url, stream=True, timeout=60)
    response.raise_for_status()
    arr = np.asarray(bytearray(response.raw.read()), np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR)


def get_image(img_uri: Union[str, Path, np.ndarray]) -> np.ndarray:
    """Load an image from any of the reference-supported sources."""
    if isinstance(img_uri, np.ndarray):
        img = img_uri.copy()
    elif isinstance(img_uri, str) and img_uri.startswith("data:image/"):
        img = load_base64_image(img_uri)
    elif isinstance(img_uri, str) and img_uri.startswith("http"):
        img = load_image_from_web(img_uri)
    elif isinstance(img_uri, (str, Path)):
        path = str(img_uri)
        if not os.path.isfile(path):
            raise ValueError(f"No image file found at {path!r}.")
        img = cv2.imread(path)
    else:
        raise ValueError(
            f"Unsupported image source {type(img_uri).__name__!r}: pass a "
            "file path, a loaded BGR ndarray, a base64 data-URI, or an "
            "HTTP(S) URL."
        )
    if img is None or len(img.shape) != 3 or np.prod(img.shape) == 0:
        raise ValueError("Decoded image must be non-empty with 3 channels (BGR).")
    return img
