"""Training data pipeline: identity-folder datasets → device batches.

The reference has no training (SURVEY.md §2.4); this loader feeds the
ArcFace trainer from the standard face-recognition layout
``root/<identity>/*.jpg`` (CASIA-style).  Decode runs on host threads
(like the video prefetcher) and batches are uint8 — normalization
happens on device inside the train step's input pipeline.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator, List, Tuple

import numpy as np


class IdentityFolderDataset:
    """Indexes ``root/<identity>/<image>`` into (path, class_id) pairs."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, root: str):
        self.root = root
        self.classes: List[str] = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.samples: List[Tuple[str, int]] = []
        for cid, name in enumerate(self.classes):
            d = os.path.join(root, name)
            for f in sorted(os.listdir(d)):
                if f.lower().endswith(self.EXTS):
                    self.samples.append((os.path.join(d, f), cid))
        if not self.samples:
            raise ValueError(f"no images found under {root}")

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def __len__(self) -> int:
        return len(self.samples)


def _load(path: str, image_hw) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    img = cv2.resize(img, (image_hw[1], image_hw[0]), interpolation=cv2.INTER_AREA)
    return img[..., ::-1]  # BGR → RGB (FaceNet input contract)


def batches(
    ds: IdentityFolderDataset,
    batch_size: int,
    image_hw=(160, 160),
    seed: int = 0,
    epochs: int = 1,
    prefetch: int = 4,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Shuffled (images uint8 RGB (B,H,W,3), labels int32 (B,)) batches,
    decoded on a background thread."""
    rng = np.random.default_rng(seed)
    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    stop = object()

    def worker():
        for _ in range(epochs):
            order = rng.permutation(len(ds.samples))
            for i in range(0, len(order) - batch_size + 1, batch_size):
                idx = order[i : i + batch_size]
                imgs = np.stack([_load(ds.samples[j][0], image_hw) for j in idx])
                labels = np.asarray([ds.samples[j][1] for j in idx], np.int32)
                q.put((imgs, labels))
        q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
