"""Host video I/O with decode-ahead prefetching.

The reference reads frames synchronously inside the hot loop
(``cap.read()`` at face_recognition.py:774), serialising host decode
with inference.  Here a reader thread decodes ahead into a bounded
queue so OpenCV/ffmpeg decode overlaps device compute — the
double-buffering half of SURVEY.md §2.3's "batched, double-buffered
device pipeline".
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np

_SENTINEL = object()


class FrameSequenceCapture:
    """cv2.VideoCapture-compatible shim over in-RAM frames.

    Lets every stream path (``process_video``/``process_frames``) run on
    pre-decoded numpy frames — cameras that deliver raw buffers, test
    harnesses, and decode-excluded benchmarking.  Implements the subset
    of the VideoCapture API the pipeline touches: ``read``, ``get``,
    ``isOpened``, ``release``.
    """

    _PROPS = {"CAP_PROP_FPS": 5, "CAP_PROP_FRAME_WIDTH": 3,
              "CAP_PROP_FRAME_HEIGHT": 4}

    def __init__(self, frames, fps: float = 30.0):
        self._frames = iter(frames)
        try:
            self._first = next(self._frames)
        except StopIteration:
            self._first = None
        self._hw = self._first.shape[:2] if self._first is not None else (0, 0)
        self.fps = fps

    def isOpened(self) -> bool:  # noqa: N802 - cv2 API parity
        return self._hw != (0, 0)

    def read(self):
        if self._first is not None:
            f, self._first = self._first, None
            return True, f
        try:
            return True, next(self._frames)
        except StopIteration:
            return False, None

    def get(self, prop) -> float:
        import cv2

        if prop == cv2.CAP_PROP_FPS:
            return float(self.fps)
        if prop == cv2.CAP_PROP_FRAME_WIDTH:
            return float(self._hw[1])
        if prop == cv2.CAP_PROP_FRAME_HEIGHT:
            return float(self._hw[0])
        return 0.0

    def release(self) -> None:
        self._frames = iter(())


class PrefetchReader:
    """Background-thread frame reader over a cv2.VideoCapture."""

    def __init__(self, cap, depth: int = 8):
        self.cap = cap
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while not self._stop.is_set():
            ret, frame = self.cap.read()
            if not ret:
                break
            try:
                self.q.put(frame, timeout=0.5)
            except queue.Full:
                if self._stop.is_set():
                    break
                try:
                    self.q.put(frame)
                except Exception:
                    break
        try:
            self.q.put(_SENTINEL)
        except Exception:
            pass

    def frames(self) -> Iterator[np.ndarray]:
        while True:
            item = self.q.get()
            if item is _SENTINEL:
                return
            yield item

    def read(self) -> Optional[np.ndarray]:
        item = self.q.get()
        return None if item is _SENTINEL else item

    def close(self) -> None:
        self._stop.set()
        # drain so the producer unblocks
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
