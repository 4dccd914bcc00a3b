"""Stage timing that understands async device dispatch.

The reference accumulates wall-clock deltas around detect/encode
(face_recognition.py:165-168,380-383,428-431) — fine for synchronous
ONNXRuntime calls.  JAX dispatch is asynchronous, so a naive timer
under-reports device stages; this timer fences with
``jax.block_until_ready`` when handed device values, and doubles as the
per-stage accumulator behind both report formats (the image-mode table
at face_recognition.py:694-698 and the end-of-run FPS summary at
face_recognition.py:865-876).
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager
from typing import Dict, Optional

import jax

log = logging.getLogger(__name__)


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.frame_count = 0
        self.start_time: Optional[float] = None

    def start(self) -> None:
        if self.start_time is None:
            self.start_time = time.time()

    @contextmanager
    def stage(self, name: str, fence=None):
        t0 = time.time()
        try:
            yield
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] = self.totals.get(name, 0.0) + seconds

    def tick_frame(self) -> None:
        self.frame_count += 1

    # -- reports -----------------------------------------------------------

    def print_image_report(self) -> None:
        """Image-mode stage table (face_recognition.py:694-698 format)."""
        print("\n--- Image Processing Timings ---")
        for step, duration in self.totals.items():
            print(f"{step}: {duration:.4f} seconds")
        print(f"Total Processing Time: {sum(self.totals.values()):.4f} seconds\n")

    def log_stream_report(self) -> None:
        """End-of-run FPS + per-stage ms/frame (face_recognition.py:865-876)."""
        if self.frame_count == 0 or self.start_time is None:
            return
        elapsed = time.time() - self.start_time
        fps = self.frame_count / elapsed if elapsed > 0 else 0.0
        log.info("Total frames processed: %d", self.frame_count)
        log.info("Total processing time: %.2f seconds", elapsed)
        log.info("Average FPS: %.2f", fps)
        # reference prints detection/encoding (face_recognition.py:870-876);
        # the batched pipeline reports its fused device step the same way
        ordered = [n for n in ("detection", "encoding") if n in self.totals]
        ordered += [n for n in self.totals if n not in ("detection", "encoding")]
        for name in ordered:
            log.info(
                "Average %s Time: %.2f ms/frame",
                name.capitalize(),
                self.totals[name] / self.frame_count * 1000.0,
            )
