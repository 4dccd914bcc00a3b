"""Host-side frame annotation (drawing stays on CPU; SURVEY.md §2.3).

Matches the reference's output style: green rectangle + label text above
the box (face_recognition.py:665-674 for images, :782-793 for streams).
"""

from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np

GREEN = (0, 255, 0)


def annotate_faces(
    frame: np.ndarray, faces: List[dict], with_confidence: bool = False
) -> np.ndarray:
    out = frame.copy()
    for face in faces:
        x, y, w, h = [int(v) for v in face["bbox"]]
        cv2.rectangle(out, (x, y), (x + w, y + h), GREEN, 2)
        if with_confidence and "confidence" in face:
            text = f"{face['label']} ({face['confidence']:.2f})"
        else:
            text = f"{face['label']}"
        cv2.putText(out, text, (x, y - 10), cv2.FONT_HERSHEY_SIMPLEX, 0.5, GREEN, 2)
    return out


RED = (0, 0, 255)


def visualize_detections(
    image: np.ndarray,
    faces,
    box_color=GREEN,
    landmark_color=RED,
) -> np.ndarray:
    """Draw raw detections (bbox + landmarks + confidence) — the
    ``visualize()`` helper every reference backend exposes
    (yunet_face_detector.py:60-87, retinaface_face_detector.py:225-254,
    mediapipe_face_detector.py:78-107)."""
    out = image.copy()
    for face in faces:
        x, y, w, h = [int(v) for v in face["bbox"]]
        cv2.rectangle(out, (x, y), (x + w, y + h), box_color, 2)
        lms = face.get("landmarks")
        if lms is not None:
            pts = lms.values() if isinstance(lms, dict) else lms
            for p in pts:
                cv2.circle(out, (int(p[0]), int(p[1])), 2, landmark_color, 2)
        if "confidence" in face:
            cv2.putText(out, f"{face['confidence']:.4f}", (x, y - 10),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, RED, 1)
    return out


def resize_frame_to_screen(
    frame: np.ndarray, screen_wh: Optional[tuple] = None
) -> np.ndarray:
    """Aspect-preserving fit to the display (face_recognition.py:703-737;
    screeninfo is replaced by an explicit/default 1920×1080)."""
    sw, sh = screen_wh or (1920, 1080)
    h, w = frame.shape[:2]
    if h == 0 or w == 0:
        return frame
    fa, sa = w / h, sw / sh
    if fa > sa:
        nw, nh = sw, int(sw / fa)
    else:
        nh, nw = sh, int(sh * fa)
    if nw <= 0 or nh <= 0:
        return frame
    return cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_AREA)
