"""ctypes bindings to the C++ runtime library (native/), with fallbacks.

The reference leans on native code for its host-side hot spots — SciPy's
C++ Hungarian solver (sort_UKF.py:8,434) among them.  This module loads
``libfire_native.so`` (built from /root/repo/native via CMake) and falls
back to SciPy/NumPy implementations when the library is absent, so the
framework works in pure-Python environments too.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.environ.get("FIRE_NATIVE_LIB", ""),
        os.path.join(here, "native", "build", "libfire_native.so"),
        os.path.join(here, "native", "libfire_native.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_native() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.fire_lap_solve.restype = ctypes.c_int
    lib.fire_lap_solve.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.fire_nms.restype = ctypes.c_int
    lib.fire_nms.argtypes = [
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB = lib
    return _LIB


def linear_sum_assignment(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rectangular LAP: returns (row_idx, col_idx) like SciPy.

    Uses the native Jonker-Volgenant solver when built; SciPy otherwise.
    """
    lib = load_native()
    if lib is None:
        from scipy.optimize import linear_sum_assignment as scipy_lap

        return scipy_lap(cost)

    c = np.ascontiguousarray(cost, np.float64)
    n, m = c.shape
    k = min(n, m)
    rows = np.empty(k, np.int32)
    cols = np.empty(k, np.int32)
    rc = lib.fire_lap_solve(
        n, m,
        c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:  # pragma: no cover - defensive
        from scipy.optimize import linear_sum_assignment as scipy_lap

        return scipy_lap(cost)
    order = np.argsort(rows)
    return rows[order], cols[order]


def host_nms(
    boxes_xyxy: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float,
    plus_one: bool = False,
    suppress_equal: bool = False,
) -> np.ndarray:
    """Greedy NMS on host → kept indices in score order.

    Native C++ when available; vectorised NumPy otherwise (still far
    faster than the reference's pure-Python O(n²) loop at
    processing/postprocess.py:235-279).
    """
    lib = load_native()
    n = boxes_xyxy.shape[0]
    if n == 0:
        return np.empty(0, np.int64)
    if lib is not None:
        b = np.ascontiguousarray(boxes_xyxy, np.float32)
        s = np.ascontiguousarray(scores, np.float32)
        keep = np.empty(n, np.int32)
        k = lib.fire_nms(
            n,
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(iou_threshold),
            int(plus_one), int(suppress_equal),
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return keep[:k].astype(np.int64)

    off = 1.0 if plus_one else 0.0
    x1, y1, x2, y2 = boxes_xyxy.T
    areas = (x2 - x1 + off) * (y2 - y1 + off)
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(n, bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order])
        yy1 = np.maximum(y1[i], y1[order])
        xx2 = np.minimum(x2[i], x2[order])
        yy2 = np.minimum(y2[i], y2[order])
        w = np.maximum(0.0, xx2 - xx1 + off)
        h = np.maximum(0.0, yy2 - yy1 + off)
        inter = w * h
        ovr = inter / (areas[i] + areas[order] - inter)
        sup = ovr >= iou_threshold if suppress_equal else ovr > iou_threshold
        suppressed[order[sup]] = True
        suppressed[i] = True
    return np.asarray(keep, np.int64)
