"""Device mesh construction.

Axes convention used across the framework:

* ``dp`` — data parallel: frames / training batch / gallery rows.
* ``mp`` — model parallel: classifier classes, wide dense shards.

On real hardware the mesh should map ``dp`` onto the torus so its
collectives ride ICI; in tests an 8-device virtual CPU mesh substitutes
(tests/conftest.py, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("dp", "mp"),
    devices=None,
) -> Mesh:
    """Build a 2-D (dp, mp) mesh over the available devices.

    ``shape=None`` puts every device on ``dp`` (mp=1) — the right
    default for inference scale-out (replicated weights, sharded
    gallery/frames).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))
