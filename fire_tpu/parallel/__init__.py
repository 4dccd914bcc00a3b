"""Multi-chip scale-up: device meshes, the row-sharded gallery, and the
data/tensor-parallel ArcFace training step.

The reference implements zero parallelism (SURVEY.md §2.4) — this
package is the new capability that gives the rebuild its headroom:
gallery search sharded over ICI, data-parallel stream processing, and
distributed encoder training.
"""

from fire_tpu.parallel.mesh import make_mesh  # noqa: F401
from fire_tpu.parallel.sharded_gallery import sharded_cosine_topk  # noqa: F401
