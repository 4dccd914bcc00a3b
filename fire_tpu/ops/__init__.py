"""Device-side kernels: image resampling, alignment, boxes/NMS, top-k.

Everything here is shape-static, jit-safe, and batched — these are the
building blocks the models and the pipeline compose into single fused
XLA graphs.
"""

from fire_tpu.ops.image import (  # noqa: F401
    bgr_to_rgb,
    rgb_to_bgr,
    normalize_01,
    resize_bilinear,
    letterbox,
    crop_and_resize,
)
from fire_tpu.ops.affine import (  # noqa: F401
    affine_from_3pts,
    invert_affine,
    warp_affine,
    align_faces_160,
)
from fire_tpu.ops.boxes import (  # noqa: F401
    xywh_to_xyxy,
    xyxy_to_xywh,
    iou_matrix,
    nms,
)
from fire_tpu.ops.gallery_match import cosine_topk  # noqa: F401
