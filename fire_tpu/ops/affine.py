"""Batched 3-point affine face alignment (device-side).

TPU-native replacement for the reference's host-side
``cv2.getAffineTransform`` + ``cv2.warpAffine(image, M, (160,160))``
alignment (yunet_face_detector.py:136-159, retinaface_face_detector.py
:298-320, mediapipe_face_detector.py:155-176): solve the 2×3 affine
mapping (left_eye, right_eye, nose) → canonical template, then inverse-
warp the frame with a bilinear gather.  Everything is vmapped over the
faces of a frame so alignment costs one fused gather per batch instead
of one OpenCV call per face.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from fire_tpu.config import ALIGN_TEMPLATE_160


def affine_from_3pts(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Solve M (2×3) with M @ [src_i, 1] = dst_i  (cv2.getAffineTransform).

    ``src``/``dst``: (3, 2) point arrays. Batch with vmap.
    """
    ones = jnp.ones((3, 1), src.dtype)
    s = jnp.concatenate([src, ones], axis=1)  # (3,3)
    # Solve s @ a = dst for a (3,2); M = a.T (2,3)
    a = jnp.linalg.solve(s, dst)
    return a.T


def invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2×3 affine [A|b] → [A⁻¹ | -A⁻¹ b]."""
    a = m[:, :2]
    b = m[:, 2]
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv_a = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]], m.dtype) / det
    inv_b = -inv_a @ b
    return jnp.concatenate([inv_a, inv_b[:, None]], axis=1)


def _warp_one(image: jnp.ndarray, m: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """warpAffine with forward M (src→dst): sample src at M⁻¹·dst grid.

    Border: constant 0 (cv2 default).  image: (H,W,C) float.
    """
    oh, ow = out_hw
    h, w = image.shape[0], image.shape[1]
    minv = invert_affine(m.astype(jnp.float32))
    dx = jnp.arange(ow, dtype=jnp.float32)
    dy = jnp.arange(oh, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(dx, dy)  # (oh, ow)
    sx = minv[0, 0] * gx + minv[0, 1] * gy + minv[0, 2]
    sy = minv[1, 0] * gx + minv[1, 1] * gy + minv[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = image[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


@partial(jax.jit, static_argnames=("out_hw",))
def warp_affine(image: jnp.ndarray, m: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Single-image forward-affine warp (see :func:`_warp_one`)."""
    return _warp_one(image.astype(jnp.float32), m, out_hw)


@partial(jax.jit, static_argnames=("out_hw",))
def align_faces_160(
    image: jnp.ndarray,
    landmarks3: jnp.ndarray,
    out_hw: Tuple[int, int] = (160, 160),
) -> jnp.ndarray:
    """Align every face of a frame to the canonical 160×160 template.

    Args:
      image: (H, W, C) float frame.
      landmarks3: (N, 3, 2) per-face (left_eye, right_eye, nose) pixel
        coords — the same three points and template as the reference
        extractors (yunet_face_detector.py:142-148).
    Returns:
      (N, 160, 160, C) aligned crops.
    """
    template = jnp.asarray(ALIGN_TEMPLATE_160, jnp.float32)
    img = image.astype(jnp.float32)

    def one(pts):
        m = affine_from_3pts(pts.astype(jnp.float32), template)
        return _warp_one(img, m, out_hw)

    return jax.vmap(one)(landmarks3)
