"""Batched image preprocessing ops (device-side).

TPU-native replacements for the OpenCV calls the reference makes on the
host per face / per frame (``cv2.resize`` at modules/encoder.py:20,
``cv2.cvtColor``/slice-reverse BGR→RGB at yunet_face_detector.py:165,
scale-resize at processing/preprocess.py:86-117).  All ops are
shape-static and batchable so the whole preprocess fuses into the
detector/encoder jit graphs instead of round-tripping to the host.

Convention: images are float32/bfloat16 or uint8 arrays in HWC / NHWC
layout; boxes are pixel-space ``[x, y, w, h]`` unless noted.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def bgr_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    """Channel-reverse on the last axis (works for any leading dims)."""
    return x[..., ::-1]


rgb_to_bgr = bgr_to_rgb  # involution


def normalize_01(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] → dtype [0,1] (modules/encoder.py:21)."""
    return x.astype(dtype) / jnp.asarray(255.0, dtype)


def resize_bilinear(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Half-pixel-centre bilinear resize (cv2.INTER_LINEAR semantics).

    ``image``: (..., H, W, C).  Uses jax.image.resize which XLA lowers to
    a dense (MXU-friendly) resampling for static shapes.
    """
    *lead, h, w, c = image.shape
    shape = (*lead, out_hw[0], out_hw[1], c)
    return jax.image.resize(image, shape, method="linear", antialias=False)


def resize_area(image: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_AREA-style downscale (modules/encoder.py:20).

    Integer down-scale factors use an exact box average (bit-identical
    to INTER_AREA); other ratios fall back to antialiased linear
    resampling, the closest XLA-native approximation.
    """
    *lead, h, w, c = image.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0 and h >= oh and w >= ow:
        fy, fx = h // oh, w // ow
        x = image.reshape(*lead, oh, fy, ow, fx, c)
        return x.mean(axis=(-4, -2))
    shape = (*lead, oh, ow, c)
    return jax.image.resize(image, shape, method="linear", antialias=True)


def letterbox(
    image: jnp.ndarray, out_hw: Tuple[int, int], pad_value: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aspect-preserving resize + bottom/right pad to ``out_hw``.

    Returns ``(canvas, scale)`` where ``boxes_in_canvas / scale`` maps
    detections back to source-image pixels.  Static for a given input
    shape, so it lives inside the detector jit.
    """
    h, w = image.shape[-3], image.shape[-2]
    oh, ow = out_hw
    scale = min(oh / h, ow / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = resize_bilinear(image, (nh, nw))
    pad_h, pad_w = oh - nh, ow - nw
    pad_cfg = [(0, 0)] * (image.ndim - 3) + [(0, pad_h), (0, pad_w), (0, 0)]
    canvas = jnp.pad(resized, pad_cfg, constant_values=pad_value)
    return canvas, jnp.asarray(scale, jnp.float32)


def _bilinear_gather(image: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample ``image`` (H,W,C) at float coords ``ys`` (Oh,) × ``xs`` (Ow,).

    Border handling: clamp (replicate edge).  Returns (Oh,Ow,C).
    """
    h, w = image.shape[0], image.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    ya = y0i[:, None]
    yb = y1i[:, None]
    xa = x0i[None, :]
    xb = x1i[None, :]
    v00 = image[ya, xa]
    v01 = image[ya, xb]
    v10 = image[yb, xa]
    v11 = image[yb, xb]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


@partial(jax.jit, static_argnames=("out_hw",))
def crop_and_resize_mm(
    image: jnp.ndarray,
    boxes_xywh: jnp.ndarray,
    out_hw: Tuple[int, int] = (160, 160),
) -> jnp.ndarray:
    """Batched crop + bilinear resize as two MXU matmuls (no gathers).

    Bilinear sampling at positions ``ys``/``xs`` equals multiplying by
    interpolation matrices ``Wy[i, j] = relu(1 − |ys_i − j|)`` (rows sum
    to 1): ``out = Wy · image · Wxᵀ``.  Gathers serialize on the TPU's
    VPU (~2 ms/crop from a 1080p frame); the matmul form runs on the
    MXU at >50× that speed and is what the batched pipeline uses.
    Numerics match :func:`crop_and_resize` to ~1e-2 (bf16 weight
    products, f32 accumulation).

    Args/returns as :func:`crop_and_resize`.
    """
    oh, ow = out_hw
    h, w = image.shape[0], image.shape[1]
    img = image.astype(jnp.bfloat16)
    jy = jnp.arange(h, dtype=jnp.float32)
    jx = jnp.arange(w, dtype=jnp.float32)

    def weights(box):
        x, y, bw, bh = box[0], box[1], jnp.maximum(box[2], 1.0), jnp.maximum(box[3], 1.0)
        ys = y + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * bh / oh - 0.5
        xs = x + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * bw / ow - 0.5
        ys = jnp.clip(ys, y, y + bh - 1.0)
        xs = jnp.clip(xs, x, x + bw - 1.0)
        # clamp into the image so border behaviour matches the gather kernel
        ys = jnp.clip(ys, 0.0, h - 1.0)
        xs = jnp.clip(xs, 0.0, w - 1.0)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[:, None] - jy[None, :]))  # (oh, H)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - jx[None, :]))  # (ow, W)
        return wy, wx

    wy, wx = jax.vmap(weights)(boxes_xywh.astype(jnp.float32))  # (K,oh,H), (K,ow,W)
    # All K crops' row interpolations ride ONE matmul against the image:
    # as K separate (oh,H)·(H,W·C) products the image is re-read from
    # HBM per crop (12.7 GB/step at B=128, K=8, 1080p — measured 22 ms);
    # contracted as (K·oh, H)·(H, W·C) the MXU amortizes the image read
    # across all crops.
    tmp = jnp.einsum(
        "kyh,hwc->kywc", wy.astype(jnp.bfloat16), img,
        preferred_element_type=jnp.float32,
    )
    return jnp.einsum(
        "kxw,kywc->kyxc", wx.astype(jnp.bfloat16), tmp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _crop_coords(box, out_hw, img_hw):
    """Half-pixel-centre sample coordinates for one crop (shared by the
    matmul and row-gather kernels; clamps match :func:`crop_and_resize`)."""
    oh, ow = out_hw
    h, w = img_hw
    x, y, bw, bh = box[0], box[1], jnp.maximum(box[2], 1.0), jnp.maximum(box[3], 1.0)
    ys = y + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * bh / oh - 0.5
    xs = x + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * bw / ow - 0.5
    ys = jnp.clip(jnp.clip(ys, y, y + bh - 1.0), 0.0, h - 1.0)
    xs = jnp.clip(jnp.clip(xs, x, x + bw - 1.0), 0.0, w - 1.0)
    return ys, xs


def _rows_then_cols(rows_src, ys, xs, w):
    """Finish a crop given gathered source rows.

    ``rows_src``: (..., oh, 2, W, C) — the two bracketing image rows per
    output row.  Row interpolation is a 2-point lerp (exactly the two
    nonzero entries of the dense (oh, H) interpolation matrix); column
    interpolation stays a dense MXU matmul over W.
    """
    wy = (ys - jnp.floor(ys))[..., None, None].astype(jnp.bfloat16)
    r16 = rows_src.astype(jnp.bfloat16)
    # bf16 lerp: the full-width row intermediate is the kernel's largest
    # temp — keeping it bf16 (not f32) halves it, and at u8 source range
    # the 2^-9 relative error is ~0.5/255 intensity, below the kernel's
    # stated tolerance
    rows = r16[..., 0, :, :] * (1.0 - wy) + r16[..., 1, :, :] * wy
    jx = jnp.arange(w, dtype=jnp.float32)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[..., None] - jx))  # (..., ow, W)
    return jnp.einsum(
        "...xw,...ywc->...yxc",
        wx.astype(jnp.bfloat16),
        rows,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("out_hw",))
def crop_and_resize_rows(
    image: jnp.ndarray,
    boxes_xywh: jnp.ndarray,
    out_hw: Tuple[int, int] = (160, 160),
) -> jnp.ndarray:
    """Crop + resize via row gather + one column matmul.

    The dense form (:func:`crop_and_resize_mm`) multiplies by an
    (oh, H) interpolation matrix with only 2 nonzeros per row — at
    1080p that is ~540× wasted MXU FLOPs.  Here the two bracketing
    rows per output row are fetched with a contiguous row gather
    ((W, C) slices — unlike the pointwise 2D gather of
    :func:`crop_and_resize`, which serializes on the VPU) and lerped;
    only the column interpolation runs as a dense matmul.
    FLOPs/crop at 1080p→160²: 0.28 GF vs 2.0 GF dense.

    Args/returns as :func:`crop_and_resize`.
    """
    h, w = image.shape[0], image.shape[1]
    ys, xs = jax.vmap(lambda b: _crop_coords(b, out_hw, (h, w)))(
        boxes_xywh.astype(jnp.float32)
    )  # (K, oh), (K, ow)
    y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y01 = jnp.stack([y0i, jnp.clip(y0i + 1, 0, h - 1)], axis=-1)  # (K, oh, 2)
    rows_src = image[y01]  # (K, oh, 2, W, C)
    return _rows_then_cols(rows_src, ys, xs, w)


@partial(jax.jit, static_argnames=("out_hw", "chunk"))
def crop_selected_rows(
    frames: jnp.ndarray,
    frame_idx: jnp.ndarray,
    boxes_xywh: jnp.ndarray,
    out_hw: Tuple[int, int] = (160, 160),
    chunk: int = 64,
) -> jnp.ndarray:
    """Crop M selected boxes from a batch of frames (cross-frame compaction).

    The batched pipeline pays ``encode_k`` crop+encode slots per frame
    whether or not faces are real; compacting the selection to the
    batch's top-M detections first means the crop (and everything
    after it) runs on M inputs instead of B·K.  Gathering whole frames
    per selection would materialize (M, H, W, C); instead the frame
    batch is viewed as (B·H, W, C) and only the 2·oh bracketing rows
    of each crop are gathered (frame_idx folds into the row index).

    The gathered rows are still the dominant temp — (M, oh, 2, W, C)
    is ~7.5 GB f32 at M=1024/1080p, an HBM OOM next to the resident
    frame batch — so the selection is processed in ``chunk``-sized
    slices under ``lax.map`` (peak temp ≈ chunk·oh·2·W·C in u8 + bf16,
    ~120 MB at the default) and the row lerp runs in bf16.

    Args:
      frames: (B, H, W, C) frame batch (any dtype; uint8 is fine).
      frame_idx: (M,) int32 source frame per selected box.
      boxes_xywh: (M, 4) pixel boxes in their source frame.
    Returns:
      (M, oh, ow, C) float32 crops.
    """
    b, h, w, c = frames.shape
    m = boxes_xywh.shape[0]
    flat = frames.reshape(b * h, w, c)
    cs = min(chunk, m)
    g = -(-m // cs)
    pad = g * cs - m
    fi = jnp.pad(frame_idx.astype(jnp.int32), (0, pad))
    bx = jnp.pad(boxes_xywh.astype(jnp.float32), ((0, pad), (0, 0)))

    def one_chunk(args):
        fi_c, bx_c = args
        ys, xs = jax.vmap(lambda bb: _crop_coords(bb, out_hw, (h, w)))(bx_c)
        y0i = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
        base = (fi_c * h)[:, None]
        y01 = jnp.stack([base + y0i, base + jnp.clip(y0i + 1, 0, h - 1)], axis=-1)
        rows_src = flat[y01]  # (cs, oh, 2, W, C) source dtype
        return _rows_then_cols(rows_src, ys, xs, w)

    out = jax.lax.map(one_chunk, (fi.reshape(g, cs), bx.reshape(g, cs, 4)))
    return out.reshape(g * cs, *out_hw, c)[:m]


@partial(jax.jit, static_argnames=("out_hw",))
def crop_and_resize(
    image: jnp.ndarray,
    boxes_xywh: jnp.ndarray,
    out_hw: Tuple[int, int] = (160, 160),
) -> jnp.ndarray:
    """Batched crop + bilinear resize from one frame.

    Device-side replacement for the per-track host pattern
    ``image[y:y+h, x:x+w]`` → ``cv2.resize(..., (160,160))``
    (face_recognition.py:417 + modules/encoder.py:20).

    Args:
      image: (H, W, C) float array.
      boxes_xywh: (N, 4) float pixel boxes; degenerate boxes (w/h <= 0)
        are clamped to 1px so the gather stays in-bounds (callers mask
        those faces out downstream).
    Returns:
      (N, out_h, out_w, C) crops.
    """
    oh, ow = out_hw

    def one(box):
        x, y, w, h = box[0], box[1], jnp.maximum(box[2], 1.0), jnp.maximum(box[3], 1.0)
        # Half-pixel-centre mapping into the crop, then offset into the
        # frame; clamp to the crop interior to mimic resizing the slice.
        ys = y + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * h / oh - 0.5
        xs = x + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * w / ow - 0.5
        ys = jnp.clip(ys, y, y + h - 1.0)
        xs = jnp.clip(xs, x, x + w - 1.0)
        return _bilinear_gather(image, ys, xs)

    return jax.vmap(one)(boxes_xywh.astype(jnp.float32))
