"""Golden tests for fire_tpu.ops.image against OpenCV host behaviour."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from fire_tpu.ops import image as fimg


def test_bgr_rgb_roundtrip(rng):
    x = rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)
    out = np.asarray(fimg.bgr_to_rgb(jnp.asarray(x)))
    np.testing.assert_array_equal(out, x[..., ::-1])
    np.testing.assert_array_equal(np.asarray(fimg.rgb_to_bgr(jnp.asarray(out))), x)


def test_normalize01(rng):
    x = rng.integers(0, 255, (5, 5, 3)).astype(np.uint8)
    out = np.asarray(fimg.normalize_01(jnp.asarray(x)))
    np.testing.assert_allclose(out, x.astype(np.float32) / 255.0, rtol=1e-6)


def test_resize_bilinear_matches_cv2(rng):
    x = rng.random((37, 53, 3)).astype(np.float32)
    ours = np.asarray(fimg.resize_bilinear(jnp.asarray(x), (160, 160)))
    ref = cv2.resize(x, (160, 160), interpolation=cv2.INTER_LINEAR)
    # identical half-pixel-centre convention → tight tolerance
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_resize_area_close_to_cv2_downscale(rng):
    x = rng.random((320, 320, 3)).astype(np.float32)
    ours = np.asarray(fimg.resize_area(jnp.asarray(x), (160, 160)))
    ref = cv2.resize(x, (160, 160), interpolation=cv2.INTER_AREA)
    # integer 2x downscale: exact box average == INTER_AREA
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # non-integer ratio falls back to antialiased linear: sane approximation
    y = x[:300, :300]
    ours2 = np.asarray(fimg.resize_area(jnp.asarray(y), (160, 160)))
    ref2 = cv2.resize(y, (160, 160), interpolation=cv2.INTER_AREA)
    assert np.abs(ours2 - ref2).mean() < 0.05


def test_letterbox_shapes_and_scale(rng):
    x = rng.random((720, 1280, 3)).astype(np.float32)
    canvas, scale = fimg.letterbox(jnp.asarray(x), (640, 640))
    assert canvas.shape == (640, 640, 3)
    assert abs(float(scale) - 0.5) < 1e-6
    # content occupies top 360 rows; padding below is zero
    assert float(jnp.abs(canvas[360:]).max()) == 0.0


def test_crop_and_resize_matches_cv2(rng):
    x = rng.random((240, 320, 3)).astype(np.float32)
    boxes = np.array([[40, 30, 100, 80], [0, 0, 320, 240]], np.float32)
    out = np.asarray(fimg.crop_and_resize(jnp.asarray(x), jnp.asarray(boxes), (160, 160)))
    for i, (bx, by, bw, bh) in enumerate(boxes.astype(int)):
        crop = x[by : by + bh, bx : bx + bw]
        ref = cv2.resize(crop, (160, 160), interpolation=cv2.INTER_LINEAR)
        np.testing.assert_allclose(out[i], ref, atol=5e-3)


def test_crop_and_resize_degenerate_box_is_finite(rng):
    x = rng.random((50, 50, 3)).astype(np.float32)
    boxes = np.array([[10, 10, 0, 0]], np.float32)
    out = np.asarray(fimg.crop_and_resize(jnp.asarray(x), jnp.asarray(boxes), (8, 8)))
    assert np.isfinite(out).all()


def test_crop_and_resize_mm_matches_gather(rng):
    from fire_tpu.ops.image import crop_and_resize_mm

    x = rng.random((240, 320, 3)).astype(np.float32)
    boxes = np.array([[40, 30, 100, 80], [0, 0, 320, 240], [10, 5, 31, 47]], np.float32)
    ref = np.asarray(fimg.crop_and_resize(jnp.asarray(x), jnp.asarray(boxes), (160, 160)))
    out = np.asarray(crop_and_resize_mm(jnp.asarray(x), jnp.asarray(boxes), (160, 160)))
    # bf16 weight products: ~1e-2 agreement with the f32 gather kernel
    assert np.abs(out - ref).max() < 3e-2
    assert np.abs(out - ref).mean() < 5e-3


def test_crop_and_resize_rows_matches_gather(rng):
    """Row-gather + column-matmul kernel agrees with the f32 gather kernel."""
    from fire_tpu.ops.image import crop_and_resize_rows

    x = rng.random((240, 320, 3)).astype(np.float32)
    boxes = np.array([[40, 30, 100, 80], [0, 0, 320, 240], [10, 5, 31, 47]], np.float32)
    ref = np.asarray(fimg.crop_and_resize(jnp.asarray(x), jnp.asarray(boxes), (160, 160)))
    out = np.asarray(crop_and_resize_rows(jnp.asarray(x), jnp.asarray(boxes), (160, 160)))
    # only the column interpolation runs in bf16 → same tolerance as mm
    assert np.abs(out - ref).max() < 3e-2
    assert np.abs(out - ref).mean() < 5e-3


def test_crop_selected_rows_matches_per_frame(rng):
    """Cross-frame compacted crop == per-frame crop of the selected boxes."""
    from fire_tpu.ops.image import crop_selected_rows

    frames = rng.integers(0, 255, (4, 96, 128, 3)).astype(np.uint8)
    boxes = np.array(
        [[10, 8, 40, 30], [0, 0, 128, 96], [60, 50, 31, 29], [5, 5, 12, 18]],
        np.float32,
    )
    frame_idx = np.array([2, 0, 3, 2], np.int32)
    out = np.asarray(
        crop_selected_rows(
            jnp.asarray(frames), jnp.asarray(frame_idx), jnp.asarray(boxes), (64, 64)
        )
    )
    for i in range(len(boxes)):
        ref = np.asarray(
            fimg.crop_and_resize(
                jnp.asarray(frames[frame_idx[i]].astype(np.float32)),
                jnp.asarray(boxes[i : i + 1]),
                (64, 64),
            )
        )[0]
        # bf16 column weights on a 0..255 range
        assert np.abs(out[i] - ref).max() < 255 * 3e-2, i
        assert np.abs(out[i] - ref).mean() < 255 * 5e-3
