"""Golden tests: affine alignment vs cv2.getAffineTransform/warpAffine."""

import cv2
import numpy as np
import jax.numpy as jnp

from fire_tpu.config import ALIGN_TEMPLATE_160
from fire_tpu.ops import affine as faff


def test_affine_from_3pts_matches_cv2(rng):
    src = rng.random((3, 2)).astype(np.float32) * 100
    dst = rng.random((3, 2)).astype(np.float32) * 160
    ours = np.asarray(faff.affine_from_3pts(jnp.asarray(src), jnp.asarray(dst)))
    ref = cv2.getAffineTransform(src, dst)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_invert_affine(rng):
    m = np.array([[1.2, 0.3, 10.0], [-0.2, 0.9, -5.0]], np.float32)
    inv = np.asarray(faff.invert_affine(jnp.asarray(m)))
    a = np.vstack([m, [0, 0, 1]])
    ainv = np.vstack([inv, [0, 0, 1]])
    np.testing.assert_allclose(a @ ainv, np.eye(3), atol=1e-5)


def test_warp_affine_matches_cv2(rng):
    img = rng.random((120, 140, 3)).astype(np.float32)
    src = np.float32([[30, 40], [90, 38], [60, 80]])
    dst = np.float32(ALIGN_TEMPLATE_160)
    m = cv2.getAffineTransform(src, dst)
    ref = cv2.warpAffine(img, m, (160, 160))
    ours = np.asarray(faff.warp_affine(jnp.asarray(img), jnp.asarray(m, dtype=np.float32), (160, 160)))
    # interiors match bilinearly; borders differ by <1px rounding
    diff = np.abs(ours - ref)
    assert np.quantile(diff, 0.99) < 2e-2
    assert diff.mean() < 5e-3


def test_align_faces_160_batch(rng):
    img = rng.random((200, 200, 3)).astype(np.float32)
    lms = np.stack(
        [
            np.float32([[60, 70], [120, 72], [90, 110]]),
            np.float32([[40, 50], [100, 50], [70, 90]]),
        ]
    )
    out = np.asarray(faff.align_faces_160(jnp.asarray(img), jnp.asarray(lms)))
    assert out.shape == (2, 160, 160, 3)
    for i in range(2):
        m = cv2.getAffineTransform(lms[i], np.float32(ALIGN_TEMPLATE_160))
        ref = cv2.warpAffine(img, m, (160, 160))
        assert np.abs(out[i] - ref).mean() < 5e-3
