"""Detector model structural tests + decode pipeline behaviour."""

import jax
import jax.numpy as jnp
import numpy as np

from fire_tpu.models.blazeface import BlazeFace, blaze_anchors, decode_blazeface
from fire_tpu.models.retinaface import RetinaFace, decode_retinaface
from fire_tpu.models.yunet import YuNet, decode_yunet


def test_yunet_head_shapes():
    model = YuNet(width=8, dtype=jnp.float32)
    x = jnp.zeros((1, 160, 160, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert set(out) == {8, 16, 32}
    for stride, (cls, obj, box, kps) in out.items():
        h = 160 // stride
        assert cls.shape == (1, h, h, 1)
        assert obj.shape == (1, h, h, 1)
        assert box.shape == (1, h, h, 4)
        assert kps.shape == (1, h, h, 10)
        s = np.asarray(cls)
        assert (s >= 0).all() and (s <= 1).all()


def test_decode_yunet_planted_face():
    """Craft head outputs with one confident face; decode must recover it."""
    out = {}
    for stride in (8, 16, 32):
        h = 160 // stride
        cls = np.zeros((1, h, h, 1), np.float32)
        obj = np.zeros((1, h, h, 1), np.float32)
        box = np.zeros((1, h, h, 4), np.float32)
        kps = np.zeros((1, h, h, 10), np.float32)
        out[stride] = tuple(jnp.asarray(a) for a in (cls, obj, box, kps))
    # plant at stride 16, cell (3, 4): centre (4*16, 3*16)=(64,48), w=h=32
    cls = np.zeros((1, 10, 10, 1), np.float32)
    obj = np.zeros((1, 10, 10, 1), np.float32)
    box = np.zeros((1, 10, 10, 4), np.float32)
    kps = np.zeros((1, 10, 10, 10), np.float32)
    cls[0, 3, 4, 0] = 0.98
    obj[0, 3, 4, 0] = 0.98
    box[0, 3, 4, 2:] = np.log(2.0)
    out[16] = tuple(jnp.asarray(a) for a in (cls, obj, box, kps))

    dets = decode_yunet(out, scale=jnp.asarray(1.0), conf_threshold=0.9, max_faces=8)
    mask = np.asarray(dets.mask)
    assert mask.sum() == 1
    b = np.asarray(dets.boxes_xywh)[0]
    np.testing.assert_allclose(b, [64 - 16, 48 - 16, 32, 32], atol=1e-4)
    assert abs(float(dets.scores[0]) - 0.98) < 1e-5


def test_blazeface_shapes_and_decode():
    model = BlazeFace(dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    scores, regs = model.apply(variables, x)
    assert scores.shape == (1, 896)
    assert regs.shape == (1, 896, 16)
    assert blaze_anchors().shape == (896, 2)

    # plant a detection at anchor 100
    s = np.full((1, 896), -10.0, np.float32)
    s[0, 100] = 10.0
    r = np.zeros((1, 896, 16), np.float32)
    r[0, 100, 2:4] = 32.0  # w = h = 32/128 = 0.25 relative
    # scale=0.2 is the engine's letterbox factor for a 480×640 source at
    # the 128 input; decode divides the canvas-pixel boxes by it
    # (MediaPipe's letterbox-removal semantics)
    dets = decode_blazeface(jnp.asarray(s), jnp.asarray(r), 0.2, conf_threshold=0.5)
    mask = np.asarray(dets.mask)
    assert mask.sum() == 1
    ax, ay = blaze_anchors()[100]
    b = np.asarray(dets.boxes_xywh)[0]
    np.testing.assert_allclose(
        b, [(ax * 128 - 16) / 0.2, (ay * 128 - 16) / 0.2, 160.0, 160.0], atol=1e-3
    )
    assert dets.landmarks.shape == (32, 5, 2)


def test_retinaface_tiny_forward_and_decode():
    model = RetinaFace(stage_sizes=(1, 1, 1, 1), width=8, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert set(out) == {8, 16, 32}
    for stride, (prob, bbox, lmk) in out.items():
        h = 128 // stride
        assert prob.shape == (1, h, h, 2)
        assert bbox.shape == (1, h, h, 8)
        assert lmk.shape == (1, h, h, 20)
        p = np.asarray(prob)
        assert (p >= 0).all() and (p <= 1).all()

    dets = decode_retinaface(out, (128, 128), jnp.asarray(1.0), threshold=0.9, max_faces=16)
    assert dets.boxes_xywh.shape == (16, 4)
    assert dets.landmarks.shape == (16, 5, 2)
    # untrained net ≈ 0.5 probs < 0.9 threshold → nothing detected
    assert np.asarray(dets.mask).sum() == 0


def test_detections_landmarks3_ordering():
    from fire_tpu.models.detections import Detections

    lms = jnp.asarray(np.arange(10, dtype=np.float32).reshape(1, 5, 2))
    d = Detections(jnp.zeros((1, 4)), lms, jnp.ones((1,)), jnp.ones((1,), bool))
    l3 = np.asarray(d.landmarks3)[0]
    # (left_eye, right_eye, nose) = rows (1, 0, 2) of the 5-point array
    np.testing.assert_array_equal(l3[0], [2, 3])
    np.testing.assert_array_equal(l3[1], [0, 1])
    np.testing.assert_array_equal(l3[2], [4, 5])
