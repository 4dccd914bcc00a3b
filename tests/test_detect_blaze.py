"""BlazeFace training-loop tests: target/decode round-trip, ignore
semantics, learning smoke, and the engine deploy contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fire_tpu.models.blazeface import (
    BlazeFace,
    blaze_anchors,
    decode_blazeface,
)
from fire_tpu.train.detect_blaze import (
    INPUT_PX,
    blaze_detection_loss,
    blaze_targets,
    make_blaze_pool_train_step,
)


def _pad(boxes, lms, f=2):
    b = np.zeros((f, 4), np.float32)
    l = np.zeros((f, 5, 2), np.float32)
    v = np.zeros((f,), bool)
    n = boxes.shape[0]
    b[:n], l[:n], v[:n] = boxes, lms, True
    return b[None], l[None], v[None]


def _gt_scene():
    boxes = np.array([[20.0, 30.0, 44.0, 52.0], [78.0, 70.0, 36.0, 40.0]],
                     np.float32)
    lms = np.stack([
        np.array([[52, 48], [32, 48], [42, 58], [50, 68], [34, 68]], np.float32),
        np.array([[106, 84], [86, 84], [96, 92], [104, 100], [88, 100]],
                 np.float32),
    ])
    return boxes, lms


def test_targets_round_trip_through_production_decode():
    """A zero-loss model (head outputs == targets) must reproduce the GT
    through decode_blazeface — the decode-inverse contract."""
    boxes, lms = _gt_scene()
    b, l, v = _pad(boxes, lms)
    cls_t, reg_t, wgt, _ = jax.tree.map(
        np.asarray, blaze_targets(jnp.asarray(b), jnp.asarray(l), jnp.asarray(v))
    )
    assert cls_t.sum() >= 2  # every face owns >= 1 anchor

    scores = jnp.asarray(np.where(cls_t > 0, 20.0, -20.0))
    dets = decode_blazeface(scores, jnp.asarray(reg_t), 1.0,
                            conf_threshold=0.8, nms_threshold=0.3)
    got = np.asarray(dets.boxes_xywh)[np.asarray(dets.mask)]
    got_lms = np.asarray(dets.landmarks)[np.asarray(dets.mask)]
    assert got.shape[0] == 2
    for gt_box, gt_lm in zip(boxes, lms):
        ious = []
        for k in range(got.shape[0]):
            gx, gy, gw, gh = got[k]
            ix = max(0.0, min(gx + gw, gt_box[0] + gt_box[2]) - max(gx, gt_box[0]))
            iy = max(0.0, min(gy + gh, gt_box[1] + gt_box[3]) - max(gy, gt_box[1]))
            inter = ix * iy
            ious.append(inter / (gw * gh + gt_box[2] * gt_box[3] - inter))
        k = int(np.argmax(ious))
        assert ious[k] > 0.99
        # eyes + nose exact; mouth corners are both the GT mouth midpoint
        np.testing.assert_allclose(got_lms[k][:3], gt_lm[:3], atol=0.5)
        mouth_mid = (gt_lm[3] + gt_lm[4]) / 2
        np.testing.assert_allclose(got_lms[k][3], mouth_mid, atol=0.5)
        np.testing.assert_allclose(got_lms[k][4], mouth_mid, atol=0.5)


def test_ignore_ring_and_background_weights():
    boxes, lms = _gt_scene()
    b, l, v = _pad(boxes, lms)
    cls_t, _, wgt, reg_mask = jax.tree.map(
        np.asarray, blaze_targets(jnp.asarray(b), jnp.asarray(l), jnp.asarray(v))
    )
    anc = blaze_anchors() * INPUT_PX
    cx, cy = boxes[0][0] + boxes[0][2] / 2, boxes[0][1] + boxes[0][3] / 2
    inbox = (np.abs(anc[:, 0] - cx) <= boxes[0][2] / 2) & (
        np.abs(anc[:, 1] - cy) <= boxes[0][3] / 2
    )
    ring = inbox & (cls_t[0] == 0)
    assert ring.any()
    assert (wgt[0][ring] == 0).all()  # in-box negatives ignored
    assert (wgt[0][cls_t[0] > 0] == 1).all()  # positives trained
    far = (np.abs(anc[:, 0] - cx) > 60) & (np.abs(anc[:, 1] - 64) > 60)
    assert (wgt[0][far] == 1).all()  # background trained
    assert reg_mask.tolist() == [1.0] * 12 + [0.0] * 4  # ears masked


def test_invalid_faces_produce_no_positives():
    b = np.zeros((1, 2, 4), np.float32)
    l = np.zeros((1, 2, 5, 2), np.float32)
    v = np.zeros((1, 2), bool)
    cls_t, reg_t, wgt, _ = jax.tree.map(
        np.asarray, blaze_targets(jnp.asarray(b), jnp.asarray(l), jnp.asarray(v))
    )
    assert cls_t.sum() == 0
    assert (reg_t == 0).all()
    assert (wgt == 1).all()


def test_blaze_short_training_reduces_loss():
    """A few dozen steps on one fixed scene batch must cut the loss —
    wiring check of step/loss/optimizer (full training runs on TPU)."""
    import optax

    from fire_tpu.pipeline.engine import _materialize

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, INPUT_PX, INPUT_PX, 3), np.uint8)
    boxes, lms = _gt_scene()
    b = np.repeat(_pad(boxes, lms)[0], 4, axis=0)
    l = np.repeat(_pad(boxes, lms)[1], 4, axis=0)
    v = np.repeat(_pad(boxes, lms)[2], 4, axis=0)

    model = BlazeFace(dtype=jnp.float32)
    variables = _materialize(
        jax.eval_shape(model.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, INPUT_PX, INPUT_PX, 3))),
        seed=0,
    )
    optimizer = optax.adam(3e-3)
    state = (variables["params"], optimizer.init(variables["params"]))
    step_fn = make_blaze_pool_train_step(model, optimizer)

    d = [jax.device_put(x) for x in (imgs, b, l, v)]
    idx = jnp.arange(4, dtype=jnp.int32)
    losses = []
    for _ in range(30):
        state, loss, _ = step_fn(state, *d, idx)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_trained_blazeface_loads_into_engine(tmp_path):
    """The msgpack written by the CLI round-trips through
    DeviceEngine.load_trained_detector for detector_type=mediapipe."""
    from flax import serialization

    from fire_tpu.config import RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine, _materialize

    model = BlazeFace(dtype=jnp.bfloat16)
    variables = _materialize(
        jax.eval_shape(model.init, jax.random.PRNGKey(1),
                       jnp.zeros((1, INPUT_PX, INPUT_PX, 3))),
        seed=1,
    )
    out = tmp_path / "blaze.msgpack"
    out.write_bytes(
        serialization.to_bytes({"params": jax.tree.map(np.asarray,
                                                       variables["params"])})
    )

    cfg = RecognizerConfig(detector_type="mediapipe",
                           weights_dir=None).with_embedding_dim()
    eng = DeviceEngine(cfg, params_dir=str(tmp_path))
    eng.load_trained_detector(str(out))
    leaf = np.asarray(
        jax.tree_util.tree_leaves(eng.det_vars["params"])[0]
    )
    ref = np.asarray(jax.tree_util.tree_leaves(variables["params"])[0])
    np.testing.assert_array_equal(leaf, ref)
    # production detect path runs end to end with the loaded weights
    frame = np.zeros((240, 320, 3), np.uint8)
    assert isinstance(eng.detect_faces(frame), list)


def test_trainer_transform_matches_engine_detect_transform():
    """The deploy-transform contract: the jitted train step must feed
    the network EXACTLY what engine._build_detect feeds it for the same
    cv2-BGR frame — bf16 letterbox (bottom/right pad), then /255 and
    BGR→RGB (engine.py _build_detect run()).  Divergence here is the
    silent domain gap that cost BlazeFace half its held-out precision
    (README §detector training)."""
    from fire_tpu.ops.image import bgr_to_rgb, letterbox

    rng = np.random.default_rng(3)
    frame = rng.integers(0, 255, (480, 640, 3), np.uint8)

    # engine path (engine._build_detect, BlazeFace branch)
    canvas_e, scale_e = letterbox(
        jnp.asarray(frame).astype(jnp.bfloat16), (INPUT_PX, INPUT_PX)
    )
    x_engine = bgr_to_rgb(canvas_e[None].astype(jnp.float32) / 255.0)

    # trainer path (make_blaze_pool_train_step's step body)
    canvas_t, scale_t = letterbox(
        jnp.asarray(frame[None]).astype(jnp.bfloat16), (INPUT_PX, INPUT_PX)
    )
    x_train = canvas_t.astype(jnp.float32)[..., ::-1] / 255.0

    assert float(scale_e) == float(scale_t)
    np.testing.assert_allclose(
        np.asarray(x_engine), np.asarray(x_train), atol=1e-3
    )


def test_warm_start_variables_round_trip(tmp_path):
    """--init_from restores a saved checkpoint (bf16 or f32) into f32
    masters with the trainer's template structure."""
    from flax import serialization

    from fire_tpu.pipeline.engine import _materialize
    from fire_tpu.train.detect import warm_start_variables

    model = BlazeFace(dtype=jnp.bfloat16)
    template = _materialize(
        jax.eval_shape(model.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, INPUT_PX, INPUT_PX, 3))),
        seed=0,
    )
    trained = jax.tree.map(
        lambda a: np.asarray(a, jnp.bfloat16) + np.asarray(1, jnp.bfloat16)
        if np.asarray(a).dtype == np.float32 else np.asarray(a),
        template,
    )
    path = tmp_path / "ckpt.msgpack"
    path.write_bytes(serialization.to_bytes(
        {"params": trained["params"]}
    ))

    got = warm_start_variables(
        {"params": template["params"]}, str(path)
    )
    leaves = jax.tree_util.tree_leaves(got["params"])
    assert all(np.asarray(l).dtype == np.float32 for l in leaves)
    want = jax.tree_util.tree_leaves(trained["params"])
    for g, w in zip(leaves, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w, np.float32), rtol=1e-2, atol=1e-2
        )
