"""RetinaFace training-loop tests: decode-inverse round-trip, ignore
semantics, learning smoke on a tiny variant, and the engine deploy
contract."""

import numpy as np
import jax
import jax.numpy as jnp

from fire_tpu.models.retinaface import RetinaFace, decode_retinaface
from fire_tpu.ops.anchors import RETINAFACE_STRIDES
from fire_tpu.train.detect_retina import (
    make_retina_pool_train_step,
    retina_detection_loss,
    retina_targets,
)

HW = (320, 320)


def _pad(boxes, lms, f=3):
    b = np.zeros((f, 4), np.float32)
    l = np.zeros((f, 5, 2), np.float32)
    v = np.zeros((f,), bool)
    n = boxes.shape[0]
    b[:n], l[:n], v[:n] = boxes, lms, True
    return b[None], l[None], v[None]


def _gt_scene():
    # one small (stride-8 shapes), one mid, one large face
    boxes = np.array(
        [[30.0, 40.0, 28.0, 32.0],
         [150.0, 60.0, 70.0, 80.0],
         [60.0, 160.0, 140.0, 150.0]], np.float32)
    lms = []
    for x, y, w, h in boxes:
        lms.append([[x + 0.7 * w, y + 0.35 * h], [x + 0.3 * w, y + 0.35 * h],
                    [x + 0.5 * w, y + 0.55 * h], [x + 0.65 * w, y + 0.75 * h],
                    [x + 0.35 * w, y + 0.75 * h]])
    return boxes, np.asarray(lms, np.float32)


def test_targets_round_trip_through_production_decode():
    """Perfect head outputs (== targets) must reproduce the GT through
    decode_retinaface — the decode-inverse contract."""
    boxes, lms = _gt_scene()
    b, l, v = _pad(boxes, lms)
    targets = jax.tree.map(
        np.asarray,
        retina_targets(jnp.asarray(b), jnp.asarray(l), jnp.asarray(v), HW),
    )
    heads = {}
    n_pos = 0
    for st in RETINAFACE_STRIDES:
        cls_t, box_t, kps_t, _ = targets[st]
        n_pos += cls_t.sum()
        h, w, A = cls_t.shape[1:]
        heads[st] = (
            jnp.asarray(cls_t * 0.99),
            jnp.asarray(box_t.reshape(1, h, w, 4 * A)),
            jnp.asarray(kps_t.reshape(1, h, w, 10 * A)),
        )
    assert n_pos >= 3
    dets = decode_retinaface(heads, HW, jnp.float32(1.0),
                             threshold=0.9, nms_threshold=0.4)
    got = np.asarray(dets.boxes_xywh)[np.asarray(dets.mask)]
    got_lms = np.asarray(dets.landmarks)[np.asarray(dets.mask)]
    assert got.shape[0] == 3
    for gt_box, gt_lm in zip(boxes, lms):
        ious = []
        for k in range(got.shape[0]):
            gx, gy, gw, gh = got[k]
            ix = max(0.0, min(gx + gw, gt_box[0] + gt_box[2]) - max(gx, gt_box[0]))
            iy = max(0.0, min(gy + gh, gt_box[1] + gt_box[3]) - max(gy, gt_box[1]))
            inter = ix * iy
            ious.append(inter / (gw * gh + gt_box[2] * gt_box[3] - inter))
        k = int(np.argmax(ious))
        # the legacy +1 pixel conventions cost ~1 px on the box edges
        assert ious[k] > 0.93, (gt_box, got)
        np.testing.assert_allclose(got_lms[k], gt_lm, atol=0.5)


def test_ignore_ring_and_size_bands():
    boxes, lms = _gt_scene()
    b, l, v = _pad(boxes, lms)
    targets = jax.tree.map(
        np.asarray,
        retina_targets(jnp.asarray(b), jnp.asarray(l), jnp.asarray(v), HW),
    )
    # the 28×32 face (sqrt-area ~30) must own anchors only at stride 8
    # (shapes 32/16) — stride 32's smallest shape (256) is 3 octaves off
    assert targets[8][0].sum() > 0
    assert targets[32][0].sum() <= 1  # only the 140×150 face may reach 256
    # positives train, in-box negatives are ignored somewhere
    for st in RETINAFACE_STRIDES:
        cls_t, _, _, wgt = targets[st]
        assert (wgt[cls_t > 0] == 1).all()
    ring = (targets[8][0] == 0) & (targets[8][3] == 0)
    assert ring.any()


def test_invalid_faces_produce_no_positives():
    b = np.zeros((1, 3, 4), np.float32)
    l = np.zeros((1, 3, 5, 2), np.float32)
    v = np.zeros((1, 3), bool)
    targets = jax.tree.map(
        np.asarray, retina_targets(jnp.asarray(b), jnp.asarray(l),
                                   jnp.asarray(v), HW))
    for st in RETINAFACE_STRIDES:
        cls_t, box_t, _, wgt = targets[st]
        assert cls_t.sum() == 0 and (box_t == 0).all() and (wgt == 1).all()


def test_retina_short_training_reduces_loss():
    """Tiny variant, fixed batch: the loss must drop — wiring check of
    step/loss/optimizer (full-size training runs on TPU)."""
    import optax

    from fire_tpu.pipeline.engine import _materialize

    hw = (128, 128)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, *hw, 3), np.uint8)
    boxes = np.array([[20.0, 30.0, 40.0, 44.0]], np.float32)
    lms = np.array([[[50, 45], [30, 45], [40, 52], [48, 62], [32, 62]]],
                   np.float32)
    b = np.repeat(_pad(boxes, lms, f=1)[0], 2, axis=0)
    l = np.repeat(_pad(boxes, lms, f=1)[1], 2, axis=0)
    v = np.repeat(_pad(boxes, lms, f=1)[2], 2, axis=0)

    model = RetinaFace(stage_sizes=(1, 1, 1, 1), width=16, dtype=jnp.float32)
    variables = _materialize(
        jax.eval_shape(model.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, *hw, 3))),
        seed=0,
    )
    optimizer = optax.adam(2e-3)
    state = (variables["params"], variables["batch_stats"],
             optimizer.init(variables["params"]))
    step_fn = make_retina_pool_train_step(model, optimizer, hw)

    d = [jax.device_put(x) for x in (imgs, b, l, v)]
    idx = jnp.arange(2, dtype=jnp.int32)
    losses = []
    for _ in range(25):
        state, loss, _ = step_fn(state, *d, idx)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::8]


def test_trained_retinaface_loads_into_engine(tmp_path):
    """The CLI's msgpack round-trips through
    DeviceEngine.load_trained_detector for detector_type=retinaface."""
    from flax import serialization

    from fire_tpu.config import EngineConfig, RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine, _materialize

    size = (256, 256)
    model = RetinaFace(dtype=jnp.bfloat16)
    variables = _materialize(
        jax.eval_shape(model.init, jax.random.PRNGKey(1),
                       jnp.zeros((1, *size, 3))),
        seed=1,
    )
    out = tmp_path / "retina.msgpack"
    out.write_bytes(serialization.to_bytes({
        "params": jax.tree.map(np.asarray, variables["params"]),
        "batch_stats": jax.tree.map(np.asarray, variables["batch_stats"]),
    }))

    cfg = RecognizerConfig(
        detector_type="retinaface", weights_dir=None,
        engine=EngineConfig(retinaface_size=size),
    ).with_embedding_dim()
    eng = DeviceEngine(cfg, params_dir=str(tmp_path))
    eng.load_trained_detector(str(out))
    leaf = np.asarray(jax.tree_util.tree_leaves(eng.det_vars["params"])[0])
    ref = np.asarray(jax.tree_util.tree_leaves(variables["params"])[0])
    np.testing.assert_array_equal(leaf, ref)
    frame = np.zeros((240, 320, 3), np.uint8)
    assert isinstance(eng.detect_faces(frame), list)


def test_trainer_transform_matches_engine_detect_transform():
    """Deploy-transform contract, RetinaFace branch: the engine feeds
    raw-pixel RGB — letterbox(bf16) → /255 → bgr_to_rgb → ×255
    (engine._build_detect), which reduces to flip(canvas); the trainer
    must match bit-for-bit in f32."""
    from fire_tpu.ops.image import bgr_to_rgb, letterbox

    rng = np.random.default_rng(4)
    frame = rng.integers(0, 255, (480, 640, 3), np.uint8)
    size = (512, 512)

    canvas_e, scale_e = letterbox(jnp.asarray(frame).astype(jnp.bfloat16), size)
    x_engine = bgr_to_rgb(canvas_e[None].astype(jnp.float32) / 255.0) * 255.0

    canvas_t, scale_t = letterbox(
        jnp.asarray(frame[None]).astype(jnp.bfloat16), size
    )
    x_train = canvas_t.astype(jnp.float32)[..., ::-1]

    assert float(scale_e) == float(scale_t)
    np.testing.assert_allclose(
        np.asarray(x_engine), np.asarray(x_train), atol=1e-2
    )
