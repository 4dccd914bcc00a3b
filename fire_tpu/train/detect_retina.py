"""RetinaFace detector training on synthetic scenes.

Completes the detector-training sweep started by
`fire_tpu.train.detect` (YuNet) and `fire_tpu.train.detect_blaze`
(BlazeFace): the reference's third detector slot
(retinaface_face_detector.py:16-53) ships a frozen 118 MB ONNX file —
a Git-LFS stub here — so the rebuilt ResNet-50+FPN+SSH topology
(`fire_tpu.models.retinaface.RetinaFace`) had only random init.  With
this loop all three detector slots are trainable end to end on the
same exact-GT scene compositor.

Targets are the exact inverse of the production decode
(`fire_tpu.ops.anchors.bbox_decode` / ``landmark_decode`` with the
reference's legacy ``+1`` pixel conventions and hard-coded two-anchor
tables, retinaface_face_detector.py:79-91):

* each anchor has a fixed size per (stride, index) — 512/256 at
  stride 32, 128/64 at 16, 32/16 at 8.  A face is a **size match** for
  the anchors within 0.6 octaves of its sqrt-area (anchor sizes are
  one octave apart, so every face in [16, 512] px matches 1-2 shapes).
* among size-matched anchors, positives are those whose centre lies in
  the face's central half-box, with a half-cell tolerance floor so the
  centre cell of a matched level is always positive (same centre
  sampling as the YuNet/BlazeFace loops).
* regression targets: ``dx = (cx_gt − cx_a)/w_a``,
  ``dw = log(w_gt/w_a)`` (and the landmark analog) — so a zero-loss
  model reproduces the GT bit-for-bit through ``decode_retinaface``.
* anchors whose centre lies inside a GT box but are not positive are
  ignored by the score loss (weight 0), at every level.

The cls head is trained through its softmax face probability (the
forward's output contract) with focal BCE — same shape as the other
loops.  Targets build on device from padded GT; the train step samples
an HBM-resident scene pool, so per-step H2D is one (B,) index vector.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from fire_tpu.ops.anchors import RETINAFACE_ANCHORS, RETINAFACE_STRIDES

# per (stride, anchor-index): box size and centre offset within a cell,
# derived from the reference anchor tables (xyxy with the legacy +1
# width convention)
def _anchor_geometry():
    geo = {}
    for st in RETINAFACE_STRIDES:
        base = RETINAFACE_ANCHORS[st]
        w = base[:, 2] - base[:, 0] + 1.0  # (A,)
        h = base[:, 3] - base[:, 1] + 1.0
        cx = base[:, 0] + 0.5 * (w - 1.0)
        cy = base[:, 1] + 0.5 * (h - 1.0)
        geo[st] = (w, h, cx, cy)
    return geo


_GEO = _anchor_geometry()
# octave distance beyond which an anchor shape is not assigned a face
_SIZE_BAND = 0.6


def retina_targets(boxes, lms, valid, hw: Tuple[int, int]):
    """Batched on-device targets for the three FPN heads.

    Args:
      boxes: (B, F, 4) xywh px; lms: (B, F, 5, 2); valid: (B, F).
      hw: static train resolution (divisible by 32).

    Returns ``{stride: (cls_t (B,h,w,A), box_t (B,h,w,A,4),
    kps_t (B,h,w,A,10), wgt (B,h,w,A))}``.
    """
    import jax.numpy as jnp

    H, W = hw
    x, y = boxes[..., 0], boxes[..., 1]
    bw, bh = boxes[..., 2], boxes[..., 3]
    cx, cy = x + bw / 2.0, y + bh / 2.0
    size = jnp.sqrt(jnp.maximum(bw, 1e-3) * jnp.maximum(bh, 1e-3))
    out = {}
    for st in RETINAFACE_STRIDES:
        gh, gw = H // st, W // st
        aw, ah, acx, acy = (jnp.asarray(v) for v in _GEO[st])
        A = aw.shape[0]
        # anchor centres: (gh, gw, A)
        gx = jnp.arange(gw, dtype=jnp.float32)[None, :, None] * st + acx
        gy = jnp.arange(gh, dtype=jnp.float32)[:, None, None] * st + acy
        a_size = jnp.sqrt(aw * ah)  # (A,)

        # (B, F, A) size match in octaves
        oct_d = jnp.abs(jnp.log2(size[..., None] / a_size[None, None, :]))
        size_ok = (oct_d <= _SIZE_BAND) & valid[..., None]

        # (B, F, gh, gw, A) geometry
        dx = jnp.abs(gx[None, None] - cx[..., None, None, None])
        dy = jnp.abs(gy[None, None] - cy[..., None, None, None])
        tol_x = jnp.maximum(bw[..., None] / 4.0, st / 2.0)[..., None, None]
        tol_y = jnp.maximum(bh[..., None] / 4.0, st / 2.0)[..., None, None]
        pos = (dx <= tol_x) & (dy <= tol_y) & size_ok[:, :, None, None, :]
        # Ignore band: only anchors of (nearly) the right SIZE whose
        # centre falls inside the face stay unsupervised.  Round-4
        # lesson: ignoring every in-box anchor regardless of scale left
        # e.g. 16 px stride-8 anchors under a 300 px face with zero
        # score supervision AND untrained regression — at deploy they
        # free-fired >0.9 and emitted small garbage boxes (IoU ~0.03
        # with the face), the entire 611-FP / precision-0.13 failure.
        # A wrong-scale anchor sees a patch of cheek texture; "no face
        # of my size here" is a true negative, so it now trains as one.
        size_near = (oct_d <= _SIZE_BAND + 0.4) & valid[..., None]
        inbox = (dx <= (bw / 2.0)[..., None, None, None]) & (
            dy <= (bh / 2.0)[..., None, None, None]
        )
        inbox = inbox & size_near[:, :, None, None, :]

        d2 = dx * dx + dy * dy + oct_d[:, :, None, None, :] * 1e4
        d2 = jnp.where(pos, d2, jnp.inf)
        owner = jnp.argmin(d2, axis=1)  # (B, gh, gw, A)
        any_pos = jnp.any(pos, axis=1)
        any_inbox = jnp.any(inbox, axis=1)

        cls_t = any_pos.astype(jnp.float32)
        wgt = jnp.where(any_inbox & ~any_pos, 0.0, 1.0)

        def g(v):  # (B, F) → (B, gh, gw, A) gathered by owner
            flat = jnp.take_along_axis(
                v, owner.reshape(owner.shape[0], -1), axis=1
            )
            return flat.reshape(owner.shape)

        t_dx = (g(cx) - gx[None]) / aw
        t_dy = (g(cy) - gy[None]) / ah
        t_dw = jnp.log(jnp.maximum(g(bw), 1e-3) / aw)
        t_dh = jnp.log(jnp.maximum(g(bh), 1e-3) / ah)
        box_t = jnp.stack([t_dx, t_dy, t_dw, t_dh], axis=-1) * cls_t[..., None]

        def gk(v):  # (B, F, 5) → (B, gh, gw, A, 5)
            flat = jnp.take_along_axis(
                v, owner.reshape(owner.shape[0], -1, 1), axis=1
            )
            return flat.reshape(*owner.shape, v.shape[-1])

        t_kx = (gk(lms[..., 0]) - gx[None, ..., None]) / aw[:, None]
        t_ky = (gk(lms[..., 1]) - gy[None, ..., None]) / ah[:, None]
        kps_t = jnp.stack([t_kx, t_ky], axis=-1).reshape(
            *cls_t.shape, 10
        ) * cls_t[..., None]
        out[st] = (cls_t, box_t, kps_t, wgt)
    return out


def retina_detection_loss(heads, targets, box_weight: float = 2.0,
                          kps_weight: float = 0.5, alpha: float = 0.75,
                          gamma: float = 2.0, cls_loss: str = "ohem",
                          neg_pos_ratio: float = 7.0):
    """Classification + smooth-L1 delta losses over the three heads.

    ``heads``: {stride: (prob (B,h,w,A), bbox (B,h,w,4A),
    lmk (B,h,w,10A))} — the forward's output contract.

    ``cls_loss`` selects the score loss:

    * ``"ohem"`` (default) — plain BCE on positives plus the
      per-image hardest ``neg_pos_ratio × n_pos`` negatives (min 32),
      selected by a rank mask over the descending-sorted negative BCE
      (static shapes; the sort is one (B, N) lane sort per step).
      Round-4 lesson: focal with alpha=0.75 leaves negatives with an
      0.25·p² weight, and the trained net scored background at 0.9+
      through the production 0.9 threshold — held-out precision 0.13
      at recall 0.98.  Hard-negative mining is the standard fix for
      the softmax RetinaFace head and restores the margin.
    * ``"focal"`` — the round-3 focal BCE (alpha/gamma as given).
    """
    import jax.numpy as jnp

    def smooth_l1(d):
        a = jnp.abs(d)
        return jnp.where(a < 1.0, 0.5 * a * a, a - 0.5)

    total_pos = 1e-6
    box_l = kps_l = 0.0
    probs, ts, ws = [], [], []
    for st, (prob, bbox, lmk) in heads.items():
        cls_t, box_t, kps_t, wgt = targets[st]
        b, h, w, A = cls_t.shape
        bbox = bbox.reshape(b, h, w, A, 4)
        lmk = lmk.reshape(b, h, w, A, 10)
        total_pos = total_pos + cls_t.sum()
        probs.append(jnp.clip(prob, 1e-6, 1.0 - 1e-6).reshape(b, -1))
        ts.append(cls_t.reshape(b, -1))
        ws.append(wgt.reshape(b, -1))
        box_l = box_l + (smooth_l1(bbox - box_t).sum(-1) * cls_t).sum()
        kps_l = kps_l + (smooth_l1(lmk - kps_t).sum(-1) * cls_t).sum()

    p = jnp.concatenate(probs, axis=1)  # (B, N) over all strides
    t = jnp.concatenate(ts, axis=1)
    wgt = jnp.concatenate(ws, axis=1)
    if cls_loss == "ohem":
        pos_l = (-t * jnp.log(p) * wgt).sum()
        neg_raw = -(1.0 - t) * jnp.log(1.0 - p) * wgt
        neg_sorted = -jnp.sort(-neg_raw, axis=1)
        n_pos_i = (t * wgt).sum(axis=1, keepdims=True)
        k_i = jnp.maximum(neg_pos_ratio * n_pos_i, 32.0)
        ranks = jnp.arange(neg_sorted.shape[1], dtype=jnp.float32)[None]
        cls_l = pos_l + (neg_sorted * (ranks < k_i)).sum()
    else:
        pos = -alpha * t * (1.0 - p) ** gamma * jnp.log(p)
        neg = -(1.0 - alpha) * (1.0 - t) * p**gamma * jnp.log(1.0 - p)
        cls_l = ((pos + neg) * wgt).sum()
    loss = (cls_l + box_weight * box_l + kps_weight * kps_l) / total_pos
    return loss, {"cls": cls_l / total_pos, "box": box_l / total_pos,
                  "kps": kps_l / total_pos, "n_pos": total_pos}


def make_retina_pool_train_step(model, optimizer, hw: Tuple[int, int],
                                loss_kwargs: Dict | None = None):
    """Jitted pool-sampling train step (same scheme as the YuNet and
    BlazeFace loops; the model carries batch_stats).

    Scenes are composed at DEPLOY resolution and pushed through the
    production input transform inside the step — the engine's bf16
    letterbox (aspect resize + bottom/right zero pad) and BGR→RGB flip,
    then raw-pixel RGB scaling (processing/preprocess.py:130-143) — so
    the network trains on exactly the statistics it is deployed on.
    Training on natively-rendered 320² scenes was measured at held-out
    recall 0.85 / mean-IoU 0.82 but precision **0.085** through the
    production path: the deploy letterbox's upsampled textures and the
    zero-pad band the model had never seen produced 805 false positives
    at the reference's 0.9 confidence.  ``hw`` is the train-time
    network input; GT boxes/landmarks ride the letterbox ``scale``.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from fire_tpu.ops.image import letterbox

    def loss_fn(params, batch_stats, images, targets):
        heads, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        loss, metrics = retina_detection_loss(
            heads, targets, **(loss_kwargs or {})
        )
        return loss, (mutated["batch_stats"], metrics)

    def step(state, pool_imgs, pool_boxes, pool_lms, pool_valid, idx):
        frames = pool_imgs[idx]
        if frames.shape[1:3] == hw:
            canvas = frames.astype(jnp.float32)
            scale = jnp.float32(1.0)
        else:
            canvas, scale = letterbox(frames.astype(jnp.bfloat16), hw)
            canvas = canvas.astype(jnp.float32)
        images = canvas[..., ::-1]  # cv2-BGR → raw-pixel RGB
        targets = retina_targets(
            pool_boxes[idx] * scale, pool_lms[idx] * scale,
            pool_valid[idx], hw,
        )
        params, batch_stats, opt_state = state
        (loss, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, images, targets)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_stats, opt_state), loss, metrics

    return jax.jit(step)


# ----------------------------------------------------------------- CLI ---


def main() -> None:
    """``python -m fire_tpu.train.detect_retina`` — train the deployable
    RetinaFace and export engine-loadable detector variables
    (``DeviceEngine.load_trained_detector`` with
    ``detector_type='retinaface'``)."""
    import argparse
    import logging
    import time

    def _save_vars(state, path, serialization, log, tag):
        import os

        out_vars = {
            "params": jax.tree.map(np.asarray, state[0]),
            "batch_stats": jax.tree.map(np.asarray, state[1]),
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(out_vars))
        os.replace(tmp, path)
        log.info("trained RetinaFace variables written to %s (%s)",
                 path, tag)

    ap = argparse.ArgumentParser(description="FIRE-TPU RetinaFace training")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512,
                    help="train-time network input (÷32); also the "
                         "recommended deploy retinaface_size for these "
                         "from-scratch weights")
    ap.add_argument("--scene_hw", type=int, nargs=2, default=(480, 640),
                    help="compose resolution; the step letterboxes to "
                         "--size exactly as the deployed engine does")
    ap.add_argument("--identities", type=int, default=200)
    ap.add_argument("--cls_loss", choices=("ohem", "focal"), default="ohem",
                    help="score loss: hard-negative-mined BCE (default) "
                         "or the round-3 focal BCE")
    ap.add_argument("--neg_pos_ratio", type=float, default=7.0,
                    help="OHEM negatives kept per positive (min 32/image)")
    ap.add_argument("--box_weight", type=float, default=2.0,
                    help="regression-loss weight; raise for a "
                         "localization-focused fine-tune")
    ap.add_argument("--init_from", default=None,
                    help="msgpack of a previous run to warm-start from "
                         "(fine-tune) instead of random init")
    ap.add_argument("--alpha", type=float, default=0.75,
                    help="focal positive weight (focal mode only)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--gen_threads", type=int, default=6)
    ap.add_argument("--max_faces", type=int, default=3)
    ap.add_argument("--face_px", type=int, nargs=2, default=(40, 360),
                    help="face size in SOURCE px (default maps to 32-288 "
                         "px on the 512 input at the default scene_hw)")
    ap.add_argument("--out", default="trained_retinaface.msgpack")
    ap.add_argument("--save_every", type=int, default=500,
                    help="periodic checkpoint interval (steps); the "
                         "final weights always overwrite --out at the "
                         "end of the schedule")
    ap.add_argument("--eval_scenes", type=int, default=48)
    ap.add_argument("--log_every", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--device_pool", type=int, default=384)
    ap.add_argument("--refresh_block", type=int, default=32)
    ap.add_argument("--refresh_every", type=int, default=10)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("fire_tpu.train.detect_retina")

    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from fire_tpu.models.retinaface import RetinaFace
    from fire_tpu.pipeline.engine import _materialize
    from fire_tpu.train.detect import ScenePool, pad_gt, update_pool_rows
    from fire_tpu.train.scenes import compose_scene, make_identities

    idents = make_identities(args.identities, seed=args.seed)
    hw = (args.size, args.size)
    scene_hw = tuple(args.scene_hw)

    def gen(rng):
        img, boxes, lms = compose_scene(
            rng, idents, hw=scene_hw, n_faces=(1, args.max_faces),
            face_px=tuple(args.face_px),
        )
        return (img.astype(np.uint8), *pad_gt(boxes, lms, args.max_faces))

    pool = ScenePool(gen, size=args.pool, threads=args.gen_threads,
                     seed=args.seed)

    model = RetinaFace(dtype=jnp.bfloat16)
    variables = _materialize(
        jax.eval_shape(
            model.init, jax.random.PRNGKey(args.seed),
            jnp.zeros((1, *hw, 3)),
        ),
        seed=args.seed,
    )
    if args.init_from:
        from fire_tpu.train.detect import warm_start_variables

        variables = warm_start_variables(variables, args.init_from)
        log.info("warm-started from %s", args.init_from)
    optimizer = optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(optax.cosine_decay_schedule(args.lr, args.steps, 0.05)),
    )
    state = (variables["params"], variables["batch_stats"],
             optimizer.init(variables["params"]))
    step_fn = make_retina_pool_train_step(
        model, optimizer, hw,
        loss_kwargs={"cls_loss": args.cls_loss,
                     "neg_pos_ratio": args.neg_pos_ratio,
                     "alpha": args.alpha,
                     "box_weight": args.box_weight},
    )

    rng = np.random.default_rng(args.seed + 7)

    def block(n):
        ex = pool.sample(n, rng)
        return tuple(np.stack([e[j] for e in ex]) for j in range(4))

    n_pool = args.device_pool
    imgs0, boxes0, lms0, valid0 = block(n_pool)
    d_imgs = jax.device_put(imgs0)
    d_boxes = jax.device_put(boxes0)
    d_lms = jax.device_put(lms0)
    d_valid = jax.device_put(valid0)
    log.info("device pool staged: %d scenes (%.1f MB)",
             n_pool, imgs0.nbytes / 1e6)

    refresh_at = 0
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = jnp.asarray(rng.integers(0, n_pool, args.batch), jnp.int32)
        state, loss, metrics = step_fn(
            state, d_imgs, d_boxes, d_lms, d_valid, idx
        )
        if args.refresh_every and step % args.refresh_every == 0:
            bi, bb, bl, bv = block(min(args.refresh_block, n_pool))
            start = refresh_at
            refresh_at = (refresh_at + bi.shape[0]) % max(
                n_pool - bi.shape[0] + 1, 1
            )
            d_imgs = update_pool_rows(d_imgs, bi, start)
            d_boxes = update_pool_rows(d_boxes, bb, start)
            d_lms = update_pool_rows(d_lms, bl, start)
            d_valid = update_pool_rows(d_valid, bv, start)
        if step % args.log_every == 0:
            m = {k: float(v) for k, v in metrics.items()}
            log.info(
                "step %d  loss %.4f  cls %.4f box %.4f kps %.4f  "
                "(%.1f img/s, %d scenes synthesized)",
                step, float(loss), m["cls"], m["box"], m["kps"],
                step * args.batch / (time.time() - t0), pool.generated,
            )
        if args.save_every and step % args.save_every == 0:
            _save_vars(state, args.out, serialization, log,
                       tag=f"step {step}")
    pool.stop()

    _save_vars(state, args.out, serialization, log, tag="final")

    if args.eval_scenes:
        from fire_tpu.config import EngineConfig, RecognizerConfig
        from fire_tpu.pipeline.engine import DeviceEngine
        from fire_tpu.train.detect import detection_pr

        # deploy these from-scratch weights at the train-time input
        # size (the 1024 default is the operating point of the
        # reference's ONNX weights; EngineConfig.retinaface_size is the
        # knob either way)
        cfg = RecognizerConfig(
            detector_type="retinaface", weights_dir=None,
            engine=EngineConfig(retinaface_size=hw),
        ).with_embedding_dim()
        eng = DeviceEngine(cfg)
        eng.load_trained_detector(args.out)
        ev_rng = np.random.default_rng(args.seed + 31337)
        scenes = [
            compose_scene(ev_rng, idents, hw=scene_hw,
                          n_faces=(1, args.max_faces),
                          face_px=tuple(args.face_px))
            for _ in range(args.eval_scenes)
        ]
        pr = detection_pr(eng.detect_faces, scenes)
        log.info("held-out detection @%dx%d (production path, "
                 "retinaface_size=%s): %s",
                 scene_hw[1], scene_hw[0], hw, pr)


if __name__ == "__main__":
    main()
