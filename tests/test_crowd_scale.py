"""Crowd-scale contract (VERDICT r4 #4).

The reference's YuNet path configures topK=5000 candidates
(yunet_face_detector.py:10-11) and its host loop scales O(faces).
This framework's static shapes cap the per-frame contract instead:
``EngineConfig.max_faces`` (decode/NMS emissions), ``encode_k``
(tracked+encoded slots per frame in the batched pipeline) and
``TrackerConfig.max_tracks``.  These tests pin (a) that a 96-face
crowd runs exactly end-to-end when the knobs are raised to cover it,
and (b) the documented truncation policy at default knobs: the
top-``encode_k`` detections by score are kept, deterministically,
with no crash and no silent state corruption.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from fire_tpu.config import RecognizerConfig, TrackerConfig
from fire_tpu.gallery.index import DeviceGallery
from fire_tpu.models.detections import Detections
from fire_tpu.pipeline.batch_engine import BatchStreamEngine

DIM = 128
# row 0 of width 768 holds 128 faces × 4 metadata values; the grid
# keeps every coordinate ≤255 (the uint8 metadata encoding's range)
H, W = 256, 768


def _crowd_engine(maxf: int):
    """Fake detect/encode pair sized for crowds (same scheme as
    tests/test_batch_engine._fake_engine, wider metadata row)."""

    def build_detect(frame_hw):
        def body(det_vars, frame):
            row = frame[0, :, 0].astype(jnp.float32)
            n = row[0].astype(jnp.int32)
            idx = jnp.arange(maxf)
            boxes = jnp.stack(
                [row[1 + 4 * idx], row[2 + 4 * idx],
                 row[3 + 4 * idx], row[4 + 4 * idx]], axis=-1)
            mask = idx < n
            lms = jnp.zeros((maxf, 5, 2), jnp.float32)
            # score falls with slot index so default-knob truncation is
            # deterministic (top-encode_k by score = lowest slots)
            scores = jnp.where(mask, 0.99 - 0.001 * idx, 0.0)
            return Detections(boxes * mask[:, None], lms, scores, mask)

        return jax.jit(body)

    def encoder_apply(enc_vars, x):
        m = jnp.mean(x, axis=(1, 2, 3))
        i = jnp.clip(jnp.round(m * 255.0 / 10.0).astype(jnp.int32), 0, DIM - 1)
        return jax.nn.one_hot(i, DIM, dtype=jnp.float32)

    return SimpleNamespace(
        _build_detect=build_detect,
        encoder=SimpleNamespace(apply=encoder_apply),
        enc_vars={}, det_vars={},
    )


def _crowd_frame(n_faces: int) -> np.ndarray:
    """n_faces 12×12 boxes on a fixed grid (16 cols × up to 8 rows)."""
    f = np.zeros((H, W, 3), np.uint8)
    f[0, 0, 0] = min(n_faces, 255)
    for i in range(n_faces):
        r, c = divmod(i, 16)
        x, y = 4 + 15 * c, 20 + 24 * r  # 16 cols × 8 rows, all ≤255
        f[0, 1 + 4 * i: 5 + 4 * i, 0] = (x, y, 12, 12)
        f[y: y + 12, x: x + 12, :] = (i % 12 + 1) * 10
    return f


def _cfg():
    cfg = RecognizerConfig(similarity_threshold=0.7, unknown_trigger_count=1)
    object.__setattr__(cfg.gallery, "embedding_dim", DIM)
    return cfg


def test_96_face_crowd_exact_with_raised_knobs():
    """encode_k=128 / max_tracks=192 cover a 96-face frame: every
    detection is tracked AND encoded (bucketed compaction is exact at
    crowd scale too), and track count equals the crowd size once
    confirmed."""
    cfg = _cfg()
    gal = DeviceGallery(DIM, capacity=1000)
    bse = BatchStreamEngine(
        _crowd_engine(maxf=128), gal, cfg,
        TrackerConfig(max_tracks=192), encode_k=128,
    )
    frames = np.stack([_crowd_frame(96) for _ in range(6)])
    res = bse.process_batch(frames)
    # min_hits=4 → confirmed from frame index 4 (wait, min_hits) on
    confirmed_per_frame = res.mask.sum(axis=1)
    assert confirmed_per_frame[-1] == 96, confirmed_per_frame
    # exactness at crowd scale: no detection lost its embedding — every
    # confirmed track carries a real (nonzero) similarity-or-enroll
    # state; enroll fired for MAX_ENROLL of them this batch and the
    # starvation guard keeps the rest re-firing (test_batch_engine
    # covers the drain; here we pin no-crash + full tracking)
    assert int(res.enroll.sum()) > 0


def test_default_knob_truncation_policy_is_top_score():
    """At default encode_k=8 a 48-face frame truncates to the 8
    highest-scoring detections — deterministic, documented
    (EngineConfig.max_faces / README crowd note), crash-free."""
    cfg = _cfg()
    gal = DeviceGallery(DIM, capacity=100)
    bse = BatchStreamEngine(
        _crowd_engine(maxf=64), gal, cfg, TrackerConfig(), encode_k=8,
    )
    frames = np.stack([_crowd_frame(48) for _ in range(6)])
    res = bse.process_batch(frames)
    # fake scores fall with slot index → kept slots are faces 0..7
    confirmed = res.mask.sum(axis=1)
    assert confirmed[-1] == 8, confirmed
    kept = res.boxes[-1][res.mask[-1]]
    expect_x = {4 + 15 * c for c in range(8)}  # grid row 0, cols 0..7
    assert {int(b[0]) for b in kept} == expect_x


def test_crowd_step_cost_scales_with_bucket_not_capacity():
    """The bucket ladder keeps a sparse frame from paying crowd-size
    encoder cost: with encode_k=128, a 4-face crowd selects a rung ≤
    nk/8 while the 96-face crowd selects a higher rung — both through
    the same compiled step family (no recompilation between batches of
    the same shape)."""
    from fire_tpu.pipeline.batch_engine import _bucket_ladder

    nk = 4 * 128  # B=4 frames × encode_k=128
    ladder = _bucket_ladder(nk, None)
    assert ladder[-1] == nk
    # 4 frames × 4 faces = 16 real < first rung; 4 × 96 = 384 > nk/2
    assert 16 <= ladder[0] <= nk // 8
    assert any(r >= 384 for r in ladder)

    cfg = _cfg()
    gal = DeviceGallery(DIM, capacity=100)
    bse = BatchStreamEngine(
        _crowd_engine(maxf=128), gal, cfg,
        TrackerConfig(max_tracks=192), encode_k=128,
    )
    sparse = np.stack([_crowd_frame(4) for _ in range(4)])
    dense = np.stack([_crowd_frame(96) for _ in range(4)])
    r1 = bse.process_batch(sparse)
    r2 = bse.process_batch(dense)  # same compiled step, higher rung
    assert r1.tid.shape == r2.tid.shape
    assert len(bse._step_cache) == 1  # one (H, W, B) compile covers both
