"""Stage-level profile + MFU of the batched pipeline step (VERDICT r3 #5).

Times the FULL fused B-frame step (the bench headline's unit of work),
then each stage compiled separately at the same shapes — detector
(letterbox+CNN+decode+NMS, vmapped), encoder (fused crop+FaceNet-512),
gallery top-1 (Pallas kernel), tracker scan (KF+LAP over the batch) —
and reports per-stage ms, the fusion gain, XLA's FLOP estimate, and an
MFU figure against the chip's bf16 peak.

Run on the real chip:
    python tools/profile_step.py [--batch 256] [--trace /tmp/trace_dir]

One JSON line on stdout; human-readable breakdown on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fire_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

# TPU v5e (v5 lite): 197 TFLOP/s bf16 peak per chip
PEAK_BF16_FLOPS = 197e12


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _time_fn(fn, args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _flops(fn, *args):
    """XLA's FLOP estimate for the compiled fn at these shapes."""
    import jax

    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception as e:  # pragma: no cover - analysis is best-effort
        _log(f"cost_analysis failed: {e}")
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--trace", default=None,
                    help="also write a jax.profiler trace to this dir")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny models/shapes for a CPU smoke test of the "
                         "profiler itself (numbers are meaningless)")
    ap.add_argument("--trained", action="store_true",
                    help="profile the bench headline's exact workload: "
                         "committed trained weights on rendered 1-face "
                         "scenes, so the compaction bucket the step picks "
                         "matches the headline (random weights + noise "
                         "frames would let detector noise pick it)")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from fire_tpu.config import EngineConfig, RecognizerConfig, TrackerConfig
    from fire_tpu.gallery.index import DeviceGallery
    from fire_tpu.ops.gallery_match import l2_normalize
    from fire_tpu.ops.image import bgr_to_rgb, crop_and_resize_mm
    from fire_tpu.pipeline.batch_engine import BatchStreamEngine, _track_scan
    from fire_tpu.pipeline.engine import DeviceEngine

    B = 4 if args.tiny else args.batch
    _log(f"backend: {jax.devices()}")
    np.asarray(jax.device_put(np.zeros(4, np.float32)))  # d2h channel warmup

    dim = 128 if args.tiny else 512
    cfg = RecognizerConfig(
        detector_type="yunet",
        encoder_model_type="128" if args.tiny else "512",
        similarity_threshold=0.7, unknown_trigger_count=1,
        weights_dir=None,
        engine=(EngineConfig(detect_size=(64, 64), encode_size=(96, 96))
                if args.tiny else EngineConfig()),
    ).with_embedding_dim()
    if args.tiny:
        from fire_tpu.models.facenet import tiny_facenet
        from fire_tpu.models.yunet import YuNet

        eng = DeviceEngine(cfg, detector=YuNet(width=8, dtype=jnp.float32),
                           encoder=tiny_facenet(dim, dtype=jnp.float32))
        n_rows, capacity = 1000, 2048
        frame_hw = (64, 64)
    else:
        eng = DeviceEngine(cfg)
        n_rows, capacity = 99_900, 100_000
        frame_hw = (1080, 1920)
    gal = DeviceGallery(dim, capacity=capacity)
    rng = np.random.default_rng(0)
    rows = rng.standard_normal((n_rows, dim)).astype(np.float32)
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    gal.load_rows((i + 1, f"p{i}", rows[i].tobytes()) for i in range(rows.shape[0]))

    if args.trained and not args.tiny:
        # the bench headline's workload: committed trained weights on
        # rendered scenes with exactly one face each (bench.py setup)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        eng.load_trained_detector(
            os.path.join(repo, "weights_trained", "yunet_synth.msgpack"))
        eng.load_trained_encoder(
            os.path.join(repo, "weights_trained", "facenet512_synth.msgpack"))
        from fire_tpu.train.scenes import compose_scene, make_identities

        idents = make_identities(8, seed=0)
        scenes = np.stack([
            compose_scene(rng, idents, hw=frame_hw, n_faces=(1, 1),
                          face_px=(180, 360))[0].astype(np.uint8)
            for _ in range(8)
        ])
        host_frames = np.tile(scenes, (max(1, B // 8 + 1), 1, 1, 1))[:B]
        _log("trained weights + rendered 1-face scenes loaded")
    else:
        host_frames = rng.integers(0, 255, (B, *frame_hw, 3), np.uint8)
    frames = jax.device_put(host_frames)
    jax.block_until_ready(frames)

    # ---- full fused step ----
    bse = BatchStreamEngine(eng, gal, cfg)
    k = bse.encode_k
    step = bse._step_cache.setdefault((*frame_hw, B), bse._build_step(frame_hw, B))
    gal_op = gal.gal_matmul
    count = jnp.asarray(gal.count, jnp.int32)

    def full(frames):
        new_state, packed = step(eng.det_vars, eng.enc_vars, gal_op, count,
                                 bse.state, frames)
        return packed

    t_full = _time_fn(full, (frames,))
    _log(f"full step B={B}: {t_full*1e3:.1f} ms -> {B/t_full:.0f} fps")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                jax.block_until_ready(full(frames))
        _log(f"profiler trace written to {args.trace}")

    # ---- stages compiled separately (same shapes as inside the step) ----
    det_body = eng._build_detect(frame_hw).__wrapped__
    det_stage = jax.jit(lambda v, f: jax.vmap(lambda x: det_body(v, x))(f))
    t_det = _time_fn(det_stage, (eng.det_vars, frames))

    size = cfg.engine.encode_size
    boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 120.0, 120.0]]), (B, k, 1))

    def enc_stage(enc_vars, frames, boxes):
        crops = jax.vmap(lambda img, b: crop_and_resize_mm(img, b, size))(frames, boxes)
        flat = bgr_to_rgb(crops / 255.0).reshape((-1, *size, 3))
        return l2_normalize(eng._enc_fn(enc_vars, flat))

    enc_stage_j = jax.jit(enc_stage)
    t_enc = _time_fn(enc_stage_j, (eng.enc_vars, frames, boxes))

    # ---- compacted encoder stage per bucket (round-5 default path):
    # crop_selected_rows gathers only the batch's real detections, so
    # the encoder runs on m inputs instead of B*k pad-heavy slots.
    # One real face per frame models the headline workload's rung.
    from fire_tpu.ops.image import crop_selected_rows
    from fire_tpu.pipeline.batch_engine import _bucket_ladder

    nk = B * k
    fs_host = np.full((nk,), -1.0, np.float32)
    fs_host[::k] = 1.0  # one real detection per frame
    flat_scores = jax.device_put(fs_host)
    boxes_flat = jax.device_put(
        np.tile(np.asarray([[400.0, 300.0, 280.0, 280.0]], np.float32), (nk, 1)))

    def enc_compact(enc_vars, frames, flat_scores, boxes_flat, m):
        top_s, top_idx = jax.lax.top_k(flat_scores, m)
        sel_valid = top_s >= 0.0
        sel_frame = (top_idx // k).astype(jnp.int32)
        crops = crop_selected_rows(frames, sel_frame, boxes_flat[top_idx], size)
        flat = bgr_to_rgb(crops / 255.0).reshape((-1, *size, 3))
        return l2_normalize(eng._enc_fn(enc_vars, flat)) * sel_valid[:, None]

    enc_buckets = {}
    for m in _bucket_ladder(nk, None):
        fj = jax.jit(lambda v, f, s, b, m=m: enc_compact(v, f, s, b, m))
        enc_buckets[m] = round(
            _time_fn(fj, (eng.enc_vars, frames, flat_scores, boxes_flat)) * 1e3, 2)
        _log(f"  compacted encoder m={m}: {enc_buckets[m]} ms")

    # which rung would the step pick on THESE frames/weights?
    dets_probe = det_stage(eng.det_vars, frames)
    per_frame = jnp.minimum(dets_probe.mask.sum(axis=-1), k)
    n_real = int(np.asarray(per_frame.sum()))
    ladder = _bucket_ladder(nk, None)
    chosen = next((m for m in ladder if m >= n_real), nk)
    _log(f"  real detections in batch: {n_real} -> bucket {chosen}")

    q = jax.device_put(rows[: B * k].copy())
    try:
        from fire_tpu.ops.pallas_topk import pallas_cosine_top1

        gal_stage = jax.jit(lambda q, g: pallas_cosine_top1(q, g, count))
        t_gal = _time_fn(gal_stage, (q.astype(jnp.float32), gal_op))
        gal_kind = "pallas_top1"
    except Exception as e:
        _log(f"pallas stage skipped ({e}); XLA matmul+top_k")
        from fire_tpu.ops.gallery_match import cosine_topk

        valid = jnp.arange(gal_op.shape[0]) < count
        gal_stage = jax.jit(lambda q, g: cosine_topk(q, g, valid, k=1))
        t_gal = _time_fn(gal_stage, (q, gal_op))
        gal_kind = "xla_topk"

    tcfg = TrackerConfig()
    emb = jnp.zeros((B, k, dim), jnp.float32)
    mask = jnp.zeros((B, k), bool)
    gid = jnp.zeros((B, k), jnp.int32)
    sim = jnp.zeros((B, k), jnp.float32)
    bx = jnp.zeros((B, k, 4), jnp.float32)

    def scan_stage(state, bx, mask, gid, sim, emb):
        new_state, res = _track_scan(state, bx, mask, gid, sim, emb, mask,
                                     tcfg, 0.7, 1)
        return res.tid

    scan_j = jax.jit(scan_stage)
    t_scan = _time_fn(scan_j, (bse.state, bx, mask, gid, sim, emb))

    # ---- FLOPs + MFU ----
    fl_full = _flops(lambda f: step(eng.det_vars, eng.enc_vars, gal_op, count,
                                    bse.state, f)[1], frames)
    mfu = fl_full / t_full / PEAK_BF16_FLOPS if fl_full else 0.0

    stages = {
        "detector_ms": round(t_det * 1e3, 2),
        "encoder_ms": round(t_enc * 1e3, 2),
        f"gallery_{gal_kind}_ms": round(t_gal * 1e3, 2),
        "tracker_scan_ms": round(t_scan * 1e3, 2),
    }
    sum_stages = t_det + t_enc + t_gal + t_scan
    out = {
        "batch": B,
        "trained_workload": bool(args.trained),
        "full_step_ms": round(t_full * 1e3, 2),
        "fps": round(B / t_full, 1),
        "stages_separate": stages,
        "encoder_compacted_ms_by_bucket": enc_buckets,
        "real_detections_in_batch": n_real,
        "chosen_bucket": chosen,
        "sum_stages_ms": round(sum_stages * 1e3, 2),
        "fusion_gain_ms": round((sum_stages - t_full) * 1e3, 2),
        "xla_flops_estimate": fl_full,
        "mfu_vs_197T_bf16": round(mfu, 4),
    }
    for k_, v in out.items():
        _log(f"  {k_}: {v}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
