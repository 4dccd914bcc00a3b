"""Step cost vs crowd size (VERDICT r4 #4).

Measures the batched device step's wall time as the number of real
faces per frame grows (1 → 96) at fixed knobs sized for crowds
(encode_k=128, max_tracks=192), on the REAL production graphs (trained
YuNet + FaceNet-512, 100k gallery).  Faces are rendered into the frames
so the detector genuinely finds them — the exact bucketed compaction
then picks a rung per workload, and this tool publishes the measured
cost curve (the config guidance behind EngineConfig.max_faces /
encode_k: cost scales with the bucket that holds the real detections,
not with the configured capacity).

    python tools/bench_crowd.py  [--batch 32] [--trials 5]

Prints one JSON line: {"faces_per_frame": [...], "ms_per_frame": [...],
"bucket_ladder": [...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fire_tpu_jax_cache")

import numpy as np


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--hw", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--counts", type=int, nargs="+", default=(1, 4, 16, 48, 96))
    args = ap.parse_args()

    import jax
    import tempfile

    from fire_tpu.config import TrackerConfig
    from fire_tpu.pipeline.batch_engine import (
        BatchStreamEngine, _bucket_ladder, stream_results)
    from fire_tpu.pipeline.recognizer import FaceRecognition
    from fire_tpu.train.scenes import compose_scene, make_identities

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    storage = tempfile.mkdtemp(prefix="fire_crowd_")
    fr = FaceRecognition(
        detector_type="yunet", encoder_model_type="512",
        enable_logging=False, storage_root=storage,
        tracker_cfg=TrackerConfig(max_tracks=192),
    )
    fr.engine.load_trained_detector(
        os.path.join(repo, "weights_trained", "yunet_synth.msgpack"))
    fr.engine.load_trained_encoder(
        os.path.join(repo, "weights_trained", "facenet512_synth.msgpack"))
    # crowd knobs: decode/NMS emit up to 128 faces per frame
    object.__setattr__(fr.cfg.engine, "max_faces", 128)

    rng = np.random.default_rng(0)
    gal = rng.standard_normal((99_000, 512)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    fr.gallery.load_rows(
        (i + 1, f"p{i}", gal[i].tobytes()) for i in range(gal.shape[0]))

    k_enc = 128
    bse = BatchStreamEngine(fr.engine, fr.gallery, fr.cfg,
                            TrackerConfig(max_tracks=192), encode_k=k_enc)
    idents = make_identities(32, seed=0)
    B = args.batch
    hw = tuple(args.hw)

    results = {"faces_per_frame": [], "ms_per_frame": [],
               "detected_per_frame": []}
    for n in args.counts:
        # n non-overlapping faces per frame: rendered small enough to fit
        fpx = max(28, min(140, int(np.sqrt(hw[0] * hw[1] / (4 * n)))))
        frames = np.stack([
            compose_scene(rng, idents, hw=hw, n_faces=(n, n),
                          face_px=(fpx, fpx + 20), occlusion_prob=0.0)[0]
            .astype(np.uint8)
            for _ in range(8)
        ])
        batch = np.concatenate([frames] * (B // 8))[:B]
        batch_dev = jax.device_put(batch)
        jax.block_until_ready(batch_dev)
        res = bse.process_batch(batch_dev)  # warmup/compile
        det_pf = float(res.mask.sum()) / B
        ts = []
        for _ in range(args.trials):
            t0 = time.time()
            for _ in range(4):
                res = bse.process_batch(batch_dev)
            ts.append((time.time() - t0) / (4 * B) * 1000)
        results["faces_per_frame"].append(n)
        results["ms_per_frame"].append(round(min(ts), 3))
        results["detected_per_frame"].append(round(det_pf, 2))
        print(f"[crowd] {n:3d} faces/frame: {min(ts):.3f} ms/frame "
              f"(tracked/frame {det_pf:.1f})", file=sys.stderr, flush=True)

    results["bucket_ladder"] = list(_bucket_ladder(B * k_enc, None))
    results["batch"] = B
    print(json.dumps(results))


if __name__ == "__main__":
    main()
