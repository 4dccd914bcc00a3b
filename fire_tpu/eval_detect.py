"""Standalone held-out detector evaluation through the PRODUCTION path.

``python -m fire_tpu.eval_detect --detector mediapipe --trained_detector
weights_trained/blazeface_synth.msgpack`` scores any detector slot —
``DeviceEngine.detect_faces``: device letterbox → CNN → decode → NMS at
the reference's confidence thresholds (yunet_face_detector.py:10-11,
retinaface_face_detector.py:55, mediapipe_face_detector.py:13) — on
freshly rendered exact-GT scenes, without re-running a trainer.  Prints
one JSON line: precision/recall/F1/mean-IoU/landmark error.

The detector trainers run the same scorer at the end of training
(fire_tpu.train.detect.detection_pr); this module makes the measurement
repeatable against committed weights.
"""

from __future__ import annotations

import json


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="FIRE-TPU held-out detector eval")
    ap.add_argument("--detector", default="yunet",
                    choices=["yunet", "retinaface", "mediapipe", "blazeface"])
    ap.add_argument("--trained_detector", default=None,
                    help="msgpack from the matching fire_tpu.train.detect* "
                         "loop; omitted = whatever the engine probes "
                         "(reference ONNX or random init)")
    ap.add_argument("--scenes", type=int, default=64)
    ap.add_argument("--identities", type=int, default=200)
    ap.add_argument("--scene_hw", type=int, nargs=2, default=(480, 640))
    ap.add_argument("--face_px", type=int, nargs=2, default=None,
                    help="face size range in source px (default: the "
                         "matching trainer's default per slot)")
    ap.add_argument("--max_faces", type=int, default=2)
    ap.add_argument("--retinaface_size", type=int, default=None)
    ap.add_argument("--blazeface_size", type=int, default=None,
                    help="mediapipe-slot input px (128 published / 192 "
                         "round-5 trained-default)")
    ap.add_argument("--iou", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np

    from fire_tpu.config import RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine
    from fire_tpu.train.detect import detection_pr
    from fire_tpu.train.scenes import compose_scene, make_identities

    engine_kw = {}
    if args.retinaface_size or args.blazeface_size:
        from fire_tpu.config import EngineConfig

        size_kw = {}
        if args.retinaface_size:
            size_kw["retinaface_size"] = (
                args.retinaface_size, args.retinaface_size)
        if args.blazeface_size:
            size_kw["blazeface_size"] = (
                args.blazeface_size, args.blazeface_size)
        engine_kw["engine"] = EngineConfig(**size_kw)
    cfg = RecognizerConfig(
        detector_type=args.detector, weights_dir=None, **engine_kw
    ).with_embedding_dim()
    eng = DeviceEngine(cfg)
    if args.trained_detector:
        eng.load_trained_detector(args.trained_detector)

    # per-slot trainer defaults for the face-size distribution
    face_px = tuple(args.face_px) if args.face_px else {
        "mediapipe": (140, 480), "blazeface": (140, 480),
        "yunet": (24, 192), "retinaface": (40, 360),
    }[args.detector]

    idents = make_identities(args.identities, seed=args.seed)
    rng = np.random.default_rng(args.seed + 31337)
    scenes = [
        compose_scene(rng, idents, hw=tuple(args.scene_hw),
                      n_faces=(1, args.max_faces), face_px=face_px)
        for _ in range(args.scenes)
    ]
    pr = detection_pr(eng.detect_faces, scenes, iou_thresh=args.iou)
    pr["detector"] = args.detector
    pr["weights"] = eng.weight_source["detector"]
    print(json.dumps(pr))


if __name__ == "__main__":
    main()
