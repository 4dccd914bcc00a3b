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
                   help="Mode of operation: image, video, or webcam")
    p.add_argument("--input", type=str, default=None, help="Path to input image or video file")
    p.add_argument("--save", type=str, default=None, help="Path to save the annotated output")
    p.add_argument("--label", type=str, default=None,
                   help="Label/name for adding a new face (image mode) or renaming recognized faces (webcam mode)")
    p.add_argument("--log", action="store_true", help="Enable detailed logging")
    p.add_argument("--show", action="store_true", help="Enable display of processed frames")
    p.add_argument("--password", type=str, default=None, help="Password for encrypting/decrypting files")
    p.add_argument("--detector", type=str, default="mediapipe",
                   choices=["mediapipe", "yunet", "retinaface"],
                   help="Detector type (mediapipe selects the BlazeFace-class fast path)")
    p.add_argument("--encoder", type=str, default=None, choices=["128", "512"],
                   help='Encoder type: "128" for FaceNet-128 and "512" for FaceNet-512')
    p.add_argument("--encoder_mode", type=str, default="cpu_optimized",
                   choices=["cpu_optimized", "gpu_optimized"],
                   help="Accepted for compatibility; the TPU engine ignores it")
    p.add_argument("--align", action="store_true", help="Enable face alignment")
    p.add_argument("--detection_interval", type=int, default=1,
                   help="Number of frames to skip for face detection, use 1 for images")
    p.add_argument("--core", type=int, default=0, help="0 use all cores, 1 use 1 core")
    g = p.add_mutually_exclusive_group()
    g.add_argument("--annotate", dest="annotate", action="store_true",
                   help="Enable drawing bounding boxes and labels")
    g.add_argument("--no-annotate", dest="annotate", action="store_false",
                   help="Disable drawing bounding boxes and labels")
    p.set_defaults(annotate=True)
    p.add_argument("--hnsw_index_path", type=str, default=None,
                   help="Custom path for the gallery index file")
    p.add_argument("--hnsw_labels_path", type=str, default=None,
                   help="Custom path for the gallery labels file")
    p.add_argument("--hnsw_db_ids_path", type=str, default=None,
                   help="Custom path for the gallery DB IDs file")
    p.add_argument("--sqlite_db_path", type=str, default=None,
                   help="Custom path for the SQLite database file (unencrypted)")
    p.add_argument("--sqlite_db_encrypted_path", type=str, default=None,
                   help="Custom path for the encrypted SQLite database file")
    p.add_argument("--interested_label", type=str, default=None,
                   help="If set, only faces with this label will be recognized/maintained")
    p.add_argument("--batch_size", type=int, default=0,
                   help="Video mode: frames per device step (0 = classic per-frame pipeline)")
    p.add_argument("--profile", type=str, default=None,
                   help="Write a jax.profiler trace to this directory (view with TensorBoard/Perfetto)")
    return p


def main(argv: Optional[Sequence[str]] = None) -> None:
    args = build_parser().parse_args(argv)

    if args.profile:
        import jax

        jax.profiler.start_trace(args.profile)

    face_recog = FaceRecognition(
        detector_type=args.detector,
        align=args.align,
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
    )

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
        if args.input is None:
            logging.error("Please provide the path to the input video using --input")
        else:
            face_recog.process_video(
                video_path=args.input, annotate=args.annotate, save_path=args.save,
                batch_size=args.batch_size,
            )
    elif args.mode == "webcam":
        face_recog.process_webcam(
            annotate=args.annotate, save_path=args.save, name=args.label
        )

    if args.label:
        face_recog.shrink_db_ids()
    face_recog.close()

    if args.profile:
        import jax

        jax.profiler.stop_trace()


if __name__ == "__main__":
    main()
