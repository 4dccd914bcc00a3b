"""DeviceEngine: the jitted detect / align / encode / match graphs.

This is the TPU replacement for the reference's per-face host loop
(face_recognition.py:404-486 encodes one 160×160 crop per
``session.run``; SURVEY.md §2.4 notes the reference has zero batching).
Here each stage is one jit with static shapes:

* ``detect(frame)`` — letterbox → detector CNN → on-device decode + NMS
  → padded `Detections` in source pixels.  One compiled graph per input
  resolution (cached).
* ``encode_boxes(frame, boxes)`` — batched crop+resize (160², /255,
  BGR→RGB) fused with the FaceNet forward and L2 normalization; all
  faces of a frame cost one MXU pass.  Bucketed padding (1/2/4/…/
  max_encode) bounds the number of compiled variants.
* ``extract_faces(image, align)`` — detector + batched 3-point affine
  alignment (the reference's per-face cv2.warpAffine,
  yunet_face_detector.py:136-159) on device.

Weights: random-but-persistent by default (saved to the storage dir on
first init so embeddings are stable across sessions); real FaceNet /
detector weights load via fire_tpu.models.onnx_import when the ONNX
files are available (the reference snapshot ships LFS stubs only).

Note on parity: the reference's video path encodes the raw BGR crop
while its add_face path encodes aligned RGB (SURVEY.md §2.2, the
"encoder input quirk" at face_recognition.py:417-429).  We feed RGB on
both paths — the deliberate, documented deviation SURVEY.md recommends.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fire_tpu.config import RecognizerConfig
from fire_tpu.models.blazeface import BlazeFace, decode_blazeface
from fire_tpu.models.detections import Detections
from fire_tpu.models.facenet import FaceNet
from fire_tpu.models.retinaface import RetinaFace, decode_retinaface
from fire_tpu.models.yunet import YuNet, decode_yunet
from fire_tpu.ops.affine import align_faces_160
from fire_tpu.ops.gallery_match import l2_normalize
from fire_tpu.ops.image import bgr_to_rgb, crop_and_resize, crop_and_resize_mm, letterbox

log = logging.getLogger(__name__)


def _materialize(shape_tree, seed: int):
    """Build variable arrays from an eval_shape'd tree: lecun-normal
    kernels, zero biases/means, unit scales/vars — deterministic per
    parameter path so weights are reproducible across sessions AND
    across processes (zlib.crc32, not str hash(), which PYTHONHASHSEED
    salts per interpreter)."""
    import zlib

    from flax.traverse_util import flatten_dict, unflatten_dict

    out = {}
    for col, tree in shape_tree.items():
        flat = flatten_dict(tree)
        new = {}
        for path, leaf in flat.items():
            name = path[-1]
            shape = tuple(leaf.shape)
            dtype = np.dtype(leaf.dtype)
            digest = zlib.crc32("/".join((col,) + path).encode())
            rng = np.random.default_rng((seed * 1_000_003 + digest) % (2**63))
            if name in ("var", "scale"):
                arr = np.ones(shape, dtype)
            elif name in ("mean", "bias"):
                arr = np.zeros(shape, dtype)
            elif len(shape) >= 2:
                fan_in = int(np.prod(shape[:-1]))
                arr = (rng.standard_normal(shape) / np.sqrt(max(fan_in, 1))).astype(dtype)
            else:
                arr = np.zeros(shape, dtype)
            new[path] = jnp.asarray(arr)
        out[col] = unflatten_dict(new)
    return out


def _dev(x):
    """Host array → device array (no-op for jax.Arrays)."""
    return jax.device_put(x) if isinstance(x, np.ndarray) else x


def _buckets(n: int, cap: int) -> int:
    """Round n up to the next power-of-two bucket (≤ cap)."""
    b = 1
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


class DeviceEngine:
    def __init__(self, cfg: RecognizerConfig, params_dir: Optional[str] = None,
                 seed: int = 0, detector=None, encoder=None):
        """``detector``/``encoder`` accept pre-built Flax modules of the
        same families (e.g. ``YuNet(width=8)`` / ``tiny_facenet``) so
        tests and multi-chip dry runs drive the REAL production graphs —
        letterbox, decode, NMS, fused crop+encode — at a fraction of the
        CNN FLOPs.  ``None`` builds the full production models."""
        self.cfg = cfg
        self.params_dir = params_dir

        dt = cfg.engine.cdtype
        self.encoder = encoder or FaceNet(embed_dim=cfg.embedding_dim, dtype=dt)
        det = cfg.detector_type
        if det == "yunet":
            self.detector = detector or YuNet(dtype=dt)
            self._detect_input = cfg.engine.detect_size
        elif det == "retinaface":
            self.detector = detector or RetinaFace(dtype=dt)
            self._detect_input = cfg.engine.retinaface_size
        elif det in ("mediapipe", "blazeface"):
            self.detector = detector or BlazeFace(dtype=dt)
            self._detect_input = cfg.engine.blazeface_size
        else:
            raise ValueError(
                "Invalid detector_type. Choose from 'yunet', 'retinaface', 'mediapipe'."
            )

        # forwards are pluggable so a real ONNX file whose topology we
        # cannot map onto the hand-written Flax modules still runs (via
        # the generic executor) inside the same fused jit graphs
        self._enc_fn = lambda v, x: self.encoder.apply(v, x)
        self._det_fn = lambda v, x: self.detector.apply(v, x)

        # weight provenance, per role: "random-init" until a loader
        # replaces it ("trained:<path>", "onnx-import:<path>",
        # "tflite-import:<path>", "onnx-exec:<path>").  The CLI and the
        # loud-warning check below key off this.
        self.weight_source: Dict[str, str] = {
            "detector": "random-init", "encoder": "random-init",
        }
        self._init_params(seed)
        self._load_reference_weights()
        self._detect_jit_cache: Dict[Tuple[int, int], callable] = {}
        if self.weight_source["detector"] == "random-init":
            # A detector that has never been trained detects nothing at
            # any usable operating point — make that impossible to miss
            # (VERDICT r3 weak #3).  The reference always ships frozen
            # weights (retinaface_face_detector.py:16-53).
            log.warning(
                "DETECTOR '%s' IS RUNNING RANDOM-INIT WEIGHTS — it will "
                "not find real faces. Provide reference ONNX/TFLite files "
                "in %r, pass --trained_detector, or use the committed "
                "weights_trained/ defaults (auto-loaded by the CLI).",
                det, self.cfg.weights_dir,
            )

    # -- parameters --------------------------------------------------------

    def _params_path(self) -> Optional[str]:
        if self.params_dir is None:
            return None
        return os.path.join(
            self.params_dir,
            f"params_{self.cfg.detector_type}_{self.cfg.encoder_model_type}.msgpack",
        )

    def _init_params(self, seed: int) -> None:
        from flax import serialization

        # Materialize parameters directly in numpy from eval_shape'd
        # variable trees: running the XLA init program for the full
        # FaceNet-512 costs minutes on this setup; numpy fan-in init is
        # milliseconds and equally good for placeholder weights (real
        # weights come from ONNX import / training).
        enc_in = jnp.zeros((1, *self.cfg.engine.encode_size, 3), jnp.float32)
        det_in = jnp.zeros((1, *self._detect_input, 3), jnp.float32)
        enc_shapes = jax.eval_shape(self.encoder.init, jax.random.PRNGKey(0), enc_in)
        det_shapes = jax.eval_shape(self.detector.init, jax.random.PRNGKey(0), det_in)
        self.enc_vars = _materialize(enc_shapes, seed)
        self.det_vars = _materialize(det_shapes, seed + 1)

        path = self._params_path()
        loaded = False
        if path and os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    blob = f.read()
                state = serialization.from_bytes(
                    {"enc": self.enc_vars, "det": self.det_vars}, blob
                )
                # from_bytes yields numpy leaves; committed device arrays
                # keep every later jit call on the C++ fast path (a numpy
                # leaf in a ~500-leaf tree costs ~130 ms/call in Python
                # dispatch on this host — docs/DESIGN.md §4)
                self.enc_vars = jax.tree.map(jnp.asarray, state["enc"])
                self.det_vars = jax.tree.map(jnp.asarray, state["det"])
                log.info("Loaded model parameters from %s.", path)
                loaded = True
            except Exception as e:
                # Same recovery contract as the gallery index: corrupt
                # state on disk (truncated write, wrong model config) is
                # regenerated, never fatal (SURVEY §5 failure recovery).
                log.warning(
                    "Params cache %s is unreadable (%s); regenerating "
                    "from fresh init.", path, e)
        if path and not loaded:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            # atomic replace: a killed process must not leave a
            # truncated cache for the next session to trip over
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(serialization.to_bytes({"enc": self.enc_vars, "det": self.det_vars}))
            os.replace(tmp, path)
            log.info("Saved freshly initialized model parameters to %s "
                     "(embeddings stay stable across sessions).", path)

    def load_trained_encoder(self, path: str) -> None:
        """Load encoder variables produced by ``python -m fire_tpu.train``.

        The msgpack holds a Flax FaceNet variable tree, so the template
        is rebuilt from the Flax module rather than taken from
        ``self.enc_vars`` — which may hold a flat ONNX-executor param
        dict if startup probing fell back to executing a mismatched
        real ONNX file (`_use_onnx_encoder`).  The forward is reset to
        the Flax graph for the same reason: trained weights fed to the
        executor graph would be silently wrong."""
        from flax import serialization

        enc_in = jnp.zeros((1, *self.cfg.engine.encode_size, 3), jnp.float32)
        template = _materialize(
            jax.eval_shape(self.encoder.init, jax.random.PRNGKey(0), enc_in), 0
        )
        with open(path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
        self.enc_vars = jax.tree.map(jnp.asarray, restored)
        self._enc_fn = lambda v, x: self.encoder.apply(v, x)
        self.weight_source["encoder"] = f"trained:{path}"
        log.info("Loaded trained encoder variables from %s.", path)

    def load_trained_detector(self, path: str) -> None:
        """Load detector variables produced by
        ``python -m fire_tpu.train.detect`` — the detector half of the
        train→deploy loop (the reference ships frozen weights behind
        opaque C++ only, yunet.py:20-28).  Resets the forward to the
        Flax graph and drops compiled detect graphs so the next call
        re-traces with the trained weights."""
        from flax import serialization

        det_in = jnp.zeros((1, *self._detect_input, 3), jnp.float32)
        template = _materialize(
            jax.eval_shape(self.detector.init, jax.random.PRNGKey(0), det_in), 0
        )
        with open(path, "rb") as f:
            restored = serialization.from_bytes(template, f.read())
        self.det_vars = jax.tree.map(jnp.asarray, restored)
        self._det_fn = lambda v, x: self.detector.apply(v, x)
        self._detect_jit_cache.clear()
        self.weight_source["detector"] = f"trained:{path}"
        log.info("Loaded trained detector variables from %s.", path)

    def load_onnx_weights(self, facenet_onnx: str) -> None:
        """Import reference FaceNet weights (facenet_gpu.py:99-106) when
        a real ONNX file is available."""
        from fire_tpu.models.onnx_import import assign_facenet, read_onnx

        graph = read_onnx(facenet_onnx)
        params, stats = assign_facenet(
            jax.tree.map(np.asarray, self.enc_vars["params"]),
            jax.tree.map(np.asarray, self.enc_vars["batch_stats"]),
            graph,
        )
        self.enc_vars = jax.tree.map(jnp.asarray, {"params": params, "batch_stats": stats})
        self.weight_source["encoder"] = f"onnx-import:{facenet_onnx}"
        log.info("Imported FaceNet weights from %s.", facenet_onnx)

    def load_yunet_onnx_weights(self, yunet_onnx: str) -> None:
        """Import the OpenCV-zoo YuNet 2023mar weights (yunet.py:20-28)."""
        from fire_tpu.models.onnx_import import assign_yunet, read_onnx

        graph = read_onnx(yunet_onnx)
        params, stats = assign_yunet(
            jax.tree.map(np.asarray, self.det_vars["params"]),
            jax.tree.map(np.asarray, self.det_vars["batch_stats"]),
            graph,
        )
        self.det_vars = jax.tree.map(jnp.asarray, {"params": params, "batch_stats": stats})
        self.weight_source["detector"] = f"onnx-import:{yunet_onnx}"
        log.info("Imported YuNet weights from %s.", yunet_onnx)

    def _use_onnx_encoder(self, path: str) -> None:
        """Run the FaceNet ONNX graph directly (NHWC [0,1] contract,
        modules/encoder.py:19-27) via the generic executor."""
        from fire_tpu.models.onnx_exec import make_onnx_fn
        from fire_tpu.models.onnx_import import read_onnx

        fn, params = make_onnx_fn(read_onnx(path))
        self.enc_vars = jax.tree.map(jnp.asarray, params)
        self._enc_fn = lambda v, x: fn(v, x)[0]
        self.weight_source["encoder"] = f"onnx-exec:{path}"
        log.info("Encoder runs the exact ONNX graph from %s (executor).", path)

    def _use_onnx_yunet(self, path: str) -> None:
        """Run the YuNet ONNX graph directly.  The file takes raw-pixel
        NCHW BGR and emits flattened (1, H·W, C) head maps named
        cls_8..kps_32 — adapt to the NHWC-grid contract decode_yunet
        expects."""
        from fire_tpu.models.onnx_exec import make_onnx_fn
        from fire_tpu.models.onnx_import import read_onnx

        graph = read_onnx(path)
        fn, params = make_onnx_fn(graph)
        names = list(graph.outputs)
        want = ["cls_8", "obj_8", "bbox_8", "kps_8", "cls_16", "obj_16",
                "bbox_16", "kps_16", "cls_32", "obj_32", "bbox_32", "kps_32"]
        if sorted(names) != sorted(want):
            raise ValueError(f"unexpected YuNet output names {names}")
        order = [names.index(n) for n in want]
        det_h, det_w = self._detect_input

        def det_fn(v, x01_nhwc):
            outs = fn(v, jnp.transpose(x01_nhwc, (0, 3, 1, 2)) * 255.0)
            outs = [outs[i] for i in order]
            heads = {}
            for level, stride in enumerate((8, 16, 32)):
                h, w = det_h // stride, det_w // stride
                cls, obj, box, kps = outs[4 * level : 4 * level + 4]
                heads[stride] = tuple(
                    a.astype(jnp.float32).reshape(1, h, w, a.shape[-1])
                    for a in (cls, obj, box, kps)
                )
            return heads

        self.det_vars = jax.tree.map(jnp.asarray, params)
        self._det_fn = det_fn
        self.weight_source["detector"] = f"onnx-exec:{path}"
        log.info("Detector runs the exact ONNX graph from %s (executor).", path)

    def _force_blazeface_128(self) -> None:
        """Reference BlazeFace weights are trained at the published 128²
        input — importing them pins the slot back to 128 even when
        EngineConfig.blazeface_size asks for the trained-default 192
        (the FCN topology would *run* at 192, but the reference weights'
        receptive-field statistics would silently degrade)."""
        if tuple(self._detect_input) != (128, 128):
            log.info("Imported BlazeFace weights: forcing 128x128 input "
                     "(was %s).", self._detect_input)
            self._detect_input = (128, 128)
            getattr(self, "_detect_jit_cache", {}).clear()

    def load_blazeface_onnx_weights(self, path: str) -> None:
        """Import BlazeFace short-range weights (the reference's
        MediaPipe model slot, mediapipe_face_detector.py:28-33)."""
        from fire_tpu.models.onnx_import import assign_blazeface, read_onnx

        graph = read_onnx(path)
        params, stats = assign_blazeface(
            jax.tree.map(np.asarray, self.det_vars["params"]),
            jax.tree.map(np.asarray, self.det_vars.get("batch_stats", {})),
            graph,
        )
        self.det_vars = jax.tree.map(
            jnp.asarray,
            {"params": params} if not stats else {"params": params, "batch_stats": stats},
        )
        self.weight_source["detector"] = f"onnx-import:{path}"
        log.info("Imported BlazeFace weights from %s.", path)
        self._force_blazeface_128()

    def load_blazeface_tflite_weights(self, path: str) -> None:
        """Import BlazeFace weights directly from MediaPipe's
        distribution format — the .tflite flatbuffer the reference's
        native graph consumes (mediapipe_face_detector.py:28-33) — with
        no ONNX conversion step."""
        from fire_tpu.models.tflite_import import assign_blazeface_tflite, read_tflite

        params = assign_blazeface_tflite(
            jax.tree.map(np.asarray, self.det_vars["params"]), read_tflite(path)
        )
        self.det_vars = jax.tree.map(jnp.asarray, {"params": params})
        self.weight_source["detector"] = f"tflite-import:{path}"
        log.info("Imported BlazeFace weights from TFLite file %s.", path)
        self._force_blazeface_128()

    def _use_onnx_blazeface(self, path: str) -> None:
        """Run a BlazeFace ONNX graph exactly: [-1,1] RGB NCHW input,
        four NCHW head maps → adapt to the (scores, regs) contract
        decode_blazeface expects (anchor order: 16×16 grid then 8×8)."""
        from fire_tpu.models.onnx_exec import make_onnx_fn
        from fire_tpu.models.onnx_import import read_onnx

        graph = read_onnx(path)
        fn, params = make_onnx_fn(graph)
        names = list(graph.outputs)
        want = ["classifier_8", "regressor_8", "classifier_16", "regressor_16"]
        if sorted(names) != sorted(want):
            raise ValueError(f"unexpected BlazeFace output names {names}")
        order = [names.index(n) for n in want]

        def det_fn(v, x01_nhwc):
            outs = fn(v, jnp.transpose((x01_nhwc - 0.5) * 2.0, (0, 3, 1, 2)))
            c8, r8, c16, r16 = (
                jnp.transpose(outs[i], (0, 2, 3, 1)).astype(jnp.float32) for i in order
            )
            b = c8.shape[0]
            scores = jnp.concatenate([c8.reshape(b, -1), c16.reshape(b, -1)], axis=1)
            regs = jnp.concatenate(
                [r8.reshape(b, -1, 16), r16.reshape(b, -1, 16)], axis=1
            )
            return scores, regs

        self.det_vars = jax.tree.map(jnp.asarray, params)
        self._det_fn = det_fn
        self.weight_source["detector"] = f"onnx-exec:{path}"
        log.info("Detector runs the exact ONNX graph from %s (executor).", path)
        self._force_blazeface_128()

    def _use_onnx_retinaface(self, path: str) -> None:
        """Run the reference's RetinaFace ONNX graph exactly.

        The file is a TF-converted export consuming **NHWC** RGB raw
        pixels — preprocess.py:134-142 builds a (1, H, W, 3) tensor
        with channels reversed and never transposes (its comment says
        "(N,H,W,C) to (N,C,H,W)" but the code does not) — and emits 9
        NHWC head maps in the export's permuted order
        (retinaface_face_detector.py:108), consumed NHWC at
        :119-127.  Per-stride output triplets are (scores, bbox,
        landmarks) for strides [32, 16, 8]; the face probability is the
        last-A channel slice of the score map
        (retinaface_face_detector.py:116-117)."""
        from fire_tpu.models.onnx_exec import make_onnx_fn
        from fire_tpu.models.onnx_import import read_onnx

        graph = read_onnx(path)
        if len(graph.outputs) != 9:
            raise ValueError(f"expected 9 RetinaFace outputs, got {len(graph.outputs)}")
        fn, params = make_onnx_fn(graph)
        perm = (7, 1, 4, 8, 0, 3, 6, 2, 5)  # retinaface_face_detector.py:108
        n_anchors = 2

        def det_fn(v, x_rgb255_nhwc):
            outs = fn(v, x_rgb255_nhwc)  # NHWC straight through
            outs = [outs[i] for i in perm]
            heads = {}
            for level, stride in enumerate((32, 16, 8)):
                sc, bb, lm = (a.astype(jnp.float32) for a in outs[3 * level : 3 * level + 3])
                heads[stride] = (sc[..., n_anchors:], bb, lm)
            return heads

        self.det_vars = jax.tree.map(jnp.asarray, params)
        self._det_fn = det_fn
        self.weight_source["detector"] = f"onnx-exec:{path}"
        log.info("Detector runs the exact ONNX graph from %s (executor).", path)

    def _load_reference_weights(self) -> None:
        """Probe cfg.weights_dir for the reference's ONNX files and
        import them; on a topology mismatch fall back to executing the
        file's exact graph.  LFS stubs / absent files keep the
        deterministic random init (documented: SURVEY.md §7)."""
        wdir = self.cfg.weights_dir
        if not wdir or not os.path.isdir(wdir):
            return
        enc_path = os.path.join(wdir, f"facenet{self.cfg.encoder_model_type}.onnx")
        if os.path.exists(enc_path):
            try:
                self.load_onnx_weights(enc_path)
            except FileNotFoundError as e:  # LFS stub
                log.info("%s", e)
            except ValueError as e:
                log.warning("FaceNet import mismatch (%s); executor fallback.", e)
                self._use_onnx_encoder(enc_path)
        if self.cfg.detector_type == "yunet":
            det_path = os.path.join(wdir, "face_detection_yunet_2023mar.onnx")
            if os.path.exists(det_path):
                try:
                    self.load_yunet_onnx_weights(det_path)
                except FileNotFoundError as e:
                    log.info("%s", e)
                except ValueError as e:
                    log.warning("YuNet import mismatch (%s); executor fallback.", e)
                    self._use_onnx_yunet(det_path)
        elif self.cfg.detector_type in ("mediapipe", "blazeface"):
            for fname in ("face_detection_short_range.tflite", "blazeface.tflite"):
                det_path = os.path.join(wdir, fname)
                if not os.path.exists(det_path):
                    continue
                try:
                    self.load_blazeface_tflite_weights(det_path)
                    return
                except FileNotFoundError as e:  # LFS stub
                    log.info("%s", e)
                except ValueError as e:
                    log.warning("BlazeFace TFLite import failed (%s).", e)
                break
            for fname in ("blazeface.onnx", "face_detection_short_range.onnx"):
                det_path = os.path.join(wdir, fname)
                if not os.path.exists(det_path):
                    continue
                try:
                    self.load_blazeface_onnx_weights(det_path)
                except FileNotFoundError as e:  # LFS stub
                    log.info("%s", e)
                except ValueError as e:
                    log.warning("BlazeFace import mismatch (%s); executor fallback.", e)
                    self._use_onnx_blazeface(det_path)
                break
        elif self.cfg.detector_type == "retinaface":
            det_path = os.path.join(wdir, "retinaface.onnx")
            if os.path.exists(det_path):
                try:
                    # the reference file is an insightface R50 export
                    # whose graph differs from the hand-written Flax
                    # topology — execute the file's exact graph
                    self._use_onnx_retinaface(det_path)
                except FileNotFoundError as e:  # LFS stub
                    log.info("%s", e)
                except ValueError as e:
                    log.warning("RetinaFace ONNX unusable (%s); random init.", e)

    # -- detection ---------------------------------------------------------

    def _build_detect(self, frame_hw: Tuple[int, int], variant: str = "detect"):
        cfg = self.cfg
        det_hw = self._detect_input
        detector, det_vars = self.detector, self.det_vars
        max_faces = cfg.engine.max_faces
        # the reference's extract path runs mediapipe at conf 0.5
        # (model_selection=0) vs 0.8 for detection
        # (mediapipe_face_detector.py:13-30 vs :109-131)
        bf_conf = (
            cfg.blazeface_extract_conf_threshold
            if variant == "extract"
            else cfg.blazeface_conf_threshold
        )

        resample_dtype = (
            jnp.float32 if cfg.engine.strict_f32_preprocess else jnp.bfloat16
        )

        def run(det_vars, frame_u8):
            # Resample in bf16 straight from uint8: measured 12.6 ms vs
            # 35.5 ms for a full-res f32 cast first (B=128 @1080p on
            # v5e) — half the HBM traffic and native-rate vector math.
            # Quantization is ≤0.4% of intensity, far below sensor
            # noise, and the detector CNNs are bf16 anyway.  The
            # strict_f32_preprocess config flag restores reference-parity
            # f32 numerics (EngineConfig).
            canvas, scale = letterbox(frame_u8.astype(resample_dtype), det_hw)
            x = canvas[None].astype(jnp.float32) / 255.0
            if isinstance(detector, BlazeFace):
                x = bgr_to_rgb(x)
                scores, regs = self._det_fn(det_vars, x)
                return decode_blazeface(
                    scores, regs, scale,
                    conf_threshold=bf_conf,
                    max_faces=max_faces,
                    input_px=det_hw[0],
                )
            if isinstance(detector, RetinaFace):
                x = bgr_to_rgb(x) * 255.0  # raw-pixel RGB (preprocess.py:130-143)
                heads = self._det_fn(det_vars, x)
                return decode_retinaface(
                    heads, det_hw, scale,
                    threshold=cfg.retinaface_threshold,
                    nms_threshold=cfg.retinaface_nms_threshold,
                    max_faces=max_faces,
                )
            heads = self._det_fn(det_vars, x)
            return decode_yunet(
                heads, scale,
                conf_threshold=cfg.yunet_conf_threshold,
                nms_threshold=cfg.yunet_nms_threshold,
                max_faces=max_faces,
            )

        return jax.jit(run)

    def detect(self, frame_bgr: np.ndarray, variant: str = "detect") -> Detections:
        """Frame (H, W, 3) uint8 BGR → padded `Detections` (device).

        ``variant="extract"`` applies the extraction-path detector
        config (mediapipe conf 0.5, mediapipe_face_detector.py:109-131);
        identical to "detect" for yunet/retinaface."""
        hw = frame_bgr.shape[:2]
        if variant != "detect" and not isinstance(self.detector, BlazeFace):
            variant = "detect"  # variants only differ for the mediapipe slot
        key = hw if variant == "detect" else (hw, variant)
        fn = self._detect_jit_cache.get(key)
        if fn is None:
            fn = self._build_detect(hw, variant)
            self._detect_jit_cache[key] = fn
        # all-device args keep the C++ jit fast path; eager
        # jnp.asarray would cost ~130ms here, jax.device_put ~4ms
        return fn(self.det_vars, _dev(frame_bgr))

    @partial(jax.jit, static_argnames=("self",))
    def _pack_dets(self, d: Detections) -> jnp.ndarray:
        """(N, 16) f32: bbox(4) ‖ landmarks(10) ‖ score ‖ mask — one
        device→host transfer instead of four (D2H latency dominates the
        per-frame path on this platform)."""
        n = d.boxes_xywh.shape[0]
        return jnp.concatenate(
            [
                d.boxes_xywh.astype(jnp.float32),
                d.landmarks.reshape(n, 10).astype(jnp.float32),
                d.scores[:, None].astype(jnp.float32),
                d.mask[:, None].astype(jnp.float32),
            ],
            axis=1,
        )

    def detect_faces(self, frame_bgr: np.ndarray):
        """Reference list-of-dicts contract (yunet_face_detector.py:49-58)."""
        packed = np.asarray(self._pack_dets(self.detect(frame_bgr)))
        out = []
        for row in packed[packed[:, 15] > 0.5]:
            out.append(
                {
                    "bbox": row[:4].astype(np.int32).tolist(),
                    "landmarks": row[4:14].reshape(5, 2).astype(np.int32),
                    "confidence": float(row[14]),
                }
            )
        return out

    # -- encoding ----------------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _encode_batch(self, enc_vars, faces01):
        """faces01: (B, 160, 160, 3) RGB in [0,1] → (B, D) L2-normalized."""
        emb = self._enc_fn(enc_vars, faces01)
        return l2_normalize(emb)

    def _encode_boxes_jit(self, frame_hw: Tuple[int, int], bucket: int):
        key = ("encb", frame_hw, bucket)
        fn = self._detect_jit_cache.get(key)
        if fn is None:
            size = self.cfg.engine.encode_size

            def run(enc_vars, frame_u8, boxes):
                img = frame_u8.astype(jnp.float32) / 255.0
                crops = crop_and_resize_mm(img, boxes, size)  # BGR, MXU resampling
                emb = self._enc_fn(enc_vars, bgr_to_rgb(crops))
                return l2_normalize(emb)

            fn = jax.jit(run)
            self._detect_jit_cache[key] = fn
        return fn

    def encode_boxes(self, frame_bgr: np.ndarray, boxes_xywh: np.ndarray) -> np.ndarray:
        """Encode all K face boxes of a frame in one fused device call.

        Replaces the reference's crop → cv2.resize → session.run loop
        (face_recognition.py:412-429 + modules/encoder.py:19-27).
        """
        k = boxes_xywh.shape[0]
        if k == 0:
            return np.zeros((0, self.cfg.embedding_dim), np.float32)
        bucket = _buckets(k, self.cfg.engine.max_encode)
        if k > bucket:  # more faces than the cap: chunk
            outs = [
                self.encode_boxes(frame_bgr, boxes_xywh[i : i + bucket])
                for i in range(0, k, bucket)
            ]
            return np.concatenate(outs, axis=0)
        padded = np.zeros((bucket, 4), np.float32)
        padded[:k] = boxes_xywh
        fn = self._encode_boxes_jit(frame_bgr.shape[:2], bucket)
        # all-device args keep the C++ jit fast path (a single numpy arg
        # forces the Python dispatch path, which walks every param leaf)
        emb = fn(self.enc_vars, _dev(frame_bgr), _dev(padded))
        return np.asarray(emb)[:k]

    def _encode_lms_jit(self, frame_hw: Tuple[int, int], bucket: int):
        key = ("encl", frame_hw, bucket)
        fn = self._detect_jit_cache.get(key)
        if fn is None:
            def run(enc_vars, frame_u8, lms3):
                img = frame_u8.astype(jnp.float32) / 255.0
                crops = align_faces_160(img, lms3)  # batched 3-pt affine
                emb = self._enc_fn(enc_vars, bgr_to_rgb(crops))
                return l2_normalize(emb)

            fn = jax.jit(run)
            self._detect_jit_cache[key] = fn
        return fn

    def encode_landmarks(self, frame_bgr, lms3: np.ndarray) -> np.ndarray:
        """Encode K faces via landmark-aligned crops in one fused call —
        the alignment-quality lever of the extract path
        (yunet_face_detector.py:136-159) made available to the video
        loop (VERDICT r4 #6: aligned crops separate identities the raw
        box crops merge).

        lms3: (K, 3, 2) per-face (left_eye, right_eye, nose) pixels.
        """
        k = lms3.shape[0]
        if k == 0:
            return np.zeros((0, self.cfg.embedding_dim), np.float32)
        bucket = _buckets(k, self.cfg.engine.max_encode)
        if k > bucket:
            outs = [
                self.encode_landmarks(frame_bgr, lms3[i: i + bucket])
                for i in range(0, k, bucket)
            ]
            return np.concatenate(outs, axis=0)
        padded = np.zeros((bucket, 3, 2), np.float32)
        padded[:k] = lms3
        # a degenerate all-zero triangle makes the affine solve singular
        # on the pad rows; give pads the canonical template (identityish)
        from fire_tpu.ops.affine import ALIGN_TEMPLATE_160

        padded[k:] = np.asarray(ALIGN_TEMPLATE_160, np.float32)
        fn = self._encode_lms_jit(tuple(frame_bgr.shape[:2]), bucket)
        emb = fn(self.enc_vars, _dev(frame_bgr), _dev(padded))
        return np.asarray(emb)[:k]

    def encode_faces(self, faces_rgb01: np.ndarray) -> np.ndarray:
        """Encode pre-extracted (B, 160, 160, 3) RGB [0,1] crops —
        the add_face path (modules/encoder.py:16-27)."""
        if faces_rgb01.shape[0] == 0:
            return np.zeros((0, self.cfg.embedding_dim), np.float32)
        b = faces_rgb01.shape[0]
        bucket = _buckets(b, max(self.cfg.engine.max_encode, b))
        padded = np.zeros((bucket, *faces_rgb01.shape[1:]), np.float32)
        padded[:b] = faces_rgb01
        emb = self._encode_batch(self.enc_vars, _dev(padded))
        return np.asarray(emb)[:b]

    # -- extraction (detect + align) --------------------------------------

    def extract_faces(self, image_bgr: np.ndarray, align: bool = True):
        """Detect and return 160×160 RGB crops, aligned via the batched
        3-point affine when requested — the extract_faces contract of
        every reference backend (yunet_face_detector.py:89-170).  Uses
        the extraction detector variant (mediapipe runs at conf 0.5
        here, mediapipe_face_detector.py:109-131)."""
        d = self.detect(image_bgr, variant="extract")
        mask = np.asarray(d.mask)
        idx = np.nonzero(mask)[0]
        if idx.size == 0:
            return []
        image01 = np.asarray(image_bgr, np.float32) / 255.0
        if align:
            lms3 = np.asarray(d.landmarks3)[idx]
            crops = align_faces_160(image01, lms3)
        else:
            boxes = np.asarray(d.boxes_xywh)[idx]
            crops = crop_and_resize(image01, boxes, self.cfg.engine.encode_size)
        crops = np.asarray(bgr_to_rgb(crops))
        return [c for c in crops]
