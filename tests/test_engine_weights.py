"""DeviceEngine startup weight loading: ONNX import + executor fallback.

Covers the three real-world cases for cfg.weights_dir
(facenet_gpu.py:99-114, yunet.py:20-28 are the reference loaders):
LFS stubs keep the random init, a matching-topology file imports into
the Flax modules, and a mismatched-topology file falls back to running
the exact ONNX graph via fire_tpu.models.onnx_exec.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fire_tpu.config import EngineConfig, RecognizerConfig
from fire_tpu.models import onnx_export as oe
from fire_tpu.pipeline.engine import DeviceEngine


def _cfg(weights_dir, detector="yunet"):
    return RecognizerConfig(
        detector_type=detector,
        encoder_model_type="128",
        weights_dir=weights_dir,
        engine=EngineConfig(detect_size=(64, 64), max_faces=8, max_encode=4),
    ).with_embedding_dim()


def test_stub_weights_keep_random_init(tmp_path):
    wdir = tmp_path / "weights"
    wdir.mkdir()
    for name in ("facenet128.onnx", "face_detection_yunet_2023mar.onnx"):
        (wdir / name).write_bytes(
            b"version https://git-lfs.github.com/spec/v1\noid sha256:x\nsize 1\n")
    eng = DeviceEngine(_cfg(str(wdir)))
    # random init still in place, default Flax forwards
    assert "params" in eng.enc_vars and "params" in eng.det_vars


def test_matching_topology_imports_into_flax(tmp_path):
    """A real-topology facenet128.onnx (built from a source engine's own
    variables) must load: the second engine's weights become identical."""
    src = DeviceEngine(_cfg(None))
    blob = oe.export_facenet(
        jax.tree.map(np.asarray, src.enc_vars), embed_dim=128)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    (wdir / "facenet128.onnx").write_bytes(blob)

    dst = DeviceEngine(_cfg(str(wdir)), seed=123)  # different random init
    a = np.asarray(src.enc_vars["params"]["stem0"]["conv"]["kernel"])
    b = np.asarray(dst.enc_vars["params"]["stem0"]["conv"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-6)
    c = np.asarray(src.enc_vars["batch_stats"]["bottleneck_bn"]["var"])
    d = np.asarray(dst.enc_vars["batch_stats"]["bottleneck_bn"]["var"])
    np.testing.assert_allclose(c, d, rtol=1e-6)


def test_mismatched_yunet_falls_back_to_executor(tmp_path, rng):
    """A width-8 YuNet export cannot map onto the width-64 Flax model —
    the engine must run the file's exact graph instead, end to end
    through detect_faces()."""
    from fire_tpu.models.yunet import YuNet

    tiny = YuNet(width=8, dtype=jnp.float32)
    variables = jax.tree.map(
        np.asarray, tiny.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    blob = oe.export_yunet(variables, width=8, image_hw=(64, 64))
    wdir = tmp_path / "weights"
    wdir.mkdir()
    (wdir / "face_detection_yunet_2023mar.onnx").write_bytes(blob)

    eng = DeviceEngine(_cfg(str(wdir)))
    # fallback active: det_vars is now the executor's flat param dict
    assert "params" not in eng.det_vars
    frame = (rng.random((48, 60, 3)) * 255).astype(np.uint8)
    out = eng.detect_faces(frame)  # runs the ONNX graph inside the jit
    assert isinstance(out, list)  # untrained weights → likely no faces


def test_extract_variant_uses_mediapipe_low_conf(tmp_path):
    """The extraction detect variant honors the reference's second
    mediapipe config (model_selection=0, conf 0.5,
    mediapipe_face_detector.py:109-131): faces scored between 0.5 and
    0.8 appear only on the extract path."""
    cfg = _cfg(None, detector="mediapipe")
    eng = DeviceEngine(cfg)
    frame = np.random.default_rng(0).integers(0, 255, (64, 64, 3), np.uint8)

    d_det = eng.detect(frame, variant="detect")
    d_ext = eng.detect(frame, variant="extract")
    s_det = np.asarray(d_det.scores)[np.asarray(d_det.mask)]
    s_ext = np.asarray(d_ext.scores)[np.asarray(d_ext.mask)]
    # masks reflect the two thresholds exactly
    assert (s_det > cfg.blazeface_conf_threshold - 1e-6).all()
    assert (s_ext > cfg.blazeface_extract_conf_threshold - 1e-6).all()
    # every detect-path face also passes the laxer extract threshold
    assert np.asarray(d_ext.mask).sum() >= np.asarray(d_det.mask).sum()


def test_extract_variant_shared_for_yunet(tmp_path):
    """yunet/retinaface have no extraction variant in the reference —
    both paths must share one compiled graph (no cache doubling)."""
    eng = DeviceEngine(_cfg(None, detector="yunet"))
    frame = np.zeros((64, 64, 3), np.uint8)
    eng.detect(frame, variant="detect")
    n = len(eng._detect_jit_cache)
    eng.detect(frame, variant="extract")
    assert len(eng._detect_jit_cache) == n


def test_retinaface_onnx_executor_fallback(tmp_path):
    """The reference retinaface.onnx contract: **NHWC** RGB raw-pixel
    input — preprocess.py:134-142 builds (1, H, W, 3) and never
    transposes despite its comment — and 9 outputs in the export's
    permuted order (retinaface_face_detector.py:108) with NHWC
    (scores, bbox, lmk) triplets per stride [32,16,8] and face
    probability in the last-A score channels.  A fixture graph with
    that exact I/O contract must load via the executor and produce the
    planted detection through the full jitted detect path; a
    layout-guard Add against an input-shaped constant makes a wrongly
    transposed feed fail loudly instead of silently."""
    from fire_tpu.models.onnx_export import GraphBuilder

    hw = 64
    gb = GraphBuilder("retinaface_fixture")
    gb.add_input("data", (1, hw, hw, 3))
    # layout guard: broadcasting fails if the engine feeds NCHW
    zname = gb.add_init("layout_guard", np.zeros((1, hw, hw, 3), np.float32))
    gb.add_node("Add", ["data", zname], ["consumed"])

    # permuted slots: applying [7,1,4,8,0,3,6,2,5] must yield
    # [sc32,bb32,lm32,sc16,bb16,lm16,sc8,bb8,lm8]
    shapes = {}
    for stride, tag in ((32, "32"), (16, "16"), (8, "8")):
        g = hw // stride
        shapes["sc" + tag] = (1, g, g, 4)
        shapes["bb" + tag] = (1, g, g, 8)
        shapes["lm" + tag] = (1, g, g, 20)
    vals = {k: np.zeros(s, np.float32) for k, s in shapes.items()}
    # plant one face: stride 8, cell (y=3, x=4), anchor 1 (base
    # [0,0,15,15] -> box (32,24,47,39), safely inside the canvas)
    vals["sc8"][0, 3, 4, 2 + 1] = 0.95

    file_order = [None] * 9
    logical = ["sc32", "bb32", "lm32", "sc16", "bb16", "lm16", "sc8", "bb8", "lm8"]
    perm = [7, 1, 4, 8, 0, 3, 6, 2, 5]
    for lidx, fidx in enumerate(perm):
        file_order[fidx] = logical[lidx]
    for name in file_order:
        cname = gb.add_init("c_" + name, vals[name])
        gb.add_node("Identity", [cname], [name])
        gb.add_output(name, shapes[name])
    onnx_bytes = gb.model_bytes()

    wdir = tmp_path / "weights"
    wdir.mkdir()
    (wdir / "retinaface.onnx").write_bytes(onnx_bytes)

    cfg = RecognizerConfig(
        detector_type="retinaface",
        encoder_model_type="128",
        weights_dir=str(wdir),
        engine=EngineConfig(detect_size=(64, 64), retinaface_size=(64, 64),
                            max_faces=8, max_encode=4),
    ).with_embedding_dim()
    eng = DeviceEngine(cfg)
    frame = np.zeros((64, 64, 3), np.uint8)
    d = eng.detect(frame)
    mask = np.asarray(d.mask)
    assert mask.sum() == 1, mask
    i = int(np.nonzero(mask)[0][0])
    assert abs(float(np.asarray(d.scores)[i]) - 0.95) < 1e-3
    x, y, w, h = np.asarray(d.boxes_xywh)[i]
    assert 30 <= x <= 34 and 22 <= y <= 26 and 13 <= w <= 18 and 13 <= h <= 18, (x, y, w, h)


def test_load_trained_encoder_resets_executor_fallback(tmp_path):
    """--trained must work even when startup probing fell back to the
    ONNX executor for the encoder: load_trained_encoder rebuilds the
    Flax template (the executor's flat param dict cannot deserialize a
    FaceNet tree) and points the forward back at the Flax graph."""
    import jax
    import numpy as np
    from flax import serialization

    from fire_tpu.config import RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine

    cfg = RecognizerConfig(
        detector_type="yunet", encoder_model_type="128", weights_dir=None
    ).with_embedding_dim()
    eng = DeviceEngine(cfg)

    # snapshot a valid trained-variables file from the pristine engine
    blob = serialization.to_bytes(
        jax.tree.map(np.asarray, {"params": eng.enc_vars["params"],
                                  "batch_stats": eng.enc_vars["batch_stats"]})
    )
    out = tmp_path / "enc.msgpack"
    out.write_bytes(blob)

    # simulate the executor fallback: flat param dict + foreign forward
    eng.enc_vars = {"w0": np.zeros((3, 3), np.float32)}
    eng._enc_fn = lambda v, x: (_ for _ in ()).throw(AssertionError("executor fn"))

    eng.load_trained_encoder(str(out))
    assert "params" in eng.enc_vars and "batch_stats" in eng.enc_vars
    x = np.zeros((1, 160, 160, 3), np.float32)
    emb = eng._enc_fn(eng.enc_vars, x)  # Flax forward again
    assert emb.shape == (1, 128)
