"""TFLite flatbuffer reader + BlazeFace weight import.

MediaPipe distributes BlazeFace as a .tflite flatbuffer
(mediapipe_face_detector.py:28-33 consumes it through native code).
`fire_tpu.models.tflite_import` parses that wire format without the
flatbuffers/tensorflow packages.  The real file cannot ship here, so
fidelity is proven the same way as the ONNX stack: a builder emits a
spec-conformant .tflite with the real model's op sequence, and the
reader/importer must round-trip it exactly — a reader that mishandles
vtables, packed buffers, or conv layouts fails these tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fire_tpu.models.blazeface import BlazeFace, blazeface_layer_order
from fire_tpu.models.tflite_import import (
    OP_CONV_2D,
    OP_DEPTHWISE_CONV_2D,
    OP_DEQUANTIZE,
    TfliteModel,
    TfliteOp,
    TfliteTensor,
    assign_blazeface_tflite,
    read_tflite,
    write_tflite_blazeface,
)


def _blaze_params(seed=0):
    model = BlazeFace(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 128, 128, 3)))
    return model, jax.tree.map(np.asarray, variables)


def test_read_tflite_structure():
    _, v = _blaze_params()
    blob = write_tflite_blazeface(v["params"])
    m = read_tflite(blob)
    assert m.description == "fire_tpu blazeface interchange"
    conv_ops = [op for op in m.ops if op.code in (OP_CONV_2D, OP_DEPTHWISE_CONV_2D)]
    assert len(conv_ops) == len(blazeface_layer_order()) == 37
    # execution-order op chaining: each op consumes the previous output
    for prev, nxt in zip(conv_ops, conv_ops[1:]):
        assert nxt.inputs[0] == prev.outputs[0]
    # weight tensors carry float32 payloads with TFLite layouts
    t = m.tensors[conv_ops[0].inputs[1]]  # conv1 filter: OHWI
    assert t.shape == (24, 5, 5, 3) and t.data is not None
    dw = m.tensors[conv_ops[1].inputs[1]]  # b1/dw filter: (1, kh, kw, c)
    assert dw.shape == (1, 5, 5, 24)


def test_roundtrip_exact(tmp_path):
    """export → read → assign reproduces every leaf bit-exactly and the
    forward pass is unchanged."""
    model, v = _blaze_params(seed=3)
    path = str(tmp_path / "face_detection_short_range.tflite")
    write_tflite_blazeface(v["params"], path)

    _, fresh = _blaze_params(seed=9)  # different init — must be overwritten
    assigned = assign_blazeface_tflite(fresh["params"], read_tflite(path))

    src_leaves = jax.tree.leaves(v["params"])
    dst_leaves = jax.tree.leaves(assigned)
    assert len(src_leaves) == len(dst_leaves)
    for a, b in zip(src_leaves, dst_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 128, 128, 3)), jnp.float32)
    s0, r0 = model.apply({"params": v["params"]}, x)
    s1, r1 = model.apply({"params": assigned}, x)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))


def test_fp16_dequantize_variant():
    """MediaPipe's fp16 files store float16 constants behind DEQUANTIZE
    ops; `TfliteModel.weight` must follow the hop and widen."""
    _, v = _blaze_params()
    m = read_tflite(write_tflite_blazeface(v["params"]))

    # rebuild the model with every weight tensor demoted to an fp16
    # constant + a DEQUANTIZE op feeding the original index
    tensors = list(m.tensors)
    ops = []
    for op in m.ops:
        if op.code not in (OP_CONV_2D, OP_DEPTHWISE_CONV_2D):
            ops.append(op)
            continue
        new_inputs = [op.inputs[0]]
        for ti in op.inputs[1:3]:
            t = tensors[ti]
            tensors.append(TfliteTensor(t.name + "_f16", t.shape, 1,
                                        t.data.astype(np.float16)))
            tensors[ti] = TfliteTensor(t.name, t.shape, 0, None)
            ops.append(TfliteOp(OP_DEQUANTIZE, (len(tensors) - 1,), (ti,)))
            new_inputs.append(ti)
        ops.append(TfliteOp(op.code, tuple(new_inputs), op.outputs))
    m16 = TfliteModel(tensors, ops, m.inputs, m.outputs, m.description)

    _, fresh = _blaze_params(seed=5)
    assigned = assign_blazeface_tflite(fresh["params"], m16)
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(assigned)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )


def test_mismatch_rejected():
    _, v = _blaze_params()
    m = read_tflite(write_tflite_blazeface(v["params"]))
    truncated = TfliteModel(m.tensors, m.ops[:-1], m.inputs, m.outputs, m.description)
    with pytest.raises(ValueError, match="conv ops"):
        assign_blazeface_tflite(v["params"], truncated)
    with pytest.raises(ValueError):
        read_tflite(b"\x00" * 4)


def test_lfs_stub_and_garbage_rejected_cleanly(tmp_path):
    """A Git-LFS pointer stub raises FileNotFoundError (same contract
    as the ONNX reader — 'file absent', not 'malformed'), and arbitrary
    garbage raises ValueError, never struct.error/IndexError; engine
    startup probing must survive both with random init."""
    stub = tmp_path / "face_detection_short_range.tflite"
    stub.write_bytes(
        b"version https://git-lfs.github.com/spec/v1\n"
        b"oid sha256:deadbeef\nsize 229032\n"
    )
    with pytest.raises(FileNotFoundError, match="Git-LFS"):
        read_tflite(str(stub))

    with pytest.raises(ValueError):
        read_tflite(b"TFL3TFL3" + b"\xff" * 64)  # bad root offset
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        # valid-looking header, garbage tables
        read_tflite(b"\x10\x00\x00\x00TFL3" + rng.bytes(256))

    from fire_tpu.config import RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine

    cfg = RecognizerConfig(
        detector_type="mediapipe", encoder_model_type="128",
        weights_dir=str(tmp_path),
    ).with_embedding_dim()
    DeviceEngine(cfg)  # must not raise (falls back to random init)


def test_engine_probes_tflite(tmp_path, monkeypatch):
    """DeviceEngine startup probing picks up the reference's
    face_detection_short_range.tflite for the mediapipe slot."""
    from fire_tpu.config import RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine

    _, v = _blaze_params(seed=11)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    write_tflite_blazeface(v["params"], str(wdir / "face_detection_short_range.tflite"))

    cfg = RecognizerConfig(
        detector_type="mediapipe", encoder_model_type="128", weights_dir=str(wdir)
    ).with_embedding_dim()
    engine = DeviceEngine(cfg)
    got = jax.tree.map(np.asarray, engine.det_vars["params"])
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b, np.float32),
                                   rtol=1e-2, atol=1e-3)
