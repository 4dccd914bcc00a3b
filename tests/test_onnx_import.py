"""Tests for the dependency-free ONNX reader (fire_tpu.models.onnx_import)."""

import struct

import numpy as np
import pytest

from fire_tpu.models import onnx_import as oi


# --- minimal protobuf writer (test-only) --------------------------------------

def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        out += bytes([b | (0x80 if v else 0)])
        if not v:
            return out


def _field(fnum: int, wtype: int, payload: bytes) -> bytes:
    tag = _varint((fnum << 3) | wtype)
    if wtype == 2:
        return tag + _varint(len(payload)) + payload
    return tag + payload


def _len_field(fnum: int, payload: bytes) -> bytes:
    return _field(fnum, 2, payload)


def _make_tensor(name: str, arr: np.ndarray) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += _field(1, 0, _varint(d))
    msg += _field(2, 0, _varint(1))  # float32
    msg += _len_field(8, name.encode())
    msg += _len_field(9, arr.astype(np.float32).tobytes())
    return msg


def _make_node(op: str, inputs, outputs) -> bytes:
    msg = b""
    for i in inputs:
        msg += _len_field(1, i.encode())
    for o in outputs:
        msg += _len_field(2, o.encode())
    msg += _len_field(4, op.encode())
    return msg


def _make_model(nodes: bytes, inits: bytes) -> bytes:
    graph = nodes + inits
    return _len_field(7, graph)


def test_read_onnx_roundtrip(tmp_path):
    w = np.arange(2 * 3 * 3 * 3, dtype=np.float32).reshape(2, 3, 3, 3)  # OIHW
    b = np.array([0.5, -0.5], np.float32)
    nodes = _make_node("Conv", ["x", "conv_w", "conv_b"], ["y"])
    nodes += _make_node("Relu", ["y"], ["z"])
    inits = _len_field(5, _make_tensor("conv_w", w)) + _len_field(5, _make_tensor("conv_b", b))
    model = _make_model(_len_field(1, nodes[: len(_make_node('Conv', ['x','conv_w','conv_b'], ['y']))]), b"")
    # build properly: each node is its own field
    n1 = _len_field(1, _make_node("Conv", ["x", "conv_w", "conv_b"], ["y"]))
    n2 = _len_field(1, _make_node("Relu", ["y"], ["z"]))
    model = _make_model(n1 + n2, inits)

    path = tmp_path / "tiny.onnx"
    path.write_bytes(model)
    g = oi.read_onnx(str(path))
    assert [n.op_type for n in g.nodes] == ["Conv", "Relu"]
    assert g.nodes[0].inputs == ["x", "conv_w", "conv_b"]
    np.testing.assert_array_equal(g.initializers["conv_w"], w)
    np.testing.assert_array_equal(g.initializers["conv_b"], b)

    stream = oi.weight_stream(g)
    assert len(stream) == 1 and stream[0][0] == "Conv"
    hwio = oi.conv_to_hwio(stream[0][1][0])
    assert hwio.shape == (3, 3, 3, 2)


def test_lfs_stub_detection(tmp_path):
    p = tmp_path / "stub.onnx"
    p.write_bytes(b"version https://git-lfs.github.com/spec/v1\noid sha256:abc\nsize 1\n")
    with pytest.raises(FileNotFoundError, match="Git-LFS pointer"):
        oi.read_onnx(str(p))


def test_reference_weights_are_stubs():
    """Documents why live ONNX parity is impossible in this snapshot."""
    with pytest.raises(FileNotFoundError, match="Git-LFS pointer"):
        oi.read_onnx("/root/reference/weights/facenet128.onnx")
