"""ONNX → Flax parameter import (dependency-free).

The reference ships its networks as ONNX files
(weights/facenet{128,512}.onnx, weights/retinaface.onnx,
weights/face_detection_yunet_2023mar.onnx — facenet_gpu.py:14,
retinaface_face_detector.py:51) and runs them with ONNXRuntime.  Here
the graphs are re-implemented natively (fire_tpu.models.*) and only the
*weights* need importing.  Because the build environment has no ``onnx``
package, this module includes a minimal protobuf wire-format reader
sufficient to pull node order and initializer tensors out of a
ModelProto — no third-party dependency.

Note: the /root/reference/weights snapshot contains Git-LFS pointer
stubs, not real weights (SURVEY.md §7); :func:`read_onnx` detects this
and raises a clear error.  When real files are supplied,
:func:`assign_facenet` maps tensors into :class:`fire_tpu.models.FaceNet`
by graph execution order (Conv/BatchNormalization/Gemm traversal), the
same order Flax materialises our parameters in.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------- protobuf ---

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _scan(buf: bytes):
    """Yield (field_number, wire_type, value_bytes_or_int) over a message."""
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == _WT_VARINT:
            val, pos = _read_varint(buf, pos)
        elif wtype == _WT_I64:
            val = buf[pos : pos + 8]
            pos += 8
        elif wtype == _WT_LEN:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == _WT_I32:
            val = buf[pos : pos + 4]
            pos += 4
        else:  # pragma: no cover - groups unused by onnx
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


# ONNX TensorProto.DataType → numpy
_ONNX_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


@dataclass
class OnnxNode:
    op_type: str
    name: str
    inputs: List[str] = field(default_factory=list)
    outputs: List[str] = field(default_factory=list)


@dataclass
class OnnxGraph:
    nodes: List[OnnxNode]
    initializers: Dict[str, np.ndarray]


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = np.float32
    raw = b""
    floats: List[float] = []
    ints: List[int] = []
    name = ""
    for fnum, wtype, val in _scan(buf):
        if fnum == 1:  # dims (repeated int64, varint)
            dims.append(val)
        elif fnum == 2:  # data_type
            dtype = _ONNX_DTYPES.get(val, np.float32)
        elif fnum == 4:  # float_data (packed)
            floats.extend(struct.unpack(f"<{len(val)//4}f", val))
        elif fnum == 7:  # int64_data (packed varints)
            pos = 0
            while pos < len(val):
                v, pos = _read_varint(val, pos)
                ints.append(v)
        elif fnum == 8:  # name
            name = val.decode()
        elif fnum == 9:  # raw_data
            raw = val
    if raw:
        arr = np.frombuffer(raw, dtype=dtype).copy()
    elif floats:
        arr = np.asarray(floats, np.float32)
    elif ints:
        arr = np.asarray(ints, np.int64).astype(dtype)
    else:
        arr = np.zeros(0, dtype)
    if dims:
        arr = arr.reshape(dims)
    return name, arr


def _parse_node(buf: bytes) -> OnnxNode:
    node = OnnxNode(op_type="", name="")
    for fnum, wtype, val in _scan(buf):
        if fnum == 1:
            node.inputs.append(val.decode())
        elif fnum == 2:
            node.outputs.append(val.decode())
        elif fnum == 3:
            node.name = val.decode()
        elif fnum == 4:
            node.op_type = val.decode()
    return node


def _parse_graph(buf: bytes) -> OnnxGraph:
    nodes: List[OnnxNode] = []
    inits: Dict[str, np.ndarray] = {}
    for fnum, wtype, val in _scan(buf):
        if fnum == 1:  # node
            nodes.append(_parse_node(val))
        elif fnum == 5:  # initializer
            name, arr = _parse_tensor(val)
            inits[name] = arr
    return OnnxGraph(nodes, inits)


def read_onnx(path: str) -> OnnxGraph:
    """Parse an ONNX ModelProto file into (nodes, initializers)."""
    with open(path, "rb") as f:
        data = f.read()
    if data.startswith(b"version https://git-lfs"):
        raise FileNotFoundError(
            f"{path} is a Git-LFS pointer stub, not a real ONNX file — "
            "fetch the actual weights to enable import (SURVEY.md §7)."
        )
    for fnum, wtype, val in _scan(data):
        if fnum == 7 and wtype == _WT_LEN:  # ModelProto.graph
            return _parse_graph(val)
    raise ValueError(f"{path}: no GraphProto found (not an ONNX model?)")


# ----------------------------------------------------------------- mapping ---


def weight_stream(graph: OnnxGraph) -> List[Tuple[str, List[np.ndarray]]]:
    """Walk nodes in graph order; yield (op_type, [weight tensors]) for
    every parameterised node.  This is the order-based key used to zip
    ONNX weights onto our Flax modules (which declare parameters in
    execution order too)."""
    out = []
    for node in graph.nodes:
        ws = [graph.initializers[i] for i in node.inputs if i in graph.initializers]
        if node.op_type in ("Conv", "BatchNormalization", "Gemm", "MatMul", "PRelu") and ws:
            out.append((node.op_type, ws))
    return out


def conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """ONNX OIHW conv kernel → Flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def assign_facenet(params: dict, batch_stats: dict, graph: OnnxGraph) -> Tuple[dict, dict]:
    """Map an ONNX FaceNet export onto :class:`FaceNet` variables.

    Strategy: flatten our (params, batch_stats) trees in definition
    order and the ONNX weight stream in graph order; zip by op kind
    (Conv → kernel[+bias], BatchNormalization → (scale), bias, mean,
    var; Gemm/MatMul → dense kernel).  Shape equality is asserted at
    every step so a topology mismatch fails loudly instead of silently
    producing garbage embeddings.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat_p = flatten_dict(params)
    flat_s = flatten_dict(batch_stats)
    stream = weight_stream(graph)

    # Our per-layer order: conv kernel (maybe +bias), then, for ConvBn,
    # its BN (bias, mean, var).  Flax flatten_dict is sorted; rebuild
    # execution order from the ONNX side instead: iterate the stream and
    # consume matching params by shape from shape-indexed pools.
    def pool(flat):
        by_shape: Dict[Tuple[int, ...], List[Tuple[tuple, np.ndarray]]] = {}
        for k in sorted(flat):
            by_shape.setdefault(tuple(flat[k].shape), []).append(k)
        return by_shape

    new_p, new_s = dict(flat_p), dict(flat_s)
    p_pool, s_pool = pool(flat_p), pool(flat_s)

    def take(pool_, shape, tree, new):
        keys = pool_.get(tuple(shape))
        if not keys:
            raise ValueError(f"no unassigned param of shape {shape}")
        return keys.pop(0)

    for op, ws in stream:
        if op == "Conv":
            kern = conv_to_hwio(ws[0])
            k = take(p_pool, kern.shape, flat_p, new_p)
            new_p[k] = kern.astype(np.float32)
            if len(ws) > 1:
                k = take(p_pool, ws[1].shape, flat_p, new_p)
                new_p[k] = ws[1].astype(np.float32)
        elif op == "BatchNormalization":
            scale, bias, mean, var = ws[:4]
            # our BNs use use_scale=False for FaceNet; scale==1 expected
            k = take(p_pool, bias.shape, flat_p, new_p)
            new_p[k] = bias.astype(np.float32)
            k = take(s_pool, mean.shape, flat_s, new_s)
            new_s[k] = mean.astype(np.float32)
            k = take(s_pool, var.shape, flat_s, new_s)
            new_s[k] = var.astype(np.float32)
        elif op in ("Gemm", "MatMul"):
            w = ws[0]
            if w.ndim == 2:
                wt = w.T if w.shape[0] != w.shape[1] else w
                k = take(p_pool, wt.shape, flat_p, new_p)
                new_p[k] = wt.astype(np.float32)

    return unflatten_dict(new_p), unflatten_dict(new_s)
