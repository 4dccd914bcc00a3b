"""ONNX executor (fire_tpu.models.onnx_exec) vs PyTorch ground truth.

The executor is the TPU replacement for ONNXRuntime (SURVEY.md §2.3):
any real weight file must run with exact topology.  Fixtures are built
with fire_tpu.models.onnx_export from torch modules' weights; torch's
forward is the independent numeric oracle.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fire_tpu.models import onnx_export as oe
from fire_tpu.models import onnx_import as oi
from fire_tpu.models.onnx_exec import OnnxModel, make_onnx_fn


def _np(t):
    return t.detach().numpy()


def _run(builder: oe.GraphBuilder, *inputs):
    graph = oi.read_onnx_bytes(builder.model_bytes())
    model = OnnxModel(graph)
    return model(*inputs)


def test_conv_bn_relu_pool_gemm_vs_torch(rng):
    """The CNN op core: strided/padded conv, BN (running stats), ReLU,
    ceil-mode max pool, depthwise conv, GAP, Gemm with bias+transB."""
    torch.manual_seed(0)
    conv1 = tnn.Conv2d(3, 8, 3, stride=2, padding=1)
    bn = tnn.BatchNorm2d(8)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.3)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1.0, 0.2)
        bn.bias.normal_(0, 0.2)
    dw = tnn.Conv2d(8, 8, 3, padding=1, groups=8)
    fc = tnn.Linear(8, 5)

    x = rng.random((2, 3, 15, 15)).astype(np.float32)
    with torch.no_grad():
        t = conv1(torch.from_numpy(x))
        t = bn(t)
        t = F.relu(t)
        t = F.max_pool2d(t, 2, 2, ceil_mode=True)
        t = F.leaky_relu(dw(t), 0.1)
        t = t.mean(dim=(2, 3))
        want = _np(fc(t))

    g = oe.GraphBuilder()
    g.add_input("x", (2, 3, 15, 15))
    y = g.add_node("Conv", ["x", g.add_init("w1", _np(conv1.weight)),
                            g.add_init("b1", _np(conv1.bias))],
                   strides=[2, 2], pads=[1, 1, 1, 1])
    y = g.add_node("BatchNormalization",
                   [y, g.add_init("g", _np(bn.weight)), g.add_init("b", _np(bn.bias)),
                    g.add_init("m", _np(bn.running_mean)), g.add_init("v", _np(bn.running_var))],
                   epsilon=bn.eps)
    y = g.add_node("Relu", [y])
    y = g.add_node("MaxPool", [y], kernel_shape=[2, 2], strides=[2, 2], ceil_mode=1)
    y = g.add_node("Conv", [y, g.add_init("wd", _np(dw.weight)),
                            g.add_init("bd", _np(dw.bias))],
                   pads=[1, 1, 1, 1], group=8)
    y = g.add_node("LeakyRelu", [y], alpha=0.1)
    y = g.add_node("GlobalAveragePool", [y])
    y = g.add_node("Flatten", [y], axis=1)
    y = g.add_node("Gemm", [y, g.add_init("wf", _np(fc.weight)),
                            g.add_init("bf", _np(fc.bias))], transB=1)
    g.add_node("Identity", [y], outputs=["out"])
    g.add_output("out", (2, 5))

    (got,) = _run(g, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fpn_resize_concat_softmax_vs_torch(rng):
    """Detector-graph plumbing: nearest ×2 Resize, Concat, Add,
    Sigmoid/Softmax, Transpose+Reshape (the YuNet/RetinaFace head
    pattern)."""
    torch.manual_seed(1)
    lat = tnn.Conv2d(6, 4, 1)
    x = rng.random((1, 6, 4, 4)).astype(np.float32)

    with torch.no_grad():
        p5 = lat(torch.from_numpy(x))
        up = F.interpolate(p5, scale_factor=2, mode="nearest")
        cat = torch.cat([up, up], dim=1)
        t = torch.sigmoid(cat) + F.softmax(cat, dim=1)
        want = _np(t.permute(0, 2, 3, 1).reshape(1, -1, 8))

    g = oe.GraphBuilder()
    g.add_input("x", (1, 6, 4, 4))
    p5 = g.add_node("Conv", ["x", g.add_init("w", _np(lat.weight)),
                             g.add_init("b", _np(lat.bias))])
    scales = g.add_init("scales", np.asarray([1.0, 1.0, 2.0, 2.0], np.float32))
    roi = g.add_init("roi", np.zeros(0, np.float32))
    up = g.add_node("Resize", [p5, roi, scales], mode="nearest")
    cat = g.add_node("Concat", [up, up], axis=1)
    s = g.add_node("Sigmoid", [cat])
    sm = g.add_node("Softmax", [cat], axis=1)
    y = g.add_node("Add", [s, sm])
    y = g.add_node("Transpose", [y], perm=[0, 2, 3, 1])
    shape = g.add_init("shape", np.asarray([1, -1, 8], np.int64))
    y = g.add_node("Reshape", [y, shape])
    g.add_node("Identity", [y], outputs=["out"])
    g.add_output("out")

    (got,) = _run(g, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_shape_plumbing_constant_folds(rng):
    """Shape→Gather→Concat→Reshape chains (what real exporters emit)
    must fold to static shapes — Reshape never sees a traced tensor."""
    x = rng.random((2, 3, 4, 4)).astype(np.float32)
    g = oe.GraphBuilder()
    g.add_input("x", (2, 3, 4, 4))
    shp = g.add_node("Shape", ["x"])
    n = g.add_node("Gather", [shp, g.add_init("i0", np.asarray(0, np.int64))], axis=0)
    n1 = g.add_node("Unsqueeze", [n], axes=[0])
    rest = g.add_init("rest", np.asarray([-1], np.int64))
    tgt = g.add_node("Concat", [n1, rest], axis=0)
    y = g.add_node("Reshape", ["x", tgt])
    g.add_node("Identity", [y], outputs=["out"])
    g.add_output("out")
    (got,) = _run(g, x)
    np.testing.assert_allclose(got, x.reshape(2, -1))


def test_slice_split_pad_clip_vs_torch(rng):
    x = rng.random((1, 8, 6, 6)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        a, b = torch.split(t, [3, 5], dim=1)
        a = F.pad(a, (1, 1, 1, 1), value=0.5)
        a = torch.clamp(a, 0.1, 0.9)
        want_a, want_b = _np(a), _np(b[:, :, 1:5, ::2])

    g = oe.GraphBuilder()
    g.add_input("x", (1, 8, 6, 6))
    g.add_node("Split", ["x"], outputs=["a", "b"], axis=1, split=[3, 5])
    pads = g.add_init("pads", np.asarray([0, 0, 1, 1, 0, 0, 1, 1], np.int64))
    a = g.add_node("Pad", ["a", pads, g.add_init("cv", np.asarray(0.5, np.float32))],
                   mode="constant")
    a = g.add_node("Clip", [a, g.add_init("lo", np.asarray(0.1, np.float32)),
                            g.add_init("hi", np.asarray(0.9, np.float32))])
    b = g.add_node("Slice", ["b",
                             g.add_init("st", np.asarray([1, 0], np.int64)),
                             g.add_init("en", np.asarray([5, 2**31 - 1], np.int64)),
                             g.add_init("ax", np.asarray([2, 3], np.int64)),
                             g.add_init("sp", np.asarray([1, 2], np.int64))])
    g.add_node("Identity", [a], outputs=["outa"])
    g.add_node("Identity", [b], outputs=["outb"])
    g.add_output("outa")
    g.add_output("outb")
    got_a, got_b = _run(g, x)
    np.testing.assert_allclose(got_a, want_a, rtol=1e-6)
    np.testing.assert_allclose(got_b, want_b, rtol=1e-6)


def test_avgpool_and_reduce_vs_torch(rng):
    x = rng.random((2, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        a = F.avg_pool2d(t, 3, 2, padding=1, count_include_pad=False)
        want = _np(a.max(dim=1, keepdim=True).values)
    g = oe.GraphBuilder()
    g.add_input("x", (2, 4, 8, 8))
    y = g.add_node("AveragePool", ["x"], kernel_shape=[3, 3], strides=[2, 2],
                   pads=[1, 1, 1, 1], count_include_pad=0)
    y = g.add_node("ReduceMax", [y], axes=[1], keepdims=1)
    g.add_node("Identity", [y], outputs=["out"])
    g.add_output("out")
    (got,) = _run(g, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_executor_runs_facenet_export(rng):
    """Full-graph check: the exported FaceNet ONNX runs under the
    executor and matches the Flax forward ≤1e-3 cosine (the SURVEY §7
    parity bar) on the NHWC [0,1] input contract."""
    from tests.test_onnx_import import _tiny_facenet_vars

    model, variables = _tiny_facenet_vars(seed=2)
    blob = oe.export_facenet(variables, embed_dim=32, depths=(1, 1, 1), stem_width=8)
    graph = oi.read_onnx_bytes(blob)
    onnx_model = OnnxModel(graph)
    assert onnx_model.input_names == ["input"]
    assert onnx_model.output_names == ["embedding"]

    x = rng.random((1, 160, 160, 3)).astype(np.float32)
    want = np.asarray(model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x)))
    (got,) = onnx_model(x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    for a, b in zip(got, want):
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 1 - 1e-3


def test_make_onnx_fn_is_jittable(rng):
    """make_onnx_fn returns a function whose params ride as a pytree
    argument (not baked constants) — jit + device_put work."""
    g = oe.GraphBuilder()
    g.add_input("x", (1, 3, 8, 8))
    w = rng.normal(0, 0.2, (4, 3, 3, 3)).astype(np.float32)
    y = g.add_node("Conv", ["x", g.add_init("w", w)], pads=[1, 1, 1, 1])
    y = g.add_node("Relu", [y])
    g.add_node("Identity", [y], outputs=["out"])
    g.add_output("out")
    graph = oi.read_onnx_bytes(g.model_bytes())
    fn, params = make_onnx_fn(graph)
    assert "w" in params
    jitted = jax.jit(lambda p, x: fn(p, x))
    x = rng.random((1, 3, 8, 8)).astype(np.float32)
    (out,) = jitted(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(np.transpose(w, (2, 3, 1, 0))), (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    np.testing.assert_allclose(np.asarray(out), np.maximum(np.asarray(ref), 0),
                               rtol=1e-4, atol=1e-5)
