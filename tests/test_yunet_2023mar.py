"""YuNet 2023mar topology: structure, torch parity, ONNX round-trip.

The reference runs OpenCV-zoo ``face_detection_yunet_2023mar.onnx``
(yunet.py:20-28); the real file is an LFS stub, so fidelity is proven
three ways: (1) the canonical-width parameter count matches the
published 75,856 exactly; (2) an independent PyTorch replica of
libfacedetection's ConvDPUnit/Conv_head/Conv4layerBlock modules
produces identical outputs from the same weights; (3) an ONNX export
with the real file's I/O contract round-trips through assign_yunet and
the generic executor.
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
from fire_tpu.models.yunet import YuNet, yunet_layer_order


def _yunet_vars(width=8, seed=0, hw=(64, 64)):
    model = YuNet(width=width, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, *hw, 3)))
    variables = jax.tree.map(np.asarray, variables)
    # randomize BN stats so BN math is exercised
    rng = np.random.default_rng(seed + 50)
    from flax.traverse_util import flatten_dict, unflatten_dict
    flat = flatten_dict(variables["batch_stats"])
    for k in flat:
        if k[-1] == "mean":
            flat[k] = rng.normal(0, 0.3, flat[k].shape).astype(np.float32)
        else:
            flat[k] = rng.uniform(0.5, 2.0, flat[k].shape).astype(np.float32)
    variables["batch_stats"] = unflatten_dict(flat)
    return model, variables


def test_param_count_matches_published_75856():
    """Canonical widths must hit the 2023mar model's exact trainable
    parameter count — the structural fingerprint of the architecture."""
    model = YuNet(width=64, dtype=jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes["params"]))
    assert n == 75856


def test_layer_order_covers_every_param():
    from flax.traverse_util import flatten_dict

    _, variables = _yunet_vars()
    covered = set()
    for entry in yunet_layer_order():
        kind, path = entry[0], entry[1]
        if kind == "conv":
            covered |= {path + ("kernel",), path + ("bias",)}
        elif kind == "bn":
            covered |= {path + ("scale",), path + ("bias",),
                        path + ("mean",), path + ("var",)}
    leaves = set(flatten_dict(variables["params"])) | set(flatten_dict(variables["batch_stats"]))
    assert covered == leaves


# ------------------------------------------------------- torch replica ---


class TConvDPUnit(tnn.Module):
    def __init__(self, cin, cout, with_bn_relu=True):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 1)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1, groups=cout)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-5) if with_bn_relu else None

    def forward(self, x):
        x = self.conv2(self.conv1(x))
        if self.bn is not None:
            x = F.relu(self.bn(x))
        return x


def _load_conv(tconv, p, path):
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.transpose(np.asarray(p[path + ("kernel",)]), (3, 2, 0, 1))))
        tconv.bias.copy_(torch.from_numpy(np.asarray(p[path + ("bias",)])))


def _load_bn(tbn, p, s, path):
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(p[path + ("scale",)])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(p[path + ("bias",)])))
        tbn.running_mean.copy_(torch.from_numpy(np.asarray(s[path + ("mean",)])))
        tbn.running_var.copy_(torch.from_numpy(np.asarray(s[path + ("var",)])))


def _load_dp(tdp, p, s, path):
    _load_conv(tdp.conv1, p, path + ("conv1",))
    _load_conv(tdp.conv2, p, path + ("conv2",))
    if tdp.bn is not None:
        _load_bn(tdp.bn, p, s, path + ("bn",))


def _torch_yunet(variables, x255_nchw, width=8):
    """Independent torch forward of the 2023mar architecture."""
    from flax.traverse_util import flatten_dict

    p = flatten_dict(variables["params"])
    s = flatten_dict(variables["batch_stats"])
    w = width
    stem = max(w // 4, 2)

    modules = []

    def track(m):
        modules.append(m)
        return m

    conv1 = track(tnn.Conv2d(3, stem, 3, stride=2, padding=1))
    bn1 = track(tnn.BatchNorm2d(stem, eps=1e-5))
    _load_conv(conv1, p, ("model0", "conv1"))
    _load_bn(bn1, p, s, ("model0", "bn1"))
    dp0 = track(TConvDPUnit(stem, stem))
    _load_dp(dp0, p, s, ("model0", "conv2"))

    def block(name, cin, cout):
        b1 = track(TConvDPUnit(cin, cin))
        b2 = track(TConvDPUnit(cin, cout))
        _load_dp(b1, p, s, (name, "conv1"))
        _load_dp(b2, p, s, (name, "conv2"))
        return lambda t: b2(b1(t))

    m1 = block("model1", stem, w)
    m2 = block("model2", w, w)
    m3 = block("model3", w, w)
    m4 = block("model4", w, w)
    m5 = block("model5", w, w)
    necks = {}
    for n in ("neck0", "neck1", "neck2"):
        necks[n] = track(TConvDPUnit(w, w))
        _load_dp(necks[n], p, s, (n,))
    heads = {}
    for st in (8, 16, 32):
        feat = track(TConvDPUnit(w, w))
        _load_dp(feat, p, s, (f"head_s{st}", "feat"))
        outs = {}
        for o, ch in (("cls", 1), ("obj", 1), ("box", 4), ("kps", 10)):
            u = track(TConvDPUnit(w, ch, with_bn_relu=False))
            _load_dp(u, p, s, (f"head_s{st}", o))
            outs[o] = u
        heads[st] = (feat, outs)

    for m in modules:
        m.eval()

    with torch.no_grad():
        t = torch.from_numpy(x255_nchw)
        t = dp0(F.relu(bn1(conv1(t))))
        t = F.max_pool2d(t, 2)
        t = m2(m1(t))
        t = F.max_pool2d(t, 2)
        c3 = m3(t)
        c4 = m4(F.max_pool2d(c3, 2))
        c5 = m5(F.max_pool2d(c4, 2))
        p5 = necks["neck2"](c5)
        p4 = necks["neck1"](c4 + F.interpolate(p5, scale_factor=2, mode="nearest"))
        p3 = necks["neck0"](c3 + F.interpolate(p4, scale_factor=2, mode="nearest"))
        result = {}
        for st, feat_map in ((8, p3), (16, p4), (32, p5)):
            feat, outs = heads[st]
            f = feat(feat_map)
            result[st] = (
                torch.sigmoid(outs["cls"](f)), torch.sigmoid(outs["obj"](f)),
                outs["box"](f), outs["kps"](f),
            )
    return result


def test_yunet_flax_vs_torch(rng):
    """Same weights through Flax/XLA and an independent torch replica:
    all 12 head maps agree (padding conventions, BN, nearest upsample,
    pooling all covered)."""
    model, variables = _yunet_vars(width=8, hw=(64, 64))
    x01 = rng.random((1, 64, 64, 3)).astype(np.float32)
    want = _torch_yunet(variables, np.transpose(x01 * 255.0, (0, 3, 1, 2)), width=8)
    got = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x01))
    for st in (8, 16, 32):
        for i, name in enumerate(("cls", "obj", "box", "kps")):
            ours = np.asarray(got[st][i])  # NHWC
            theirs = want[st][i].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(
                ours, theirs, rtol=1e-3, atol=1e-4,
                err_msg=f"stride {st} head {name}")


# ------------------------------------------------------ ONNX round-trip ---


def test_assign_yunet_roundtrip_exact(rng):
    """export → ONNX → assign_yunet into a different init → identical
    head outputs: the property the real 2023mar file needs."""
    model, variables = _yunet_vars(width=8, seed=0)
    blob = oe.export_yunet(variables, width=8, image_hw=(64, 64))
    graph = oi.read_onnx_bytes(blob)

    _, fresh = _yunet_vars(width=8, seed=9)
    params, stats = oi.assign_yunet(fresh["params"], fresh["batch_stats"], graph)
    imported = {"params": params, "batch_stats": stats}

    x01 = rng.random((1, 64, 64, 3)).astype(np.float32)
    want = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x01))
    got = model.apply(jax.tree.map(jnp.asarray, imported), jnp.asarray(x01))
    for st in (8, 16, 32):
        for i in range(4):
            np.testing.assert_allclose(np.asarray(got[st][i]), np.asarray(want[st][i]),
                                       rtol=1e-5, atol=1e-6)


def test_executor_runs_yunet_export(rng):
    """The exported file (the real file's op set: grouped Conv, BN,
    Resize-nearest, Transpose/Reshape, Sigmoid) runs under the generic
    executor and matches the Flax forward — the guaranteed fallback for
    any real weight file whose topology might differ."""
    from fire_tpu.models.onnx_exec import OnnxModel

    model, variables = _yunet_vars(width=8, seed=3)
    blob = oe.export_yunet(variables, width=8, image_hw=(64, 64))
    m = OnnxModel(oi.read_onnx_bytes(blob))
    assert m.input_names == ["input"]
    assert m.output_names == [
        "cls_8", "obj_8", "bbox_8", "kps_8",
        "cls_16", "obj_16", "bbox_16", "kps_16",
        "cls_32", "obj_32", "bbox_32", "kps_32",
    ]

    x01 = rng.random((1, 64, 64, 3)).astype(np.float32)
    outs = m(np.transpose(x01 * 255.0, (0, 3, 1, 2)))
    want = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x01))
    k = 0
    for st in (8, 16, 32):
        for i, ch in ((0, 1), (1, 1), (2, 4), (3, 10)):
            flax_flat = np.asarray(want[st][i]).reshape(1, -1, ch)
            np.testing.assert_allclose(outs[k], flax_flat, rtol=1e-3, atol=1e-5,
                                       err_msg=f"stride {st} output {k}")
            k += 1
