"""BlazeFace short-range topology: structure, torch parity, ONNX round-trip.

The reference's MediaPipe slot runs the TFLite
face_detection_short_range BlazeFace (mediapipe_face_detector.py:28-33)
— native code with no file in the repo.  Fidelity of the re-implemented
topology is proven three ways: (1) the canonical channel progression's
parameter count is pinned as a structural fingerprint; (2) an
independent PyTorch replica of the published architecture (5×5/2 stem,
sixteen single BlazeBlocks, four SSD heads on the 88-ch 16×16 and
96-ch 8×8 maps) produces identical outputs from the same weights;
(3) an ONNX export with the model's layer layout round-trips through
assign_blazeface and the generic executor.
"""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fire_tpu.models import onnx_export as oe
from fire_tpu.models import onnx_import as oi
from fire_tpu.models.blazeface import (
    BLAZE_BLOCKS,
    BlazeFace,
    blaze_anchors,
    blazeface_layer_order,
)


def _blaze_vars(seed=0):
    model = BlazeFace(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 128, 128, 3)))
    return model, jax.tree.map(np.asarray, variables)


def test_param_count_fingerprint():
    """Canonical short-range channel progression — the structural
    fingerprint of the published architecture (conv1 24ch + 16 blocks
    24→...→96 + heads 2/32 on 88ch, 6/96 on 96ch)."""
    model = BlazeFace(dtype=jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 128, 128, 3)))
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes["params"]))

    # independent recount from the published layout
    def conv_n(cin, cout, k, groups=1):
        return (k * k * cin // groups) * cout + cout

    expect = conv_n(3, 24, 5)
    cin = 24
    for feats, _ in BLAZE_BLOCKS:
        expect += conv_n(cin, cin, 5, groups=cin) + conv_n(cin, feats, 1)
        cin = feats
    expect += conv_n(88, 2, 1) + conv_n(88, 32, 1)
    expect += conv_n(96, 6, 1) + conv_n(96, 96, 1)
    assert n == expect
    assert n == 117038  # pinned fingerprint (regression guard)


def test_layer_order_covers_every_param():
    from flax.traverse_util import flatten_dict

    _, variables = _blaze_vars()
    covered = set()
    for kind, path in blazeface_layer_order():
        assert kind == "conv"
        covered |= {path + ("kernel",), path + ("bias",)}
    assert covered == set(flatten_dict(variables["params"]))
    assert "batch_stats" not in variables  # BN folded, as in the TFLite file


# ------------------------------------------------------- torch replica ---


class TBlazeBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.stride = stride
        self.cin, self.cout = cin, cout
        pad = 2 if stride == 1 else 0  # stride-2 pads asymmetrically below
        self.dw = tnn.Conv2d(cin, cin, 5, stride=stride, padding=pad, groups=cin)
        self.pw = tnn.Conv2d(cin, cout, 1)

    def forward(self, x):
        if self.stride == 2:
            h = self.dw(F.pad(x, (1, 2, 1, 2)))
            sc = F.max_pool2d(x, 2)
        else:
            h = self.dw(x)
            sc = x
        h = self.pw(h)
        if self.cout > self.cin:
            sc = F.pad(sc, (0, 0, 0, 0, 0, self.cout - self.cin))
        return F.relu(sc + h)


class TBlazeFace(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 24, 5, stride=2)
        blocks, cin = [], 24
        for feats, stride in BLAZE_BLOCKS:
            blocks.append(TBlazeBlock(cin, feats, stride))
            cin = feats
        self.blocks = tnn.ModuleList(blocks)
        self.classifier_8 = tnn.Conv2d(88, 2, 1)
        self.regressor_8 = tnn.Conv2d(88, 32, 1)
        self.classifier_16 = tnn.Conv2d(96, 6, 1)
        self.regressor_16 = tnn.Conv2d(96, 96, 1)

    def forward(self, x01_nhwc):
        x = torch.permute((x01_nhwc - 0.5) * 2.0, (0, 3, 1, 2))
        x = F.relu(self.conv1(F.pad(x, (1, 2, 1, 2))))
        f16 = None
        for blk in self.blocks:
            if blk.stride == 2 and blk.cout == 96:
                f16 = x
            x = blk(x)
        f8 = x

        def nhwc(t):
            return torch.permute(t, (0, 2, 3, 1))

        b = x.shape[0]
        c8, r8 = nhwc(self.classifier_8(f16)), nhwc(self.regressor_8(f16))
        c16, r16 = nhwc(self.classifier_16(f8)), nhwc(self.regressor_16(f8))
        scores = torch.cat([c8.reshape(b, -1), c16.reshape(b, -1)], dim=1)
        regs = torch.cat([r8.reshape(b, -1, 16), r16.reshape(b, -1, 16)], dim=1)
        return scores, regs


def _copy_flax_to_torch(variables, tmodel):
    from flax.traverse_util import flatten_dict

    p = flatten_dict(variables["params"])

    def setc(conv, path, groups=1):
        k = np.asarray(p[path + ("kernel",)])  # HWIO
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.transpose(k, (3, 2, 0, 1))))
            conv.bias.copy_(torch.from_numpy(np.asarray(p[path + ("bias",)])))

    setc(tmodel.conv1, ("conv1",))
    for i, blk in enumerate(tmodel.blocks):
        setc(blk.dw, (f"b{i + 1}", "dw"), groups=blk.cin)
        setc(blk.pw, (f"b{i + 1}", "pw"))
    for head in ("classifier_8", "regressor_8", "classifier_16", "regressor_16"):
        setc(getattr(tmodel, head), (head,))


def test_torch_replica_forward_parity():
    model, variables = _blaze_vars(seed=3)
    tmodel = TBlazeFace().eval()
    _copy_flax_to_torch(variables, tmodel)

    x = np.random.default_rng(0).random((2, 128, 128, 3)).astype(np.float32)
    js, jr = model.apply(jax.tree.map(jnp.asarray, variables), jnp.asarray(x))
    with torch.no_grad():
        ts, tr = tmodel(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(js), ts.numpy(), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jr), tr.numpy(), atol=2e-4, rtol=1e-3)


# -------------------------------------------------- ONNX round-trips ---


def test_export_assign_roundtrip_exact():
    """export_blazeface(A) --assign_blazeface--> B must reproduce A's
    weights and forward exactly."""
    model, va = _blaze_vars(seed=1)
    onnx_bytes = oe.export_blazeface(va)
    graph = oi.read_onnx_bytes(onnx_bytes)

    _, vb = _blaze_vars(seed=2)  # different init
    params, stats = oi.assign_blazeface(vb["params"], {}, graph)
    assert not stats
    for pa, pb in zip(jax.tree.leaves(va["params"]), jax.tree.leaves({"params": params})):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

    x = jnp.asarray(np.random.default_rng(4).random((1, 128, 128, 3)), jnp.float32)
    sa, ra = model.apply(jax.tree.map(jnp.asarray, va), x)
    sb, rb = model.apply({"params": jax.tree.map(jnp.asarray, params)}, x)
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(rb))


def test_executor_matches_flax_forward():
    """The exported graph run by the generic executor reproduces the
    Flax forward (head maps, NCHW)."""
    from fire_tpu.models.onnx_exec import make_onnx_fn

    model, va = _blaze_vars(seed=5)
    graph = oi.read_onnx_bytes(oe.export_blazeface(va))
    fn, params = make_onnx_fn(graph)

    x = np.random.default_rng(6).random((1, 128, 128, 3)).astype(np.float32)
    outs = fn(jax.tree.map(jnp.asarray, params),
              jnp.transpose((jnp.asarray(x) - 0.5) * 2.0, (0, 3, 1, 2)))
    names = list(graph.outputs)
    got = {n: np.asarray(o) for n, o in zip(names, outs)}

    js, jr = model.apply(jax.tree.map(jnp.asarray, va), jnp.asarray(x))
    c8 = np.transpose(got["classifier_8"], (0, 2, 3, 1)).reshape(1, -1)
    c16 = np.transpose(got["classifier_16"], (0, 2, 3, 1)).reshape(1, -1)
    scores = np.concatenate([c8, c16], axis=1)
    np.testing.assert_allclose(np.asarray(js), scores, atol=2e-4, rtol=1e-3)


def test_engine_imports_blazeface_onnx(tmp_path):
    """weights_dir probing: a real-topology blazeface.onnx imports into
    the Flax fast path at engine startup."""
    from fire_tpu.config import EngineConfig, RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine

    _, va = _blaze_vars(seed=7)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    (wdir / "blazeface.onnx").write_bytes(oe.export_blazeface(va))

    cfg = RecognizerConfig(
        detector_type="mediapipe",
        encoder_model_type="128",
        weights_dir=str(wdir),
        engine=EngineConfig(detect_size=(64, 64), max_faces=8, max_encode=4),
    ).with_embedding_dim()
    eng = DeviceEngine(cfg)
    for pa, pb in zip(jax.tree.leaves(va["params"]),
                      jax.tree.leaves(eng.det_vars["params"])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    # the jitted detect path runs with the imported weights
    frame = np.zeros((64, 64, 3), np.uint8)
    d = eng.detect(frame)
    assert np.asarray(d.mask).shape == (8,)


def test_anchor_count_896():
    a = blaze_anchors()
    assert a.shape == (896, 2)
    assert np.all((a >= 0) & (a <= 1))
