"""FaceNet embedding network — Inception-ResNet-v1 in Flax (NHWC).

TPU-native replacement for the reference's ONNXRuntime FaceNet-128/512
sessions (facenet_gpu.py:89-129).  Input contract matches the reference
exactly: NHWC float in [0,1], 160×160×3 (modules/encoder.py:19-27);
output is the unnormalized bottleneck embedding (callers L2-normalize,
face_recognition.py:225-229).

The topology is the standard Inception-ResNet-v1 used by the
facenet128/512 ONNX exports (stem → 5×Block35 → ReductionA → 10×Block17
→ ReductionB → 5×Block8 → Block8(scale=1, linear) → GAP → Dense →
BatchNorm bottleneck).  Depths/widths are configurable so tests can run
tiny variants; weight import from the reference ONNX files is handled by
:mod:`fire_tpu.models.onnx_import` when those files are available (the
snapshot in /root/reference/weights contains only Git-LFS stubs).

TPU notes: all convs are NHWC so XLA tiles them onto the MXU; compute
runs in bfloat16 with f32 params and f32 residual adds; the entire
forward is a single jit with static shapes (batch the faces, never loop
them — the reference encoded one face per session.run).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBn(nn.Module):
    """Conv(no bias) → BatchNorm(no scale, eps 1e-3) → optional ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    relu: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.995,
            epsilon=1e-3,
            use_scale=False,
            dtype=self.dtype,
            name="bn",
        )(x)
        return nn.relu(x) if self.relu else x


class Block35(nn.Module):
    """Inception-ResNet-A residual block (scale 0.17)."""

    width: int = 32
    scale: float = 0.17
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        b0 = ConvBn(w, (1, 1), dtype=self.dtype, name="b0")(x, train)
        b1 = ConvBn(w, (1, 1), dtype=self.dtype, name="b1_0")(x, train)
        b1 = ConvBn(w, (3, 3), dtype=self.dtype, name="b1_1")(b1, train)
        b2 = ConvBn(w, (1, 1), dtype=self.dtype, name="b2_0")(x, train)
        b2 = ConvBn(w, (3, 3), dtype=self.dtype, name="b2_1")(b2, train)
        b2 = ConvBn(w, (3, 3), dtype=self.dtype, name="b2_2")(b2, train)
        up = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, name="up")(up)
        return nn.relu(x + self.scale * up)


class Block17(nn.Module):
    """Inception-ResNet-B residual block (scale 0.10)."""

    width: int = 128
    scale: float = 0.10
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        b0 = ConvBn(w, (1, 1), dtype=self.dtype, name="b0")(x, train)
        b1 = ConvBn(w, (1, 1), dtype=self.dtype, name="b1_0")(x, train)
        b1 = ConvBn(w, (1, 7), dtype=self.dtype, name="b1_1")(b1, train)
        b1 = ConvBn(w, (7, 1), dtype=self.dtype, name="b1_2")(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, name="up")(up)
        return nn.relu(x + self.scale * up)


class Block8(nn.Module):
    """Inception-ResNet-C residual block (scale 0.20; final copy is
    scale 1.0 with no activation)."""

    width: int = 192
    scale: float = 0.20
    relu: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        b0 = ConvBn(w, (1, 1), dtype=self.dtype, name="b0")(x, train)
        b1 = ConvBn(w, (1, 1), dtype=self.dtype, name="b1_0")(x, train)
        b1 = ConvBn(w, (1, 3), dtype=self.dtype, name="b1_1")(b1, train)
        b1 = ConvBn(w, (3, 1), dtype=self.dtype, name="b1_2")(b1, train)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=self.dtype, name="up")(up)
        out = x + self.scale * up
        return nn.relu(out) if self.relu else out


class ReductionA(nn.Module):
    width: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # canonical widths at w=256: b0 384, b1 192→192→256
        w = self.width
        b0 = ConvBn(w * 3 // 2, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="b0")(x, train)
        b1 = ConvBn(w * 3 // 4, (1, 1), dtype=self.dtype, name="b1_0")(x, train)
        b1 = ConvBn(w * 3 // 4, (3, 3), dtype=self.dtype, name="b1_1")(b1, train)
        b1 = ConvBn(w, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="b1_2")(b1, train)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class ReductionB(nn.Module):
    width: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        # canonical widths at w=256: branch convs 256, b0_1 384
        w = self.width
        b0 = ConvBn(w, (1, 1), dtype=self.dtype, name="b0_0")(x, train)
        b0 = ConvBn(w * 3 // 2, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="b0_1")(b0, train)
        b1 = ConvBn(w, (1, 1), dtype=self.dtype, name="b1_0")(x, train)
        b1 = ConvBn(w, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="b1_1")(b1, train)
        b2 = ConvBn(w, (1, 1), dtype=self.dtype, name="b2_0")(x, train)
        b2 = ConvBn(w, (3, 3), dtype=self.dtype, name="b2_1")(b2, train)
        b2 = ConvBn(w, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype, name="b2_2")(b2, train)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class FaceNet(nn.Module):
    """Inception-ResNet-v1 producing a ``embed_dim`` bottleneck embedding."""

    embed_dim: int = 128
    depths: Sequence[int] = (5, 10, 5)
    stem_width: int = 32
    dtype: Dtype = jnp.bfloat16
    dropout_rate: float = 0.0  # inference default; train step overrides

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) float in [0, 1] (modules/encoder.py:21)."""
        sw = self.stem_width
        dt = self.dtype
        x = x.astype(dt)
        # Stem (160 → 17 spatial for the canonical 160×160 input)
        x = ConvBn(sw, (3, 3), (2, 2), "VALID", dtype=dt, name="stem0")(x, train)
        x = ConvBn(sw, (3, 3), padding="VALID", dtype=dt, name="stem1")(x, train)
        x = ConvBn(sw * 2, (3, 3), dtype=dt, name="stem2")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        x = ConvBn(int(sw * 2.5), (1, 1), padding="VALID", dtype=dt, name="stem3")(x, train)
        x = ConvBn(sw * 6, (3, 3), padding="VALID", dtype=dt, name="stem4")(x, train)
        x = ConvBn(sw * 8, (3, 3), (2, 2), "VALID", dtype=dt, name="stem5")(x, train)

        for i in range(self.depths[0]):
            x = Block35(width=sw, dtype=dt, name=f"block35_{i}")(x, train)
        x = ReductionA(width=sw * 8, dtype=dt, name="reduction_a")(x, train)
        for i in range(self.depths[1]):
            x = Block17(width=sw * 4, dtype=dt, name=f"block17_{i}")(x, train)
        x = ReductionB(width=sw * 8, dtype=dt, name="reduction_b")(x, train)
        for i in range(self.depths[2]):
            x = Block8(width=sw * 6, dtype=dt, name=f"block8_{i}")(x, train)
        x = Block8(width=sw * 6, scale=1.0, relu=False, dtype=dt, name="block8_final")(x, train)

        # Head: GAP → dropout → bottleneck dense → bottleneck BN
        x = jnp.mean(x, axis=(1, 2))
        if self.dropout_rate > 0.0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.embed_dim, use_bias=False, dtype=dt, name="bottleneck")(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.995,
            epsilon=1e-3,
            use_scale=False,
            dtype=dt,
            name="bottleneck_bn",
        )(x)
        return x.astype(jnp.float32)


def facenet_layer_order(depths: Sequence[int] = (5, 10, 5)):
    """Parameterised layers of :class:`FaceNet` in execution order —
    the contract :func:`fire_tpu.models.onnx_import.assign_facenet`
    zips an ONNX export's weight stream against.  Must track
    ``FaceNet.__call__`` exactly (each ``ConvBn`` is one "convbn"
    entry; each block's ``up`` projection is a biased "conv")."""
    order = [("convbn", (f"stem{i}",)) for i in range(6)]

    def block(name, branches):
        for sub in branches:
            order.append(("convbn", (name, sub)))
        order.append(("conv", (name, "up")))

    for i in range(depths[0]):
        block(f"block35_{i}", ["b0", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"])
    for sub in ("b0", "b1_0", "b1_1", "b1_2"):
        order.append(("convbn", ("reduction_a", sub)))
    for i in range(depths[1]):
        block(f"block17_{i}", ["b0", "b1_0", "b1_1", "b1_2"])
    for sub in ("b0_0", "b0_1", "b1_0", "b1_1", "b2_0", "b2_1", "b2_2"):
        order.append(("convbn", ("reduction_b", sub)))
    for i in range(depths[2]):
        block(f"block8_{i}", ["b0", "b1_0", "b1_1", "b1_2"])
    block("block8_final", ["b0", "b1_0", "b1_1", "b1_2"])
    order.append(("dense", ("bottleneck",)))
    order.append(("bn", ("bottleneck_bn",)))
    return order


def facenet_128(dtype=jnp.bfloat16) -> FaceNet:
    """FaceNet-128d — facenet_gpu.py:104-106."""
    return FaceNet(embed_dim=128, dtype=dtype)


def facenet_512(dtype=jnp.bfloat16) -> FaceNet:
    """FaceNet-512d — facenet_gpu.py:99-102."""
    return FaceNet(embed_dim=512, dtype=dtype)


def tiny_facenet(embed_dim: int = 128, dtype=jnp.float32) -> FaceNet:
    """Reduced-depth/width variant for tests and multi-chip dry runs —
    identical layer types and code path, ~1% of the FLOPs."""
    return FaceNet(embed_dim=embed_dim, depths=(1, 1, 1), stem_width=8, dtype=dtype)
