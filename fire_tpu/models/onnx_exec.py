"""ONNX graph → jittable JAX function (the TPU ONNXRuntime replacement).

The reference delegates every CNN forward to ONNXRuntime's C++ engine
(facenet_gpu.py:70-81,116-129; retinaface_face_detector.py:28-53).
This module executes a parsed :class:`~fire_tpu.models.onnx_import.OnnxGraph`
directly under ``jax.jit``: exact topology, no hand-mapping, so any
*real* weight file (facenet512.onnx, face_detection_yunet_2023mar.onnx,
retinaface.onnx) runs bit-faithfully the moment it exists on disk —
the guaranteed-correct complement to the fast hand-written Flax paths.

Design notes (TPU):

* Tensors keep ONNX's logical NCHW layout; convolutions use
  ``lax.conv_general_dilated`` with explicit dimension numbers and XLA
  picks the physical TPU layout itself — no manual transposition pass.
* Weights are NOT baked into the jaxpr: :func:`make_onnx_fn` returns
  ``(fn, params)`` and ``fn(params, *inputs)`` is jitted with the
  weight pytree as an argument (donation/sharding stay possible).
* All shapes are static.  Shape-carrying ops (Shape/Gather/Slice/
  Concat/... on small int tensors) are constant-folded at trace time in
  numpy, so Reshape/Resize always see static shapes — the XLA contract.
* Inference semantics: BatchNormalization uses running stats, Dropout
  is identity.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fire_tpu.models.onnx_import import OnnxGraph, OnnxNode, read_onnx

# Ops that run eagerly in numpy when all inputs are host constants —
# exactly the shape-plumbing subset exporters emit around Reshape/Resize.
_FOLDABLE = {
    "Shape", "Gather", "Slice", "Concat", "Unsqueeze", "Squeeze", "Cast",
    "Add", "Sub", "Mul", "Div", "Constant", "ConstantOfShape", "Range",
    "ReduceProd", "Identity", "Floor", "Ceil", "Transpose", "Reshape",
    "Expand", "Equal", "Where",
}


def _ints(v) -> List[int]:
    return [int(x) for x in np.asarray(v).reshape(-1)]


def _auto_pads(auto_pad: str, in_hw, k_hw, strides, dilations) -> List[Tuple[int, int]]:
    """Resolve SAME_UPPER/SAME_LOWER/VALID into explicit (lo, hi) pads."""
    out = []
    for i in range(len(k_hw)):
        eff_k = (k_hw[i] - 1) * dilations[i] + 1
        if auto_pad == "VALID":
            out.append((0, 0))
            continue
        out_dim = -(-in_hw[i] // strides[i])  # ceil
        pad = max(0, (out_dim - 1) * strides[i] + eff_k - in_hw[i])
        if auto_pad == "SAME_LOWER":
            out.append((pad - pad // 2, pad // 2))
        else:
            out.append((pad // 2, pad - pad // 2))
    return out


def _node_pads(node: OnnxNode, in_hw, k_hw) -> List[Tuple[int, int]]:
    strides = node.attrs.get("strides", [1] * len(k_hw))
    dilations = node.attrs.get("dilations", [1] * len(k_hw))
    auto_pad = node.attrs.get("auto_pad", "NOTSET") or "NOTSET"
    if auto_pad not in ("NOTSET", ""):
        return _auto_pads(auto_pad, in_hw, k_hw, strides, dilations)
    pads = node.attrs.get("pads", [0] * (2 * len(k_hw)))
    n = len(pads) // 2
    return [(pads[i], pads[i + n]) for i in range(n)]


class OnnxExecutor:
    """Traceable interpreter over an :class:`OnnxGraph`."""

    # input slots whose values steer shapes/control and must stay host
    # constants (never traced): op_type -> 0-based operand indices
    _SHAPE_SLOTS = {
        "Reshape": (1,), "Resize": (1, 2, 3), "Upsample": (1,),
        "Slice": (1, 2, 3, 4), "Pad": (1, 2, 3), "Expand": (1,),
        "ConstantOfShape": (0,), "Split": (1,), "Squeeze": (1,),
        "Unsqueeze": (1,), "Tile": (1,), "Range": (0, 1, 2),
        "Clip": (1, 2), "ReduceMean": (1,), "ReduceSum": (1,),
        "ReduceMax": (1,),
    }

    def __init__(self, graph: OnnxGraph, dtype=jnp.float32):
        self.graph = graph
        self.dtype = dtype
        # Weights live outside the jaxpr; shape-plumbing tensors (int
        # consts, Resize scales, Slice starts, ...) stay host-side so
        # they constant-fold at trace time.
        shape_args = set()
        for node in graph.nodes:
            for idx in self._SHAPE_SLOTS.get(node.op_type, ()):
                if idx < len(node.inputs):
                    shape_args.add(node.inputs[idx])
        self.params: Dict[str, np.ndarray] = {}
        self.consts: Dict[str, np.ndarray] = {}
        for name, arr in graph.initializers.items():
            if name in shape_args or (
                    arr.dtype in (np.int64, np.int32, np.bool_) and arr.size <= 64):
                self.consts[name] = arr
            else:
                self.params[name] = arr

    # -- dispatch ----------------------------------------------------------

    def __call__(self, params: Dict[str, Any], *inputs) -> List[Any]:
        g = self.graph
        if len(inputs) != len(g.inputs):
            raise ValueError(f"expected {len(g.inputs)} inputs {g.inputs}, got {len(inputs)}")
        env: Dict[str, Any] = dict(self.consts)
        env.update(params)
        for name, x in zip(g.inputs, inputs):
            env[name] = x
        for node in g.nodes:
            args = [env[i] if i else None for i in node.inputs]
            if (node.op_type in _FOLDABLE
                    and all(a is None or isinstance(a, (np.ndarray, np.generic))
                            for a in args)):
                outs = self._fold(node, args)
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
                outs = tuple(np.asarray(o) for o in outs)  # scalars → 0-d arrays
            else:
                outs = self._op(node, args)
                if not isinstance(outs, (tuple, list)):
                    outs = (outs,)
            for oname, oval in zip(node.outputs, outs):
                if oname:
                    env[oname] = oval
        return [env[o] for o in g.outputs]

    # -- host constant folding ----------------------------------------------

    def _fold(self, node: OnnxNode, args) -> Any:
        op = node.op_type
        a = node.attrs
        if op == "Constant":
            for key in ("value", "value_int", "value_float", "value_ints", "value_floats"):
                if key in a:
                    return np.asarray(a[key])
            raise ValueError("Constant node without value")
        if op == "Shape":
            return np.asarray(args[0].shape, np.int64)
        if op == "Gather":
            return np.take(args[0], args[1], axis=int(a.get("axis", 0)))
        if op == "Slice":
            return np.asarray(self._slice_np(node, args))
        if op == "Concat":
            return np.concatenate([np.atleast_1d(x) for x in args], axis=int(a.get("axis", 0)))
        if op == "Unsqueeze":
            axes = _ints(a.get("axes", args[1] if len(args) > 1 else [0]))
            out = args[0]
            for ax in sorted(axes):
                out = np.expand_dims(out, ax)
            return out
        if op == "Squeeze":
            axes = a.get("axes", args[1] if len(args) > 1 else None)
            return np.squeeze(args[0], axis=tuple(_ints(axes)) if axes is not None else None)
        if op == "Cast":
            to = int(a.get("to", 1))
            from fire_tpu.models.onnx_import import _ONNX_DTYPES
            return args[0].astype(_ONNX_DTYPES.get(to, np.float32))
        if op in ("Add", "Sub", "Mul", "Div"):
            x, y = args
            return {"Add": np.add, "Sub": np.subtract, "Mul": np.multiply,
                    "Div": lambda p, q: p // q if p.dtype.kind in "iu" else p / q}[op](x, y)
        if op == "ConstantOfShape":
            value = a.get("value", np.zeros(1, np.float32))
            return np.full(_ints(args[0]), np.asarray(value).reshape(-1)[0])
        if op == "Range":
            return np.arange(args[0].item(), args[1].item(), args[2].item())
        if op == "ReduceProd":
            return np.prod(args[0], axis=tuple(_ints(a.get("axes", []))) or None,
                           keepdims=bool(a.get("keepdims", 1)))
        if op == "Identity":
            return args[0]
        if op == "Floor":
            return np.floor(args[0])
        if op == "Ceil":
            return np.ceil(args[0])
        if op == "Transpose":
            return np.transpose(args[0], a.get("perm"))
        if op == "Reshape":
            return np.reshape(args[0], self._reshape_dims(args[0], args[1]))
        if op == "Expand":
            return np.broadcast_to(args[0], _ints(args[1])).copy()
        if op == "Equal":
            return np.equal(args[0], args[1])
        if op == "Where":
            return np.where(args[0], args[1], args[2])
        raise NotImplementedError(op)  # pragma: no cover

    @staticmethod
    def _reshape_dims(x, shape_arr) -> List[int]:
        dims = _ints(shape_arr)
        out = []
        for i, d in enumerate(dims):
            if d == 0:
                out.append(x.shape[i])
            else:
                out.append(d)
        if -1 in out:
            known = int(np.prod([d for d in out if d != -1]))
            out[out.index(-1)] = int(np.prod(x.shape)) // known
        return out

    @staticmethod
    def _slice_np(node: OnnxNode, args):
        x = args[0]
        a = node.attrs
        if len(args) > 1 and args[1] is not None:
            starts = _ints(args[1]); ends = _ints(args[2])
            axes = _ints(args[3]) if len(args) > 3 and args[3] is not None else list(range(len(starts)))
            steps = _ints(args[4]) if len(args) > 4 and args[4] is not None else [1] * len(starts)
        else:
            starts = _ints(a["starts"]); ends = _ints(a["ends"])
            axes = _ints(a.get("axes", list(range(len(starts)))))
            steps = [1] * len(starts)
        sl = [slice(None)] * x.ndim
        for st, en, ax, sp in zip(starts, ends, axes, steps):
            # exporters encode "to the end" as INT32/INT64_MAX (or MIN
            # when stepping backwards) — map those to an open slice
            open_end = en >= 2**31 - 1 or (sp < 0 and en <= -(2**31) + 1)
            sl[ax] = slice(st, None if open_end else en, sp)
        return x[tuple(sl)]

    # -- traced ops ----------------------------------------------------------

    def _op(self, node: OnnxNode, args) -> Any:
        op = node.op_type
        handler = getattr(self, f"_op_{op.lower()}", None)
        if handler is None:
            raise NotImplementedError(
                f"ONNX op {op!r} (node {node.name!r}) not implemented in fire_tpu executor"
            )
        return handler(node, args)

    # elementwise / activation
    def _op_relu(self, node, args):
        return jax.nn.relu(args[0])

    def _op_leakyrelu(self, node, args):
        return jax.nn.leaky_relu(args[0], node.attrs.get("alpha", 0.01))

    def _op_prelu(self, node, args):
        x, slope = args
        slope = jnp.asarray(slope)
        if slope.ndim > 0 and slope.ndim < jnp.ndim(x):
            # ONNX broadcasts slope over the channel dim (axis 1, NCHW)
            shape = [1] * jnp.ndim(x)
            shape[1] = slope.size
            slope = slope.reshape(shape)
        return jnp.where(x >= 0, x, slope * x)

    def _op_sigmoid(self, node, args):
        return jax.nn.sigmoid(args[0])

    def _op_tanh(self, node, args):
        return jnp.tanh(args[0])

    def _op_softmax(self, node, args):
        return jax.nn.softmax(args[0], axis=int(node.attrs.get("axis", -1)))

    def _op_exp(self, node, args):
        return jnp.exp(args[0])

    def _op_log(self, node, args):
        return jnp.log(args[0])

    def _op_sqrt(self, node, args):
        return jnp.sqrt(args[0])

    def _op_neg(self, node, args):
        return -args[0]

    def _op_abs(self, node, args):
        return jnp.abs(args[0])

    def _op_erf(self, node, args):
        return lax.erf(args[0])

    def _op_clip(self, node, args):
        lo = node.attrs.get("min")
        hi = node.attrs.get("max")
        if len(args) > 1 and args[1] is not None:
            lo = args[1]
        if len(args) > 2 and args[2] is not None:
            hi = args[2]
        return jnp.clip(args[0], lo, hi)

    def _op_hardswish(self, node, args):
        return jax.nn.hard_swish(args[0])

    def _op_hardsigmoid(self, node, args):
        alpha = node.attrs.get("alpha", 0.2)
        beta = node.attrs.get("beta", 0.5)
        return jnp.clip(alpha * args[0] + beta, 0.0, 1.0)

    def _op_elu(self, node, args):
        return jax.nn.elu(args[0], node.attrs.get("alpha", 1.0))

    def _op_add(self, node, args):
        return args[0] + args[1]

    def _op_sub(self, node, args):
        return args[0] - args[1]

    def _op_mul(self, node, args):
        return args[0] * args[1]

    def _op_div(self, node, args):
        return args[0] / args[1]

    def _op_pow(self, node, args):
        return args[0] ** args[1]

    def _op_min(self, node, args):
        out = args[0]
        for a in args[1:]:
            out = jnp.minimum(out, a)
        return out

    def _op_max(self, node, args):
        out = args[0]
        for a in args[1:]:
            out = jnp.maximum(out, a)
        return out

    def _op_identity(self, node, args):
        return args[0]

    def _op_dropout(self, node, args):
        return args[0]

    def _op_cast(self, node, args):
        from fire_tpu.models.onnx_import import _ONNX_DTYPES
        np_dt = _ONNX_DTYPES.get(int(node.attrs.get("to", 1)), np.float32)
        return jnp.asarray(args[0]).astype(np_dt)

    # structure
    def _op_concat(self, node, args):
        return jnp.concatenate(args, axis=int(node.attrs.get("axis", 0)))

    def _op_reshape(self, node, args):
        if not isinstance(args[1], np.ndarray):
            raise ValueError("Reshape with traced (non-static) shape is unsupported on TPU")
        return jnp.reshape(args[0], self._reshape_dims(args[0], args[1]))

    def _op_flatten(self, node, args):
        ax = int(node.attrs.get("axis", 1))
        shape = args[0].shape
        lead = int(np.prod(shape[:ax])) if ax else 1
        return jnp.reshape(args[0], (lead, -1))

    def _op_transpose(self, node, args):
        return jnp.transpose(args[0], node.attrs.get("perm"))

    def _op_squeeze(self, node, args):
        axes = node.attrs.get("axes", args[1] if len(args) > 1 else None)
        return jnp.squeeze(args[0], axis=tuple(_ints(axes)) if axes is not None else None)

    def _op_unsqueeze(self, node, args):
        axes = _ints(node.attrs.get("axes", args[1] if len(args) > 1 else [0]))
        out = args[0]
        for ax in sorted(axes):
            out = jnp.expand_dims(out, ax)
        return out

    def _op_slice(self, node, args):
        return self._slice_np(node, [args[0]] + [np.asarray(a) if a is not None else None
                                                 for a in args[1:]])

    def _op_gather(self, node, args):
        return jnp.take(args[0], jnp.asarray(args[1]), axis=int(node.attrs.get("axis", 0)))

    def _op_expand(self, node, args):
        target = _ints(args[1])
        # ONNX Expand uses numpy broadcasting against max(shape, target)
        shape = list(jnp.broadcast_shapes(tuple(args[0].shape), tuple(target)))
        return jnp.broadcast_to(args[0], shape)

    def _op_shape(self, node, args):
        return np.asarray(args[0].shape, np.int64)  # static under jit

    def _op_split(self, node, args):
        axis = int(node.attrs.get("axis", 0))
        if "split" in node.attrs:
            sizes = _ints(node.attrs["split"])
        elif len(args) > 1 and args[1] is not None:
            sizes = _ints(args[1])
        else:
            n = len(node.outputs)
            sizes = [args[0].shape[axis] // n] * n
        idx = np.cumsum(sizes)[:-1]
        return tuple(jnp.split(args[0], idx, axis=axis))

    def _op_pad(self, node, args):
        pads = _ints(node.attrs.get("pads", args[1] if len(args) > 1 else []))
        value = node.attrs.get("value", 0.0)
        if len(args) > 2 and args[2] is not None:
            value = float(np.asarray(args[2]).reshape(-1)[0])
        mode = node.attrs.get("mode", "constant")
        n = len(pads) // 2
        pairs = [(pads[i], pads[i + n]) for i in range(n)]
        if mode in ("constant", b"constant"):
            return jnp.pad(args[0], pairs, constant_values=value)
        return jnp.pad(args[0], pairs, mode="edge" if mode in ("edge", b"edge") else "reflect")

    # linear algebra
    def _op_matmul(self, node, args):
        return jnp.matmul(args[0].astype(self.dtype), args[1].astype(self.dtype))

    def _op_gemm(self, node, args):
        a, b = args[0], args[1]
        at = node.attrs.get("transA", 0)
        bt = node.attrs.get("transB", 0)
        alpha = node.attrs.get("alpha", 1.0)
        beta = node.attrs.get("beta", 1.0)
        a = a.T if at else a
        b = b.T if bt else b
        out = alpha * jnp.matmul(a.astype(self.dtype), b.astype(self.dtype))
        if len(args) > 2 and args[2] is not None:
            out = out + beta * args[2]
        return out

    # conv / pool / norm
    def _op_conv(self, node, args):
        x, w = args[0], args[1]
        k_hw = list(w.shape[2:])
        strides = node.attrs.get("strides", [1] * len(k_hw))
        dilations = node.attrs.get("dilations", [1] * len(k_hw))
        group = int(node.attrs.get("group", 1))
        pads = _node_pads(node, x.shape[2:], k_hw)
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
        out = lax.conv_general_dilated(
            x.astype(self.dtype), jnp.asarray(w).astype(self.dtype),
            window_strides=strides, padding=pads, rhs_dilation=dilations,
            dimension_numbers=dn, feature_group_count=group,
        )
        if len(args) > 2 and args[2] is not None:
            out = out + jnp.asarray(args[2]).astype(self.dtype).reshape(
                (1, -1) + (1,) * (out.ndim - 2))
        return out

    def _op_convtranspose(self, node, args):
        x, w = args[0], args[1]
        k_hw = list(w.shape[2:])
        strides = node.attrs.get("strides", [1] * len(k_hw))
        pads = _node_pads(node, x.shape[2:], k_hw)
        group = int(node.attrs.get("group", 1))
        if group != 1:
            raise NotImplementedError("grouped ConvTranspose")
        # ONNX ConvTranspose weight is (Cin, Cout, kH, kW)
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "IOHW", "NCHW"))
        out = lax.conv_transpose(
            x.astype(self.dtype), jnp.asarray(w).astype(self.dtype),
            strides=strides, padding=[(p[0], p[1]) for p in pads],
            dimension_numbers=dn, transpose_kernel=True,
        )
        if len(args) > 2 and args[2] is not None:
            out = out + jnp.asarray(args[2]).astype(self.dtype).reshape(
                (1, -1) + (1,) * (out.ndim - 2))
        return out

    def _op_batchnormalization(self, node, args):
        x, scale, bias, mean, var = args[:5]
        eps = node.attrs.get("epsilon", 1e-5)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        inv = lax.rsqrt(jnp.asarray(var, jnp.float32) + eps)
        out = (x.astype(jnp.float32) - jnp.reshape(jnp.asarray(mean), shape)) \
            * jnp.reshape(jnp.asarray(scale) * inv, shape) \
            + jnp.reshape(jnp.asarray(bias), shape)
        return out.astype(self.dtype) if self.dtype != jnp.float32 else out

    def _op_instancenormalization(self, node, args):
        x, scale, bias = args
        eps = node.attrs.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return (x - mean) * lax.rsqrt(var + eps) * jnp.reshape(scale, shape) \
            + jnp.reshape(bias, shape)

    def _pool(self, node, args, reducer, init, avg=False):
        x = args[0]
        k_hw = _ints(node.attrs["kernel_shape"])
        strides = node.attrs.get("strides", [1] * len(k_hw))
        pads = _node_pads(node, x.shape[2:], k_hw)
        if node.attrs.get("ceil_mode", 0):
            # extend the end-pad so the last partial window is included
            new_pads = []
            for i, (lo, hi) in enumerate(pads):
                size = x.shape[2 + i] + lo + hi
                rem = (size - k_hw[i]) % strides[i]
                new_pads.append((lo, hi + (strides[i] - rem) % strides[i] if rem else hi))
            pads = new_pads
        window = (1, 1) + tuple(k_hw)
        strides_full = (1, 1) + tuple(strides)
        pads_full = ((0, 0), (0, 0)) + tuple(pads)
        out = lax.reduce_window(x, init, reducer, window, strides_full, pads_full)
        if avg:
            ones = jnp.ones(x.shape[2:], x.dtype)
            counts = lax.reduce_window(ones, 0.0, lax.add, tuple(k_hw), tuple(strides), tuple(pads))
            if node.attrs.get("count_include_pad", 0):
                counts = jnp.full_like(counts, float(np.prod(k_hw)))
            out = out / counts
        return out

    def _op_maxpool(self, node, args):
        return self._pool(node, args, lax.max, -jnp.inf)

    def _op_averagepool(self, node, args):
        return self._pool(node, args, lax.add, 0.0, avg=True)

    def _op_globalaveragepool(self, node, args):
        x = args[0]
        return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    def _op_globalmaxpool(self, node, args):
        x = args[0]
        return jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)

    def _op_reducemean(self, node, args):
        axes = node.attrs.get("axes", args[1] if len(args) > 1 else None)
        axes = tuple(_ints(axes)) if axes is not None else None
        return jnp.mean(args[0], axis=axes, keepdims=bool(node.attrs.get("keepdims", 1)))

    def _op_reducesum(self, node, args):
        axes = node.attrs.get("axes", args[1] if len(args) > 1 else None)
        axes = tuple(_ints(axes)) if axes is not None else None
        return jnp.sum(args[0], axis=axes, keepdims=bool(node.attrs.get("keepdims", 1)))

    def _op_reducemax(self, node, args):
        axes = node.attrs.get("axes", args[1] if len(args) > 1 else None)
        axes = tuple(_ints(axes)) if axes is not None else None
        return jnp.max(args[0], axis=axes, keepdims=bool(node.attrs.get("keepdims", 1)))

    def _op_lrn(self, node, args):
        x = args[0]
        size = int(node.attrs.get("size", 5))
        alpha = node.attrs.get("alpha", 1e-4)
        beta = node.attrs.get("beta", 0.75)
        bias = node.attrs.get("bias", 1.0)
        sq = jnp.square(x)
        half = size // 2
        pad = [(0, 0), (half, size - 1 - half)] + [(0, 0)] * (x.ndim - 2)
        window = (1, size) + (1,) * (x.ndim - 2)
        s = lax.reduce_window(sq, 0.0, lax.add, window, (1,) * x.ndim, pad)
        return x / jnp.power(bias + alpha / size * s, beta)

    # resize / upsample
    def _op_resize(self, node, args):
        x = args[0]
        mode = node.attrs.get("mode", "nearest")
        if isinstance(mode, bytes):
            mode = mode.decode()
        # opset 11+: inputs = X, roi, scales, sizes
        sizes = None
        scales = None
        if len(args) >= 4 and args[3] is not None and np.asarray(args[3]).size:
            sizes = _ints(args[3])
        elif len(args) >= 3 and args[2] is not None and np.asarray(args[2]).size:
            scales = np.asarray(args[2], np.float64).reshape(-1)
        elif len(args) == 2 and args[1] is not None:  # opset-9 Upsample form
            scales = np.asarray(args[1], np.float64).reshape(-1)
        elif "scales" in node.attrs:
            scales = np.asarray(node.attrs["scales"], np.float64)
        if sizes is None:
            sizes = [int(round(s * d)) for s, d in zip(scales, x.shape)]
        method = "nearest" if mode == "nearest" else ("linear" if mode == "linear" else "cubic")
        if method == "nearest":
            # integer upsampling: exact repeat (matches asymmetric+floor)
            out = x
            for ax, (src, dst) in enumerate(zip(x.shape, sizes)):
                if dst == src:
                    continue
                if dst % src == 0:
                    out = jnp.repeat(out, dst // src, axis=ax)
                else:
                    idx = np.floor(np.arange(dst) * (src / dst)).astype(np.int32)
                    out = jnp.take(out, idx, axis=ax)
            return out
        return jax.image.resize(x, sizes, method=method)

    def _op_upsample(self, node, args):
        return self._op_resize(node, args)

    def _op_depthtospace(self, node, args):
        x = args[0]
        b = int(node.attrs["blocksize"])
        n, c, h, w = x.shape
        mode = node.attrs.get("mode", "DCR")
        if mode in ("CRD", b"CRD"):
            x = x.reshape(n, c // (b * b), b, b, h, w)
            x = x.transpose(0, 1, 4, 2, 5, 3)
        else:
            x = x.reshape(n, b, b, c // (b * b), h, w)
            x = x.transpose(0, 3, 4, 1, 5, 2)
        return x.reshape(n, c // (b * b), h * b, w * b)

    def _op_constantofshape(self, node, args):
        value = node.attrs.get("value", np.zeros(1, np.float32))
        v = np.asarray(value).reshape(-1)[0]
        return jnp.full(_ints(args[0]), v, dtype=np.asarray(value).dtype)


def make_onnx_fn(graph: OnnxGraph, dtype=jnp.float32
                 ) -> Tuple[Callable, Dict[str, np.ndarray]]:
    """Build ``(fn, params)`` with ``fn(params, *inputs) -> [outputs]``
    jit-compatible.  ``params`` is the initializer dict (host numpy);
    callers ``jax.device_put`` it once and pass device arrays."""
    ex = OnnxExecutor(graph, dtype=dtype)
    return ex, ex.params


class OnnxModel:
    """Convenience wrapper: parse, jit, run — the drop-in for the
    reference's ``ort.InferenceSession`` (facenet_gpu.py:116-129)."""

    def __init__(self, path_or_graph, dtype=jnp.float32):
        graph = path_or_graph if isinstance(path_or_graph, OnnxGraph) else read_onnx(path_or_graph)
        self.graph = graph
        self.fn, host_params = make_onnx_fn(graph, dtype=dtype)
        self.params = jax.tree.map(jnp.asarray, host_params)
        self._jitted = jax.jit(lambda p, *xs: self.fn(p, *xs))

    @property
    def input_names(self) -> List[str]:
        return list(self.graph.inputs)

    @property
    def output_names(self) -> List[str]:
        return list(self.graph.outputs)

    def __call__(self, *inputs) -> List[np.ndarray]:
        outs = self._jitted(self.params, *[jnp.asarray(x) for x in inputs])
        return [np.asarray(o) for o in outs]
