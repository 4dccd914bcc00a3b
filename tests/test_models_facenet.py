"""FaceNet (Inception-ResNet-v1) structural + numerical tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fire_tpu.models.facenet import FaceNet, facenet_128, facenet_512, tiny_facenet

# 96×96 is the smallest input that survives the VALID-conv stem and both
# reductions; keeps CPU compile time low while exercising every layer.
SHAPE = (2, 96, 96, 3)


@pytest.fixture(scope="module")
def tiny():
    model = tiny_facenet(embed_dim=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(SHAPE, jnp.float32))
    return model, variables


def test_tiny_forward_shapes(tiny):
    model, variables = tiny
    out = model.apply(variables, jnp.zeros(SHAPE, jnp.float32))
    assert out.shape == (2, 128)
    assert out.dtype == jnp.float32


def test_tiny_batch_invariance(tiny, rng):
    model, variables = tiny
    xb = jnp.asarray(rng.random((4, 96, 96, 3)).astype(np.float32))
    full = model.apply(variables, xb)
    single = jnp.concatenate([model.apply(variables, xb[i : i + 1]) for i in range(4)])
    # XLA may reassociate conv accumulations across batch shapes → 1e-3
    np.testing.assert_allclose(np.asarray(full), np.asarray(single), atol=1e-3)


def test_tiny_jit_and_determinism(tiny, rng):
    model, variables = tiny
    x = jnp.asarray(rng.random(SHAPE).astype(np.float32))
    f = jax.jit(lambda v, x: model.apply(v, x))
    a, b = f(variables, x), f(variables, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_facenet_param_counts():
    """Full-size variants have the canonical topology: ~20-25M params
    like the reference ONNX exports (91/94 MB f32).  Uses eval_shape so
    nothing is actually computed."""
    for make, dim in ((facenet_128, 128), (facenet_512, 512)):
        model = make(dtype=jnp.float32)
        x = jnp.zeros((1, 160, 160, 3))
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
        assert 18e6 < n < 30e6, n
        out = jax.eval_shape(model.apply, shapes, x)
        assert out.shape == (1, dim)


def test_train_mode_updates_batch_stats(tiny, rng):
    model, variables = tiny
    x = jnp.asarray(rng.random(SHAPE).astype(np.float32))
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 128)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
