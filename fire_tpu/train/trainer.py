"""Sharded ArcFace training step (dp × mp mesh).

Sharding layout (SPMD via NamedSharding + jit; XLA inserts the
collectives):

* batch (images, labels): sharded over ``dp``;
* FaceNet parameters + batch stats: replicated (the model is small
  relative to HBM; gradients all-reduce over dp);
* ArcFace classifier matrix (D, C): C sharded over ``mp`` — with
  100k+ identities the classifier dominates memory, so its columns,
  logits, and softmax reduction shard over mp (XLA emits the psum for
  the normalizer).

Checkpointing uses orbax (fire_tpu.train.checkpoint helpers below).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fire_tpu.train.losses import arcface_logits


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    classifier: jnp.ndarray  # (D, C)
    opt_state: Any
    step: jnp.ndarray


def init_state(
    model, rng, num_classes: int, optimizer, image_hw=(160, 160),
    materialize: bool = True,
) -> Tuple[TrainState, optax.GradientTransformation]:
    kv, kw = jax.random.split(rng)
    x = jnp.zeros((2, *image_hw, 3), jnp.float32)
    if materialize:
        # numpy fan-in init from eval_shape'd trees: the XLA init
        # program for the full FaceNet-512 costs minutes on this
        # platform (docs/DESIGN.md §4); numpy is milliseconds and an
        # equivalent starting point
        from fire_tpu.pipeline.engine import _materialize

        # derive the numpy-init seed from the caller's rng so distinct
        # training keys give distinct backbone inits (not just distinct
        # classifier heads)
        seed = int(jax.random.randint(kv, (), 0, 2**31 - 1))
        variables = _materialize(jax.eval_shape(model.init, kv, x), seed=seed)
    else:
        variables = model.init(kv, x)
    d = model.embed_dim
    classifier = jax.random.normal(kw, (d, num_classes), jnp.float32) * 0.01
    target = (variables["params"], classifier)
    opt_state = optimizer.init(target)
    return TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        classifier=classifier,
        opt_state=opt_state,
        step=jnp.asarray(0, jnp.int32),
    )


def state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """NamedShardings for the train state: replicated model, classifier
    columns over mp."""
    rep = NamedSharding(mesh, P())
    cls = NamedSharding(mesh, P(None, "mp"))

    def shard_like(tree, sh):
        return jax.tree.map(lambda _: sh, tree)

    return TrainState(
        params=shard_like(state.params, rep),
        batch_stats=shard_like(state.batch_stats, rep),
        classifier=cls,
        opt_state=jax.tree.map(
            lambda leaf: cls if getattr(leaf, "ndim", 0) == 2 and leaf.shape == state.classifier.shape else rep,
            state.opt_state,
        ),
        step=rep,
    )


def make_train_step(model, optimizer, mesh: Optional[Mesh] = None,
                    margin: float = 0.5, scale: float = 64.0):
    """Build the jitted train step; with a mesh, batch in/out shardings
    are applied so the step runs SPMD over dp×mp."""

    def loss_fn(params, classifier, batch_stats, images, labels):
        emb, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, train=True, mutable=["batch_stats"],
        )
        if mesh is not None:
            emb = jax.lax.with_sharding_constraint(
                emb, NamedSharding(mesh, P("dp", None))
            )
        logits = arcface_logits(emb, classifier, labels, margin, scale)
        if mesh is not None:
            logits = jax.lax.with_sharding_constraint(
                logits, NamedSharding(mesh, P("dp", "mp"))
            )
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, mutated["batch_stats"]

    def step(state: TrainState, images, labels):
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.params, state.classifier, state.batch_stats, images, labels
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, (state.params, state.classifier)
        )
        new_params, new_classifier = optax.apply_updates(
            (state.params, state.classifier), updates
        )
        return (
            TrainState(new_params, new_stats, new_classifier, opt_state, state.step + 1),
            loss,
        )

    if mesh is None:
        return jax.jit(step)

    batch_sh = NamedSharding(mesh, P("dp"))
    return jax.jit(step, in_shardings=(None, batch_sh, batch_sh))


def save_checkpoint(path: str, state: TrainState) -> None:
    """Orbax checkpoint (replaces nothing in the reference — it has no
    training — but rounds out the checkpoint/resume story of
    SURVEY.md §5 for the training plane)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)
