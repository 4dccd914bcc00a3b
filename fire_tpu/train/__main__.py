"""Training CLI: ``python -m fire_tpu.train --data <root> ...``

Trains the FaceNet encoder with ArcFace on an identity-folder dataset
(root/<identity>/*.jpg) and exports weights the recognizer engine can
load — the capability the reference lacks entirely (it ships frozen
ONNX weights; SURVEY.md §2.4 "no training anywhere in the repo").

Multi-chip: with >1 device a (dp, mp) mesh is built automatically
(batch over dp, ArcFace classifier columns over mp).
"""

from __future__ import annotations

import argparse
import logging
import os
import time


def main() -> None:
    p = argparse.ArgumentParser(description="FIRE-TPU ArcFace encoder training")
    p.add_argument("--data", required=True, help="dataset root: <root>/<identity>/*.jpg")
    p.add_argument("--encoder", default="512", choices=["128", "512"])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--margin", type=float, default=0.5)
    p.add_argument("--scale", type=float, default=64.0)
    p.add_argument("--image_size", type=int, default=160)
    p.add_argument("--out", default="trained_encoder.msgpack",
                   help="where to write the trained encoder variables")
    p.add_argument("--checkpoint_dir", default=None,
                   help="orbax checkpoint directory (resume + periodic saves)")
    p.add_argument("--log_every", type=int, default=20)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    log = logging.getLogger("fire_tpu.train")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import serialization

    from fire_tpu.models.facenet import FaceNet
    from fire_tpu.parallel.mesh import make_mesh
    from fire_tpu.train.data import IdentityFolderDataset, batches
    from fire_tpu.train.trainer import (
        init_state, make_train_step, restore_checkpoint, save_checkpoint,
    )

    ds = IdentityFolderDataset(args.data)
    log.info("dataset: %d images, %d identities", len(ds), ds.num_classes)

    model = FaceNet(embed_dim=int(args.encoder), dtype=jnp.bfloat16, dropout_rate=0.0)
    optimizer = optax.adamw(args.lr)
    hw = (args.image_size, args.image_size)
    state = init_state(model, jax.random.PRNGKey(0), ds.num_classes, optimizer, image_hw=hw)

    if args.checkpoint_dir and os.path.isdir(args.checkpoint_dir):
        # resume from the newest step_<N> checkpoint, if any
        steps = sorted(
            int(d.split("_", 1)[1])
            for d in os.listdir(args.checkpoint_dir)
            if d.startswith("step_") and d.split("_", 1)[1].isdigit()
        )
        if steps:
            path = os.path.abspath(os.path.join(args.checkpoint_dir, f"step_{steps[-1]}"))
            state = restore_checkpoint(path, state)
            # uncommitted host leaves: the (possibly mesh-sharded) step
            # is free to place them; restored arrays pinned to one
            # device would conflict with the dp×mp ARG_SHARDING
            state = jax.tree.map(np.asarray, state)
            log.info("resumed from %s (step %d)", path, int(state.step))

    n_dev = len(jax.devices())
    mesh = None
    if n_dev > 1:
        mp = 2 if n_dev % 2 == 0 else 1
        mesh = make_mesh((n_dev // mp, mp))
        log.info("mesh: %s", dict(mesh.shape))
    step_fn = make_train_step(model, optimizer, mesh=mesh,
                              margin=args.margin, scale=args.scale)

    t0 = time.time()
    for images_u8, labels in batches(ds, args.batch, hw, epochs=args.epochs):
        images = jnp.asarray(images_u8, jnp.float32) / 255.0
        state, loss = step_fn(state, images, jnp.asarray(labels))
        step = int(state.step)
        if step % args.log_every == 0:
            log.info("step %d  loss %.4f  (%.1f img/s)", step, float(loss),
                     step * args.batch / (time.time() - t0))
            if args.checkpoint_dir:
                save_checkpoint(
                    os.path.abspath(os.path.join(args.checkpoint_dir, f"step_{step}")),
                    state,
                )

    variables = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    log.info("trained encoder variables written to %s "
             "(load with DeviceEngine.load_trained_encoder)", args.out)


if __name__ == "__main__":
    main()
