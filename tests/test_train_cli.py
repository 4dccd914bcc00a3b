"""Training CLI smoke test on a tiny synthetic dataset."""

import sys

import cv2
import numpy as np
import pytest
from flax import serialization


def test_train_cli_end_to_end(tmp_path, rng, monkeypatch):
    # tiny dataset: 2 identities × 4 images
    for ident in ("a", "b"):
        d = tmp_path / "data" / ident
        d.mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.jpg"), img)

    out = tmp_path / "enc.msgpack"
    # tiny model via monkeypatching FaceNet defaults would be invasive;
    # instead use the small image size + 1 epoch (full model, 1 step)
    monkeypatch.setattr(
        sys, "argv",
        ["fire_tpu.train", "--data", str(tmp_path / "data"),
         "--encoder", "128", "--epochs", "1", "--batch", "8",
         "--image_size", "96", "--out", str(out), "--log_every", "1"],
    )
    from fire_tpu.train.__main__ import main

    main()
    assert out.exists() and out.stat().st_size > 1000

    # the exported variables load back into a FaceNet variable tree
    import jax
    import jax.numpy as jnp

    from fire_tpu.models.facenet import FaceNet

    model = FaceNet(embed_dim=128, dtype=jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    with open(out, "rb") as f:
        restored = serialization.from_bytes(
            {"params": template["params"], "batch_stats": template["batch_stats"]}, f.read()
        )
    assert "params" in restored and "batch_stats" in restored
