"""Training CLI smoke test on a tiny synthetic dataset.

Uses the reduced-depth ``tiny_facenet`` (same layer types, ~1% FLOPs)
so the dp×mp-sharded step compiles in seconds on the 8-device virtual
CPU mesh — the full FaceNet's sharded CPU compile takes minutes and was
the long pole of the whole suite.  Full-size training is covered by
the real-TPU run documented in README §Training, and the sharded step
itself by tests/test_parallel.py.
"""

import sys

import cv2
import numpy as np
from flax import serialization


def test_train_cli_end_to_end(tmp_path, rng, monkeypatch):
    # tiny dataset: 2 identities × 4 images
    for ident in ("a", "b"):
        d = tmp_path / "data" / ident
        d.mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.jpg"), img)

    from fire_tpu.models import facenet as fn_mod

    RealFaceNet = fn_mod.FaceNet

    def tiny_ctor(embed_dim, dtype, dropout_rate=0.0):
        return RealFaceNet(
            embed_dim=int(embed_dim), depths=(1, 1, 1), stem_width=8,
            dtype=dtype, dropout_rate=dropout_rate,
        )

    monkeypatch.setattr(fn_mod, "FaceNet", tiny_ctor)

    out = tmp_path / "enc.msgpack"
    monkeypatch.setattr(
        sys, "argv",
        ["fire_tpu.train", "--data", str(tmp_path / "data"),
         "--encoder", "128", "--epochs", "1", "--batch", "8",
         "--image_size", "96", "--out", str(out), "--log_every", "1"],
    )
    from fire_tpu.train.__main__ import main

    main()
    assert out.exists() and out.stat().st_size > 1000

    # the exported variables load back into the matching variable tree
    import jax
    import jax.numpy as jnp

    model = tiny_ctor(128, jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    with open(out, "rb") as f:
        restored = serialization.from_bytes(
            {"params": template["params"], "batch_stats": template["batch_stats"]}, f.read()
        )
    assert "params" in restored and "batch_stats" in restored


def test_train_cli_checkpoint_resume(tmp_path, rng, monkeypatch):
    """--checkpoint_dir saves orbax step_<N> checkpoints and a second
    run resumes from the newest one (step counter continues)."""
    for ident in ("a", "b"):
        d = tmp_path / "data" / ident
        d.mkdir(parents=True)
        for i in range(4):
            img = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.jpg"), img)

    from fire_tpu.models import facenet as fn_mod

    RealFaceNet = fn_mod.FaceNet
    monkeypatch.setattr(
        fn_mod, "FaceNet",
        lambda embed_dim, dtype, dropout_rate=0.0: RealFaceNet(
            embed_dim=int(embed_dim), depths=(1, 1, 1), stem_width=8,
            dtype=dtype, dropout_rate=dropout_rate,
        ),
    )

    ckpt = tmp_path / "ckpt"
    argv = ["fire_tpu.train", "--data", str(tmp_path / "data"),
            "--encoder", "128", "--epochs", "1", "--batch", "8",
            "--image_size", "96", "--out", str(tmp_path / "enc.msgpack"),
            "--log_every", "1", "--checkpoint_dir", str(ckpt)]
    from fire_tpu.train.__main__ import main

    monkeypatch.setattr(sys, "argv", argv)
    main()
    steps1 = {int(p.name.split("_")[1]) for p in ckpt.iterdir()
              if p.name.startswith("step_")}
    assert steps1

    monkeypatch.setattr(sys, "argv", argv)
    main()  # second run must resume, not restart at step 0
    steps2 = {int(p.name.split("_")[1]) for p in ckpt.iterdir()
              if p.name.startswith("step_")}
    # a resumed run continues the step counter past the first run's
    # newest checkpoint; a restart would re-save the same step numbers
    assert max(steps2) > max(steps1)
