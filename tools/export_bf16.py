"""Re-serialize a trained msgpack checkpoint with bf16 float params.

Halves the on-disk/in-repo size of committed `weights_trained/*.msgpack`
files.  Float32 leaves under `params` are cast to bfloat16; everything
else (`batch_stats`, int leaves) stays as stored — BatchNorm running
statistics keep full precision, matching how the committed
facenet512_synth export was produced.  `DeviceEngine.load_trained_*`
restores the stored dtypes and the f32-master/bf16-compute engine
convention (`EngineConfig.param_dtype/compute_dtype`) applies from
there, so a bf16 export is numerically identical to loading f32 weights
into the bf16 compute path.

    python tools/export_bf16.py in.msgpack out.msgpack
"""

from __future__ import annotations

import sys

import numpy as np


def to_bf16(tree):
    import jax
    import jax.numpy as jnp

    def cast(leaf):
        a = np.asarray(leaf)
        if a.dtype == np.float32:
            return np.asarray(jnp.asarray(a, jnp.bfloat16))
        return a

    return jax.tree.map(cast, tree)


def main() -> None:
    import msgpack
    from flax import serialization

    src, dst = sys.argv[1], sys.argv[2]
    with open(src, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    out = dict(tree)
    if "params" in out:
        out["params"] = to_bf16(out["params"])
    else:
        out = to_bf16(out)
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"{src} -> {dst}")


if __name__ == "__main__":
    main()
