"""Gallery-match A/B on the real chip: XLA matmul+top_k vs the Pallas
fused top-1, both against the resident bf16 gallery shadow
(VERDICT r2 weak #3 — settle the Pallas kernel's story with numbers).

Measures the in-step scale (B = 1024 query rows, the 128-frame batched
pipeline's load) and the host-query scale (B = 8), 100k rows × 512.
Prints one JSON line of ms per call per variant.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/fire_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fire_tpu.ops.gallery_match import cosine_topk
    from fire_tpu.ops.pallas_topk import pallas_cosine_top1

    n, d = 102_400, 512  # the 2048-padded 100k cap
    count = 100_000
    rng = np.random.default_rng(0)
    gal = rng.standard_normal((n, d)).astype(np.float32)
    gal /= np.linalg.norm(gal, axis=1, keepdims=True)
    gal16 = jax.device_put(jnp.asarray(gal).astype(jnp.bfloat16))
    gal32 = jax.device_put(jnp.asarray(gal))
    valid = jnp.arange(n) < count

    xla = jax.jit(lambda q, g: cosine_topk(q, g, valid, k=1))
    pal = jax.jit(lambda q, g: pallas_cosine_top1(q, g, jnp.int32(count)))

    def measure(fn, q, g, trials=12):
        out = fn(q, g)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q, g))
            best = min(best, time.perf_counter() - t0)
        return best * 1000.0

    results = {}
    for b in (8, 1024):
        q = jax.device_put(
            jnp.asarray(rng.standard_normal((b, d)).astype(np.float32))
        )
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        results[f"xla_bf16shadow_B{b}"] = round(measure(xla, q, gal16), 3)
        results[f"xla_f32cast_B{b}"] = round(measure(xla, q, gal32), 3)
        try:
            results[f"pallas_bf16shadow_B{b}"] = round(measure(pal, q, gal16), 3)
        except Exception as e:  # pragma: no cover
            results[f"pallas_bf16shadow_B{b}"] = f"failed: {e}"
        print(f"[gal] B={b}: {({k: v for k, v in results.items() if k.endswith(str(b))})}",
              file=sys.stderr, flush=True)
    print(json.dumps({"metric": "gallery top-1 ms/call (100k x 512)", "variants": results}))


if __name__ == "__main__":
    main()
