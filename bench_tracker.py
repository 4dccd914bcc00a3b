"""Tracker-scan A/B microbench on the real chip (VERDICT r2 next #3).

Isolates the serial lax.scan tracker (the 23 ms of the 125 ms B=128
step in docs/DESIGN.md §3) and measures variants in ONE process so
tunnel noise cancels:

  * max_tracks 64 (baseline) vs 32
  * device JV LAP (default) vs greedy assignment
  * packed int32 bookkeeping (if present) vs baseline

Prints one JSON line with ms/frame per variant.
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

    from fire_tpu.config import TrackerConfig
    from fire_tpu.track.sort import make_table, sort_step

    B = int(os.environ.get("TRK_B", "128"))
    K = 8  # detections per frame
    rng = np.random.default_rng(0)

    # moving boxes so tracks persist and LAP sees realistic costs
    base = rng.uniform(100, 900, (K, 2))
    vel = rng.uniform(-3, 3, (K, 2))
    frames_boxes = np.zeros((B, K, 4), np.float32)
    for b in range(B):
        base = base + vel
        frames_boxes[b, :, :2] = base
        frames_boxes[b, :, 2:] = 80
    frames_mask = np.ones((B, K), bool)
    det_boxes = jax.device_put(frames_boxes)
    det_mask = jax.device_put(frames_mask)

    def build(cfg):
        def scan_fn(table, boxes, mask):
            def step(tb, fr):
                b, m = fr
                tb, out = sort_step(tb, b, m, cfg)
                return tb, out.mask.sum()
            tb, outs = jax.lax.scan(step, table, (boxes, mask))
            return tb, outs.sum()
        return jax.jit(scan_fn), make_table(cfg)

    def measure(name, cfg, trials=8):
        fn, table = build(cfg)
        tb, n = fn(table, det_boxes, det_mask)  # compile + warm
        jax.block_until_ready(n)
        best = 1e9
        for _ in range(trials):
            t0 = time.perf_counter()
            tb2, n = fn(table, det_boxes, det_mask)
            jax.block_until_ready(n)
            best = min(best, time.perf_counter() - t0)
        ms_frame = best * 1000.0 / B
        print(f"[trk] {name}: {best*1000:.2f} ms / {B} frames = "
              f"{ms_frame:.3f} ms/frame", file=sys.stderr, flush=True)
        return ms_frame

    results = {}
    results["lap_T64"] = measure("lap T=64", TrackerConfig(assignment="hungarian"))
    results["lap_T32"] = measure("lap T=32", TrackerConfig(assignment="hungarian", max_tracks=32))
    results["greedy_T64"] = measure("greedy T=64", TrackerConfig(assignment="greedy"))
    results["greedy_T32"] = measure("greedy T=32", TrackerConfig(assignment="greedy", max_tracks=32))
    print(json.dumps({"metric": "tracker scan ms/frame", "variants": results}))


if __name__ == "__main__":
    main()
