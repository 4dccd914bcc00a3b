"""Multi-stream data-parallel inference over a device mesh.

SURVEY.md §2.4(e): the rebuild's multi-chip inference scale-up is data
parallelism over video streams — S independent streams, each with its
own device-resident tracker state, sharded one-per-device over the
``dp`` mesh axis with replicated model weights and gallery.  Each
device runs exactly the single-stream batched step
(fire_tpu.pipeline.batch_engine); ``shard_map`` stitches S of them into
one SPMD program, so adding chips multiplies stream throughput with no
cross-device traffic in the hot loop (the gallery is read-only there;
row-sharded search via sharded_gallery.py is the alternative when HBM,
not throughput, is the constraint).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fire_tpu.config import RecognizerConfig, TrackerConfig
from fire_tpu.pipeline.batch_engine import (
    BatchStreamEngine,
    make_stream_state,
    unpack_results,
)


class MultiStreamEngine:
    """S streams × B frames per step, streams sharded over ``dp``."""

    def __init__(self, engine, gallery, cfg: RecognizerConfig, mesh: Mesh,
                 tracker_cfg: Optional[TrackerConfig] = None,
                 encode_k: int = 8, detection_interval: int = 1,
                 encode_budget: Optional[int] = None):
        self.mesh = mesh
        self.n_streams = mesh.shape["dp"]
        self.inner = BatchStreamEngine(
            engine, gallery, cfg, tracker_cfg,
            encode_k=encode_k, detection_interval=detection_interval,
            encode_budget=encode_budget,
        )
        self.cfg = cfg
        self.tcfg = self.inner.tcfg

        # stacked per-stream state, sharded one stream per device
        single = make_stream_state(self.tcfg, cfg.embedding_dim)
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (self.n_streams, *x.shape)), single
        )
        self._state_sharding = NamedSharding(mesh, P("dp"))
        self.states = jax.device_put(stacked, self._state_sharding)
        self._step_cache = {}
        # cached device-resident zero shards, keyed by (h, w, b, stream):
        # a finished stream's pad batch is uploaded once, then reused —
        # its H2D (the dev tunnel's bottleneck) drops to zero
        self._zero_shards = {}

    def _build_step(self, frame_hw, batch):
        inner_step = self.inner._build_step(frame_hw, batch).__wrapped__
        mesh = self.mesh

        def sharded(det_vars, enc_vars, gal, count, states, frames):
            # one stream per device: strip the leading stream axis
            state1 = jax.tree.map(lambda x: x[0], states)
            new_state, packed = inner_step(
                det_vars, enc_vars, gal, count, state1, frames[0]
            )
            restack = jax.tree.map(lambda x: x[None], new_state)
            return restack, packed[None]

        fn = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P("dp"), P("dp")),
            out_specs=(P("dp"), P("dp")),
            check_vma=False,
        )
        return jax.jit(fn)

    def submit(self, frames: np.ndarray, active=None):
        """frames: (S, B, H, W, 3) uint8 — one batch per stream.

        ``active`` (optional list of S bools): streams marked inactive
        are fed a cached device-resident zero batch instead of paying a
        fresh host→device transfer every step (a stream that ends early
        would otherwise keep uploading pad frames for the rest of the
        run).  The SPMD step itself still runs on every device — with
        one stream per chip the devices execute in lockstep, so masking
        the compute would not shorten the step; the transfer is the
        real per-step cost that can be skipped.
        """
        s, b, h, w = frames.shape[:4]
        assert s == self.n_streams, f"need {self.n_streams} streams, got {s}"
        key = (h, w, b)
        fn = self._step_cache.get(key)
        if fn is None:
            fn = self._build_step((h, w), b)
            self._step_cache[key] = fn
        sharding = NamedSharding(self.mesh, P("dp"))
        if (
            isinstance(frames, np.ndarray)
            and active is not None
            and not all(active)
            and self.mesh.shape.get("mp", 1) == 1
        ):
            # one dp shard == one device: assemble per-stream shards,
            # uploading only the live ones
            devs = self.mesh.devices.reshape(-1)
            shards = []
            for i in range(s):
                if active[i]:
                    shards.append(jax.device_put(frames[i : i + 1], devs[i]))
                else:
                    z = self._zero_shards.get((h, w, b, i))
                    if z is None:
                        z = jax.device_put(
                            np.zeros((1, b, h, w, 3), np.uint8), devs[i]
                        )
                        self._zero_shards[(h, w, b, i)] = z
                    shards.append(z)
            frames_dev = jax.make_array_from_single_device_arrays(
                (s, b, h, w, 3), sharding, shards
            )
        else:
            frames_dev = (
                jax.device_put(frames, sharding)
                if isinstance(frames, np.ndarray) else frames
            )
        count = jnp.asarray(self.inner.gallery.count, jnp.int32)
        self.states, packed = fn(
            self.inner.engine.det_vars,
            self.inner.engine.enc_vars,
            getattr(self.inner.gallery, "gal_matmul", self.inner.gallery._gal),
            count,
            self.states,
            frames_dev,
        )
        return (packed, b)

    def collect(self, token):
        """→ list of S BatchResults (one per stream)."""
        packed, b = token
        arr = np.asarray(packed)
        return [
            unpack_results(arr[s], b, self.tcfg.max_tracks, self.cfg.embedding_dim)
            for s in range(self.n_streams)
        ]

    def process_batches(self, frames: np.ndarray):
        return self.collect(self.submit(frames))
