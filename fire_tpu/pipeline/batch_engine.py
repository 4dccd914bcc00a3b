"""Batched device-resident stream pipeline — the maximum-throughput path.

The reference processes one frame at a time with per-face encoder calls
(SURVEY.md §2.4: zero parallelism).  The orchestrator in
fire_tpu.pipeline.recognizer keeps that per-frame API; this module is
the TPU-first redesign for throughput: **B frames per device step**,
with one host→device transfer (the frame batch) and one device→host
transfer (a compact result struct) per step:

    detect:   detector CNN + decode + NMS vmapped over the batch
    encode:   top-K faces of every frame in one FaceNet pass
    match:    all embeddings against the gallery in one fused query
    track:    lax.scan over the frames (tracking is a serial recurrence;
              SURVEY.md §7 "sequential tracker state vs batched frames")

Semantic deltas vs the reference hot loop (deliberate, documented):

* Every detection is encoded (the reference's track-label cache exists
  to save per-face ONNX calls — face_recognition.py:408-410; on TPU a
  batch-64 FaceNet pass costs the same ~3ms as batch-4, so skipping
  encodes buys nothing).  Tracks still keep the FIRST matched gallery
  identity (tier-1 caching of the *decision* is preserved).
* The ≤200-entry recent-embedding cache (tier 2) is subsumed by the
  exact gallery search — it existed to avoid HNSW queries.
* Unknown enrollment is decided on device (per-track no-match streak ≥
  unknown_trigger_count) and executed by the host between batches, so a
  brand-new identity's label can lag its first emission by < B frames.

Tracking numerics (UKF, association, clamps, confirmation) are the
same jitted sort_step used by the parity-tested Sort class.
"""

from __future__ import annotations

import logging
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fire_tpu.config import RecognizerConfig, TrackerConfig
from fire_tpu.ops.gallery_match import l2_normalize
from fire_tpu.ops.image import bgr_to_rgb, crop_and_resize_mm, crop_selected_rows
from fire_tpu.track.sort import TrackTable, make_table, sort_step

log = logging.getLogger(__name__)


def _use_pallas_instep() -> bool:
    """Fused Pallas gallery top-1 inside the batched step — real TPU
    backends only (CPU tests take the XLA path; Pallas would need
    interpret mode there)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


class StreamState(NamedTuple):
    """Device-resident tracker + identity state."""

    table: TrackTable
    gid: jnp.ndarray       # (T,) int32 gallery row per track; -1 = none yet
    sim: jnp.ndarray       # (T,) f32 similarity at assignment time
    unk: jnp.ndarray       # (T,) int32 consecutive no-match sightings
    pending: jnp.ndarray   # (T,) bool — enrollment flagged, host not yet applied
    last_emb: jnp.ndarray  # (T, D) f32 last embedding per track


MAX_ENROLL = 8  # enrollment candidates surfaced to the host per batch


def _bucket_ladder(nk: int, buckets_opt) -> Tuple[int, ...]:
    """Static encoder bucket sizes for the exact cross-batch compaction.

    Returns an ascending tuple ending at ``nk`` (the lossless top rung).
    ``buckets_opt`` None → auto ladder ≈ [nk/8, nk/2, nk] rounded up to
    multiples of 8 (MXU-friendly encoder batches); explicit tuple →
    cleaned + nk appended; ``()`` → ``()`` (compaction disabled).  A
    ladder that collapses to just (nk,) signals the caller to use the
    plain full-batch path (no switch overhead for tiny steps).
    """
    if buckets_opt is not None and len(buckets_opt) == 0:
        return ()
    if buckets_opt is None:
        cand = [-(-nk // 8), -(-nk // 2)]
    else:
        cand = list(buckets_opt)
    up8 = lambda v: -(-int(v) // 8) * 8  # noqa: E731
    rungs = sorted({min(nk, max(8, up8(v))) for v in cand if v > 0})
    if not rungs or rungs[-1] != nk:
        rungs.append(nk)
    return tuple(r for r in rungs if r <= nk)


class BatchResults(NamedTuple):
    """Per-batch results (leading axis = frame).  On device these are
    packed into ONE flat f32 buffer before readback — each device→host
    transfer costs ~30 ms of latency on the tunnelled platform, so one
    readback per batch is a hard design rule here.

    Embeddings are NOT shipped per track: only up to MAX_ENROLL
    enrollment candidates (track crossed the unknown trigger) carry
    their embedding to the host.
    """

    tid: jnp.ndarray           # (B, T) int32
    boxes: jnp.ndarray         # (B, T, 4) int32
    gid: jnp.ndarray           # (B, T) int32 (-1 = unlabelled)
    sim: jnp.ndarray           # (B, T) f32
    mask: jnp.ndarray          # (B, T) bool confirmed tracks
    enroll: jnp.ndarray        # (B, T) bool — crossed the unknown trigger
    enroll_emb: jnp.ndarray    # (MAX_ENROLL, D) f32
    enroll_frame: jnp.ndarray  # (MAX_ENROLL,) int32 (-1 = empty slot)
    enroll_slot: jnp.ndarray   # (MAX_ENROLL,) int32


def make_stream_state(tcfg: TrackerConfig, dim: int) -> StreamState:
    t = tcfg.max_tracks
    return StreamState(
        table=make_table(tcfg),
        gid=jnp.full((t,), -1, jnp.int32),
        sim=jnp.zeros((t,), jnp.float32),
        unk=jnp.zeros((t,), jnp.int32),
        pending=jnp.zeros((t,), bool),
        last_emb=jnp.zeros((t, dim), jnp.float32),
    )


def _track_scan(
    state: StreamState,
    det_boxes: jnp.ndarray,   # (B, K, 4)
    det_mask: jnp.ndarray,    # (B, K)
    det_gid: jnp.ndarray,     # (B, K) best gallery row per detection
    det_sim: jnp.ndarray,     # (B, K)
    det_emb: jnp.ndarray,     # (B, K, D)
    det_has_emb: jnp.ndarray,  # (B, K) detection carries an embedding
    tcfg: TrackerConfig,
    similarity_threshold: float,
    unknown_trigger: int,
) -> Tuple[StreamState, BatchResults]:
    """Serial tracking over the frame batch with identity bookkeeping.

    ``det_has_emb`` decouples tracking from encoding: under an encode
    budget a low-scoring detection may be tracked without an embedding
    this batch — it must neither overwrite ``last_emb`` with zeros nor
    advance the unknown streak (else a zero embedding could enroll).
    """

    t_cap = state.table.x.shape[0]

    def step(carry: StreamState, frame):
        boxes, mask, gids, sims, embs, hembs = frame
        table, out = sort_step(carry.table, boxes, mask, tcfg)

        # exact provenance from the tracker: detection that updated or
        # spawned each track this frame (TrackOutputs.src_det)
        has_det = (out.src_det >= 0) & table.active
        det_for_track = jnp.clip(out.src_det, 0, boxes.shape[0] - 1)

        has_emb = has_det & hembs[det_for_track]
        tgid = jnp.where(has_det, gids[det_for_track], -1)
        tsim = jnp.where(has_det, sims[det_for_track], 0.0)
        temb = jnp.where(has_emb[:, None], embs[det_for_track], carry.last_emb)

        # fresh slots (spawned or recycled) reset identity state
        fresh = table.tid != carry.table.tid
        gid = jnp.where(fresh, -1, carry.gid)
        sim = jnp.where(fresh, 0.0, carry.sim)
        unk = jnp.where(fresh, 0, carry.unk)
        pending = jnp.where(fresh, False, carry.pending)

        matched_now = has_det & (tsim > similarity_threshold)
        # tier-1 semantics: keep the first assigned identity
        take = matched_now & (gid < 0)
        gid = jnp.where(take, tgid, gid)
        sim = jnp.where(take, tsim, sim)
        pending = pending & (gid < 0)  # identity arrived → clear

        # unknown streak: CONFIRMED sightings with an embedding but no
        # identity (the reference accumulates unknowns only for emitted
        # tracks, face_recognition.py:404-473); flag enrollment ONCE per
        # track until the host resolves it.  Budget-unencoded sightings
        # don't count — enrollment must carry a real embedding.
        sighted = has_emb & (gid < 0) & out.mask
        unk = jnp.where(sighted, unk + 1, unk)
        enroll = sighted & (unk >= unknown_trigger) & ~pending
        pending = pending | enroll

        new_state = StreamState(table=table, gid=gid, sim=sim, unk=unk,
                                pending=pending, last_emb=temb)
        res = (
            out.tid,
            out.boxes,
            gid,
            jnp.where(gid >= 0, sim, 0.0),
            out.mask,
            enroll & out.mask,
            temb,
        )
        return new_state, res

    state, (tid, boxes, gid, sim, mask, enroll, emb) = jax.lax.scan(
        step, state,
        (det_boxes, det_mask, det_gid, det_sim, det_emb, det_has_emb),
    )

    # compact the (rare) enrollment candidates to a fixed-size buffer
    b = tid.shape[0]
    flat_enroll = enroll.reshape(-1)
    _, top = jax.lax.top_k(flat_enroll.astype(jnp.int32), MAX_ENROLL)
    valid = flat_enroll[top]
    e_frame = jnp.where(valid, (top // t_cap).astype(jnp.int32), -1)
    e_slot = (top % t_cap).astype(jnp.int32)
    e_emb = emb.reshape(b * t_cap, -1)[top] * valid[:, None]

    # Starvation guard: a track that fired `enroll` but was compacted
    # out of the MAX_ENROLL buffer latched pending=True without ever
    # reaching the host — clear pending for the undelivered so enroll
    # re-fires next batch (a crowd of >8 new identities in one batch
    # enrolls across ceil(n/8) batches instead of never).
    delivered = jnp.zeros((t_cap,), bool).at[
        jnp.where(valid, e_slot, t_cap)
    ].set(True, mode="drop")
    fired = enroll.any(axis=0)
    state = state._replace(pending=state.pending & ~(fired & ~delivered))
    return state, BatchResults(
        tid, boxes, gid, sim, mask, enroll, e_emb, e_frame, e_slot
    )


def pack_results(res: BatchResults) -> jnp.ndarray:
    """Flatten a BatchResults into one **int32** vector (single D2H).

    The carrier is int32, not f32: small ints bit-cast into f32 are
    denormals, and the TPU pipeline flushes denormals to zero (verified
    on hardware — ids/boxes read back as 0).  Integer lanes ride as
    values (exact at any magnitude, unlike value-casting through f32
    which is exact only up to 2^24); f32 lanes are bit-cast into the
    int32 buffer, which is lossless both ways."""
    parts = []
    for x in res:
        if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == bool:
            parts.append(jnp.ravel(x).astype(jnp.int32))
        else:
            parts.append(jax.lax.bitcast_convert_type(
                jnp.ravel(x).astype(jnp.float32), jnp.int32))
    return jnp.concatenate(parts)


def unpack_results(buf: np.ndarray, b: int, t: int, d: int) -> BatchResults:
    """Host-side inverse of :func:`pack_results` (buf: int32)."""
    sizes = [b * t, b * t * 4, b * t, b * t, b * t, b * t,
             MAX_ENROLL * d, MAX_ENROLL, MAX_ENROLL]
    shapes = [(b, t), (b, t, 4), (b, t), (b, t), (b, t), (b, t),
              (MAX_ENROLL, d), (MAX_ENROLL,), (MAX_ENROLL,)]
    dtypes = [np.int32, np.int32, np.int32, np.float32, bool, bool,
              np.float32, np.int32, np.int32]
    out, off = [], 0
    for n, shp, dt in zip(sizes, shapes, dtypes):
        chunk = buf[off : off + n]
        if dt == np.float32:
            out.append(chunk.view(np.float32).reshape(shp))
        elif dt == bool:
            out.append((chunk != 0).reshape(shp))
        else:
            out.append(chunk.reshape(shp))
        off += n
    return BatchResults(*out)


class BatchStreamEngine:
    """Runs the batched pipeline; owns the jitted step per frame shape."""

    def __init__(self, engine, gallery, cfg: RecognizerConfig,
                 tracker_cfg: Optional[TrackerConfig] = None,
                 encode_k: int = 8, detection_interval: int = 1,
                 encode_budget: Optional[int] = None,
                 encode_buckets: Optional[Tuple[int, ...]] = None):
        """``detection_interval`` d>1 runs the detector CNN only on every
        d-th frame of a batch (frame-skip semantics,
        face_recognition.py:376-393) — the tracker coasts on UKF
        prediction between detections and the detector/encoder cost
        drops by ~d×.  Batch size must be a multiple of d.

        ``encode_budget`` caps crop+encode+match work per batch: the
        batch's detections are ranked by detector score and only the
        top ``encode_budget`` are cropped/encoded/matched (the rest are
        still tracked, just without an embedding this batch — they get
        encoded on a later sighting once they rank inside the budget).
        ``encode_k`` stays the per-frame *tracking* capacity.  A 4-face
        scene at encode_k=8 wastes half the encoder batch on pad slots;
        budget = faces/frame × B reclaims it (the encoder is ~48% of
        the fused step at B=256 — docs/DESIGN.md §3).

        ``encode_buckets`` (budget=None only) controls the default
        *exact* cross-batch compaction (round 5): the step counts the
        batch's real detections ON DEVICE and ``lax.switch``es into the
        smallest compiled encoder bucket that holds all of them — every
        detection is still encoded (identical semantics to the legacy
        full-B·K path, unlike ``encode_budget``'s top-N drop), but a
        ~1-face/frame workload runs crop+encode+match at M≈B·K/8
        instead of B·K pad-heavy slots.  None = auto ladder
        (≈[B·K/8, B·K/2, B·K]); an explicit tuple sets the ladder (B·K
        is always appended so the top bucket stays lossless); an empty
        tuple ``()`` disables compaction (the pre-round-5 full path)."""
        self.engine = engine          # DeviceEngine (models + jits)
        self.gallery = gallery        # DeviceGallery
        self.cfg = cfg
        self.tcfg = (tracker_cfg or TrackerConfig())
        self.encode_k = encode_k
        self.encode_budget = encode_budget
        self.encode_buckets = encode_buckets
        self.interval = max(1, detection_interval)
        self.state = make_stream_state(self.tcfg, cfg.embedding_dim)
        self._step_cache = {}

    def reset(self):
        self.state = make_stream_state(self.tcfg, self.cfg.embedding_dim)

    def _build_step(self, frame_hw, batch: int):
        cfg, tcfg, k_enc = self.cfg, self.tcfg, self.encode_k
        budget = self.encode_budget
        buckets_opt = self.encode_buckets
        eng = self.engine
        detector_fn = eng._build_detect(frame_hw).__wrapped__  # unjitted body
        thr = cfg.similarity_threshold
        trig = cfg.unknown_trigger_count
        size = cfg.engine.encode_size

        t_cap = self.tcfg.max_tracks
        dim = cfg.embedding_dim

        interval = self.interval
        if batch % interval != 0:
            raise ValueError(f"batch {batch} not a multiple of detection_interval {interval}")
        n_det = batch // interval

        def step(det_vars, enc_vars, gal, count, state, frames_u8):
            # ---- detect (vmapped over every interval-th frame only —
            # frame-skip semantics, face_recognition.py:376-393).  The
            # per-frame path detects 1-based global frames d, 2d, … =
            # 0-based indices d-1, 2d-1, …; batch % interval == 0 keeps
            # that phase stable across batch boundaries, so local index
            # l is a detect frame iff l % d == d-1 — exactly the
            # reference's `frame_count % interval == 0` (tested in
            # tests/test_batch_engine.py::test_frame_skip_phase_parity).
            det_frames = (
                frames_u8[interval - 1 :: interval] if interval > 1 else frames_u8
            )
            dets = jax.vmap(lambda f: detector_fn(det_vars, f))(det_frames)
            # keep top-k detections per frame for encoding/tracking
            # (clamped to the detector's padded slot count — a backend
            # emitting fewer than k_enc slots must not misfold the
            # encoder output batch)
            k = min(k_enc, dets.mask.shape[1])
            scores_raw = jnp.where(dets.mask, dets.scores.astype(jnp.float32), -1.0)
            order = jnp.argsort(-scores_raw, axis=1)
            pick = order[:, :k]                                   # (n_det, K)
            boxes = jnp.take_along_axis(dets.boxes_xywh, pick[..., None], axis=1)
            mask = jnp.take_along_axis(dets.mask, pick, axis=1)

            # ---- encode in one FaceNet pass (crop directly from uint8;
            # bf16 cast happens in the resampler — no full-res f32
            # intermediate).  The batch's detections are first compacted
            # across frames: the crop, the encoder and the gallery match
            # run on M inputs instead of B·K pad-heavy slots (the
            # encoder is the step's largest stage — docs/DESIGN.md §3
            # profile).  M is either the opt-in `encode_budget` (top-M
            # by score, may drop) or — the round-5 default — the
            # smallest static bucket that holds ALL real detections,
            # picked on device via lax.switch (exact semantics).
            nk = n_det * k
            enc_fn = getattr(eng, "_enc_fn", None) or eng.encoder.apply

            def match(emb_q):
                # one fused gallery pass.  On real TPU the Pallas top-1
                # runs in-step: with the resident bf16 gallery and
                # 2048-row tiles it beats XLA's matmul+top_k by ~2x in
                # compute at this scale (B=1024 queries vs 100k rows:
                # 31.2 vs 34.4 ms/call incl. the ~27 ms dispatch floor
                # — bench_gallery.py, v5e).
                if _use_pallas_instep():
                    from fire_tpu.ops.pallas_topk import pallas_cosine_top1

                    return pallas_cosine_top1(emb_q, gal, count)
                from fire_tpu.ops.gallery_match import cosine_topk

                valid = jnp.arange(gal.shape[0]) < count
                sims, idx = cosine_topk(emb_q, gal, valid, k=1)
                return sims[:, 0], idx[:, 0]

            scores = jnp.take_along_axis(scores_raw, pick, axis=1)
            flat_scores = jnp.where(mask, scores, -1.0).reshape(-1)
            boxes_flat = boxes.reshape(-1, 4)

            def encode_compacted(m):
                """Crop+encode+match the top-m detections, scattered back
                to (n_det, k) slots; unencoded slots carry emb=0/sim=0/
                gid=-1 and a False has_emb so the tracker treats them as
                tracked-but-not-encoded (no zero-embedding enrollment)."""
                top_s, top_idx = jax.lax.top_k(flat_scores, m)
                sel_valid = top_s >= 0.0
                sel_frame = (top_idx // k).astype(jnp.int32)
                sel_boxes = boxes_flat[top_idx]
                crops = crop_selected_rows(det_frames, sel_frame, sel_boxes, size)
                flat = bgr_to_rgb(crops / 255.0).reshape((-1, *size, 3))
                emb_q = l2_normalize(enc_fn(enc_vars, flat).astype(jnp.float32))
                sims, idx = match(emb_q)
                dim_e = emb_q.shape[-1]
                emb = (jnp.zeros((nk, dim_e), emb_q.dtype)
                       .at[top_idx].set(emb_q * sel_valid[:, None]))
                det_sim = (jnp.zeros((nk,), jnp.float32)
                           .at[top_idx].set(sims * sel_valid))
                det_gid = (jnp.full((nk,), -1, jnp.int32)
                           .at[top_idx].set(jnp.where(sel_valid, idx, -1)))
                has_emb = jnp.zeros((nk,), bool).at[top_idx].set(sel_valid)
                return (emb.reshape(n_det, k, dim_e),
                        det_sim.reshape(n_det, k),
                        det_gid.reshape(n_det, k),
                        has_emb.reshape(n_det, k))

            if budget is not None:
                emb, det_sim, det_gid, has_emb = encode_compacted(
                    max(1, min(budget, nk))
                )
            else:
                def encode_full(_=None):
                    """Legacy full-B·K path: one vmapped crop per slot.
                    Cheaper than the gather at m=nk (crop_selected_rows
                    chunks the gather into sequential lax.map slices to
                    bound its row-gather temp — at the top rung that
                    serialization costs more than the pad it avoids), so
                    the ladder's lossless top rung runs this instead.
                    Invalid slots are masked to the same fills as
                    encode_compacted so every switch branch agrees."""
                    crops = jax.vmap(
                        lambda img, b: crop_and_resize_mm(img, b, size)
                    )(det_frames, boxes)
                    flat = bgr_to_rgb(crops / 255.0).reshape((-1, *size, 3))
                    emb_q = l2_normalize(enc_fn(enc_vars, flat).astype(jnp.float32))
                    sims, idx = match(emb_q)
                    emb = emb_q.reshape(n_det, k, -1) * mask[..., None]
                    det_sim = jnp.where(mask, sims.reshape(n_det, k), 0.0)
                    det_gid = jnp.where(mask, idx.reshape(n_det, k), -1)
                    return emb, det_sim, det_gid, mask

                buckets = _bucket_ladder(nk, buckets_opt)
                if buckets == (nk,) or not buckets:
                    # no useful ladder (tiny batches / compaction off)
                    emb, det_sim, det_gid, has_emb = encode_full()
                else:
                    # exact bucketed compaction: every real detection is
                    # inside the chosen bucket (the ladder ends at nk),
                    # so semantics are identical to the full path — XLA
                    # compiles one crop+encode+match program per bucket
                    # and the device executes exactly one.  The top
                    # (=nk) rung IS the full path: see encode_full.
                    n_real = mask.sum()
                    sel = jnp.searchsorted(
                        jnp.asarray(buckets, jnp.int32), n_real, side="left"
                    )
                    emb, det_sim, det_gid, has_emb = jax.lax.switch(
                        sel,
                        [lambda _=None, m=m: encode_compacted(m)
                         for m in buckets[:-1]] + [encode_full],
                    )

            if interval > 1:
                # scatter detections back to full-batch arrays: coast
                # frames carry an all-False mask (tracker.update([]))
                def expand(x, fill=0):
                    full = jnp.full((batch, *x.shape[1:]), fill, x.dtype)
                    return full.at[interval - 1 :: interval].set(x)

                boxes = expand(boxes.astype(jnp.float32))
                mask = expand(mask, fill=False)
                det_gid = expand(det_gid)
                det_sim = expand(det_sim)
                emb = expand(emb)
                has_emb = expand(has_emb, fill=False)

            # ---- serial tracking over the batch
            new_state, res = _track_scan(
                state, boxes.astype(jnp.float32), mask, det_gid, det_sim, emb,
                has_emb, tcfg, thr, trig,
            )
            return new_state, pack_results(res)

        return jax.jit(step)

    def submit(self, frames: np.ndarray):
        """Dispatch one batch asynchronously; returns an opaque token.

        Submitting batch i+1 before collecting batch i overlaps its
        compute and the frame H2D with batch i's readback — the device
        queue provides the double buffering.
        """
        b, h, w = frames.shape[:3]
        key = (h, w, b)
        fn = self._step_cache.get(key)
        if fn is None:
            fn = self._build_step((h, w), b)
            self._step_cache[key] = fn
        frames_dev = jax.device_put(frames) if isinstance(frames, np.ndarray) else frames
        self.state, packed = fn(
            self.engine.det_vars,
            self.engine.enc_vars,
            getattr(self.gallery, "gal_matmul", self.gallery._gal),
            self.gallery.count,
            self.state,
            frames_dev,
        )
        return (packed, b)

    def collect(self, token) -> BatchResults:
        """Block on one submitted batch and unpack its results."""
        packed, b = token
        return unpack_results(
            np.asarray(packed), b, self.tcfg.max_tracks, self.cfg.embedding_dim
        )

    def process_batch(self, frames: np.ndarray) -> BatchResults:
        """Synchronous convenience wrapper (submit + collect)."""
        return self.collect(self.submit(frames))


def stream_results(
    recognizer,
    batch_results: BatchResults,
    rename_label: Optional[str] = None,
):
    """Host-side interpretation of one BatchResults: label lookup,
    unknown enrollment (dedup + SQLite + gallery append), rename and
    interested_label semantics — mirrors face_recognition.py:459-486 at
    batch granularity.

    Yields one ``[{'label','confidence','bbox'}, ...]`` list per frame.
    """
    res = batch_results
    b = res.tid.shape[0]
    gal = recognizer.gallery
    enroll_embs = {
        (int(fr), int(sl)): res.enroll_emb[i]
        for i, (fr, sl) in enumerate(zip(res.enroll_frame, res.enroll_slot))
        if fr >= 0
    }
    enrolled_labels = {}  # tid -> label assigned this batch
    for f in range(b):
        frame_out = []
        for slot in np.nonzero(res.mask[f])[0]:
            gid = int(res.gid[f, slot])
            tid = int(res.tid[f, slot])
            if gid >= 0 and gid < gal.count:
                label = gal.labels[gid]
                conf = float(res.sim[f, slot])
                if rename_label and label != rename_label:
                    recognizer.update_label(gid, rename_label)
                    label = rename_label
            elif tid in enrolled_labels:
                label, conf = enrolled_labels[tid], 1.0
            elif res.enroll[f, slot] and (f, int(slot)) in enroll_embs:
                emb = enroll_embs[(f, int(slot))]
                n = np.linalg.norm(emb)
                if n == 0:
                    continue
                # device_checked: the enroll flag itself proves this
                # embedding scored <= similarity_threshold against the
                # gallery snapshot at step time (a higher score would
                # have assigned the track an identity instead), so the
                # host only has to dedup against post-snapshot
                # enrollments — the recognizer's recent window.
                label = recognizer.enroll_unknown_now(
                    emb / n, rename_label, device_checked=True
                )
                enrolled_labels[tid] = label
                conf = 1.0
            else:
                label, conf = "Unknown", 0.0
            if (
                recognizer.interested_label is not None
                and label != recognizer.interested_label
            ):
                continue
            frame_out.append(
                {
                    "label": label,
                    "confidence": conf,
                    "bbox": [int(v) for v in res.boxes[f, slot]],
                }
            )
        yield frame_out
