"""SORT behavioural parity vs the float64 golden oracle."""

import numpy as np
import pytest

from fire_tpu.config import TrackerConfig
from fire_tpu.track.sort import Sort
from tests.golden_sort import GoldenSort, NumpyMerweUKF  # noqa: F401


def synth_scene(n_frames=40, seed=0, dropout=0.0):
    """Two faces moving on crossing diagonals + one entering at frame 15."""
    rng = np.random.default_rng(seed)
    frames = []
    for f in range(n_frames):
        dets = []
        a = [50 + 4 * f, 60 + 2 * f, 80, 90]
        b = [500 - 4 * f, 80 + 3 * f, 70, 75]
        boxes = [a, b]
        if f >= 15:
            boxes.append([300, 400 - 2 * (f - 15), 60, 60])
        for box in boxes:
            if rng.random() < dropout:
                continue
            noisy = [v + rng.integers(-2, 3) for v in box]
            dets.append({"bbox": noisy, "confidence": 0.95})
        frames.append(dets)
    return frames


def run_pair(frames, assignment="hungarian", use_ukf=True, skip_every=0):
    cfg = TrackerConfig(assignment=assignment)
    ours = Sort(cfg)
    gold = GoldenSort(max_age=cfg.max_age, min_hits=cfg.min_hits,
                      iou_threshold=cfg.iou_threshold, use_ukf=use_ukf)
    ours_out, gold_out = [], []
    for i, dets in enumerate(frames):
        d = [] if (skip_every and i % skip_every) else dets
        ours_out.append(ours.update(d))
        gold_out.append(gold.update(d))
    return ours_out, gold_out


def assert_tracks_match(ours_out, gold_out, box_atol=2):
    for f, (ours, gold) in enumerate(zip(ours_out, gold_out)):
        o = {t["id"]: t for t in ours}
        g = {t["id"]: t for t in gold}
        assert set(o) == set(g), f"frame {f}: ids {sorted(o)} vs {sorted(g)}"
        for tid in g:
            ob, gb = np.asarray(o[tid]["bbox"]), np.asarray(g[tid]["bbox"])
            assert np.abs(ob - gb).max() <= box_atol, (f, tid, ob, gb)
            assert o[tid]["age"] == g[tid]["age"], (f, tid)


def test_sort_matches_golden_hungarian():
    frames = synth_scene()
    ours_out, gold_out = run_pair(frames, "hungarian")
    # confirmation timing: spawn on frame 1, 4 updates → first emission
    # on frame 5 (min_hits=4)
    assert all(len(t) == 0 for t in ours_out[:4])
    assert len(ours_out[4]) == 2
    assert_tracks_match(ours_out, gold_out)


def test_sort_matches_golden_with_dropout():
    frames = synth_scene(dropout=0.2, seed=3)
    ours_out, gold_out = run_pair(frames, "hungarian")
    assert_tracks_match(ours_out, gold_out)


def test_sort_frame_skip_coasting():
    """detection_interval-style skipping: tracker.update([]) coasts on
    prediction (face_recognition.py:392-393) and prunes at max_age."""
    frames = synth_scene()
    ours_out, gold_out = run_pair(frames, "hungarian", skip_every=2)
    assert_tracks_match(ours_out, gold_out)


def test_greedy_equals_hungarian_on_typical_scene():
    frames = synth_scene(seed=7)
    g_out, _ = run_pair(frames, "greedy")
    h_out, _ = run_pair(frames, "hungarian")
    for f, (a, b) in enumerate(zip(g_out, h_out)):
        ka = {t["id"]: tuple(t["bbox"]) for t in a}
        kb = {t["id"]: tuple(t["bbox"]) for t in b}
        assert ka == kb, f"frame {f}"


def test_track_death_and_id_reuse_slots():
    """All detections vanish → tracks die after max_age frames; new
    detections then get fresh ids (never reused)."""
    cfg = TrackerConfig()
    s = Sort(cfg)
    for _ in range(6):
        out = s.update([{"bbox": [10, 10, 50, 50], "confidence": 1.0}])
    assert len(out) == 1 and out[0]["id"] == 0
    for _ in range(cfg.max_age + 1):
        s.update([])
    out = s.update([{"bbox": [200, 200, 40, 40], "confidence": 1.0}])
    for _ in range(5):
        out = s.update([{"bbox": [200, 200, 40, 40], "confidence": 1.0}])
    assert len(out) == 1 and out[0]["id"] == 1


def test_empty_updates_noop():
    s = Sort(TrackerConfig())
    for _ in range(5):
        assert s.update([]) == []


def test_capacity_overflow_graceful():
    """More detections than free slots: extras are dropped, no crash."""
    cfg = TrackerConfig(max_tracks=8)
    s = Sort(cfg, max_dets=32)
    dets = [{"bbox": [i * 60, 10, 50, 50], "confidence": 1.0} for i in range(20)]
    for _ in range(6):
        out = s.update(dets)
    assert len(out) == 8
