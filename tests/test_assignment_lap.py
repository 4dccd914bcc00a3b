"""Device-exact LAP (lap_assign) vs the float64 host Hungarian oracle.

VERDICT r1 #6: the batched scan path previously used greedy assignment
while the reference is Hungarian (sort_UKF.py:434).  These tests prove
the jitted JV solver reaches the exact optimum — on random instances,
on adversarial crossing/overlap scenes where greedy provably diverges,
and under masking/overflow (more detections than tracks).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from fire_tpu.config import TrackerConfig  # noqa: E402
from fire_tpu.track.assignment import (  # noqa: E402
    cost_matrix,
    greedy_assign,
    hungarian_assign,
    lap_assign,
)

GATE = (1.0 - 0.3) + 1.0  # reference gate at iou_threshold=0.3


def gated_total(cost, match):
    """Total cost of the gated matching + number of matched pairs."""
    pairs = [(int(d), t) for t, d in enumerate(np.asarray(match)) if d >= 0]
    return sum(float(cost[d, t]) for d, t in pairs), len(pairs)


def run_both(cost, det_mask, trk_mask, gate=GATE):
    dev = np.asarray(
        lap_assign(jnp.asarray(cost), jnp.asarray(det_mask), jnp.asarray(trk_mask), gate)
    )
    host = hungarian_assign(cost, det_mask, trk_mask, gate)
    return dev, host


@pytest.mark.parametrize("seed", range(20))
def test_random_instances_match_host_optimum(seed):
    rng = np.random.default_rng(seed)
    d, t = rng.integers(1, 12), rng.integers(1, 16)
    cost = rng.uniform(0.0, 3.0, (d, t)).astype(np.float32)
    det_mask = rng.random(d) < 0.85
    trk_mask = rng.random(t) < 0.85
    dev, host = run_both(cost, det_mask, trk_mask)
    td, nd = gated_total(cost, dev)
    th, nh = gated_total(cost, host)
    assert nd == nh, (dev, host)
    assert abs(td - th) < 1e-4, (td, th, dev, host)


def test_unique_optimum_identical_matches():
    """With continuous random costs the optimum is almost surely unique,
    so device and host must return the same assignment, not merely the
    same total.  (Integer-grid costs can tie across different pairings —
    0.01+0.04 == 0.02+0.03 — so uniform floats are the right probe.)"""
    rng = np.random.default_rng(42)
    for _ in range(10):
        d, t = 6, 9
        cost = rng.uniform(0.0, 1.0, (d, t)).astype(np.float32)
        det_mask = np.ones(d, bool)
        trk_mask = np.ones(t, bool)
        dev, host = run_both(cost, det_mask, trk_mask, gate=1e9)
        assert np.array_equal(dev, host), (dev, host)


def test_adversarial_greedy_suboptimal():
    """The classic greedy trap: greedy grabs (0,0)=1.0 then pays
    (1,1)=3.0 (total 4.0); the optimum is 1.1+1.2=2.3."""
    cost = np.array([[1.0, 1.2], [1.1, 3.0]], np.float32)
    m = np.ones(2, bool)
    dev, host = run_both(cost, m, m, gate=10.0)
    g = np.asarray(greedy_assign(jnp.asarray(cost), jnp.asarray(m), jnp.asarray(m), 10.0, 2))
    assert gated_total(cost, dev)[0] == pytest.approx(2.3, abs=1e-5)
    assert np.array_equal(dev, host)
    assert gated_total(cost, g)[0] == pytest.approx(4.0, abs=1e-5)  # greedy diverges


def test_overflow_more_dets_than_tracks():
    """d > t triggers the transposed solve; excess detections stay
    unmatched and the chosen pairs are still the rectangular optimum."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        d, t = 12, 5
        cost = rng.uniform(0.0, 3.0, (d, t)).astype(np.float32)
        dm = np.ones(d, bool)
        tm = rng.random(t) < 0.9
        dev, host = run_both(cost, dm, tm)
        td, nd = gated_total(cost, dev)
        th, nh = gated_total(cost, host)
        assert nd == nh and abs(td - th) < 1e-4


def test_gate_filters_exactly():
    cost = np.array([[0.5, 2.5], [2.4, 0.4]], np.float32)
    m = np.ones(2, bool)
    dev, _ = run_both(cost, m, m, gate=1.7)
    # optimum is diagonal (0.9); both under gate
    assert list(dev) == [0, 1]
    dev, _ = run_both(np.array([[0.5, 2.5], [2.4, 1.8]], np.float32), m, m, gate=1.7)
    # optimum 0.5+1.8: the 1.8 pair exceeds the gate and is dropped
    assert list(dev) == [0, -1]


def test_empty_masks():
    cost = np.ones((4, 6), np.float32)
    dev = np.asarray(
        lap_assign(jnp.asarray(cost), jnp.zeros(4, bool), jnp.ones(6, bool), GATE)
    )
    assert (dev == -1).all()
    dev = np.asarray(
        lap_assign(jnp.asarray(cost), jnp.ones(4, bool), jnp.zeros(6, bool), GATE)
    )
    assert (dev == -1).all()


def test_crossing_targets_scene_parity():
    """Two boxes swap positions over 30 frames (the case where greedy
    and Hungarian can split): device LAP tracks the reference optimum
    frame by frame on realistic SORT costs."""
    cfg = TrackerConfig()
    rng = np.random.default_rng(3)
    for f in range(30):
        a = np.array([100 + 10 * f, 200, 80, 90], np.float32)
        b = np.array([400 - 10 * f, 205, 80, 90], np.float32)
        dets = np.stack([a, b]) + rng.uniform(-2, 2, (2, 4)).astype(np.float32)
        # tracks predicted slightly behind the detections
        trks = np.stack([a, b]) + rng.uniform(-8, 8, (2, 4)).astype(np.float32)
        cost = np.asarray(cost_matrix(jnp.asarray(dets), jnp.asarray(trks),
                                      max_distance=cfg.max_distance))
        m = np.ones(2, bool)
        dev, host = run_both(cost, m, m)
        td, nd = gated_total(cost, dev)
        th, nh = gated_total(cost, host)
        assert nd == nh and abs(td - th) < 1e-4, f


def test_large_capacity_shapes():
    """Production shapes: 32 det slots x 64 track slots, sparse masks."""
    rng = np.random.default_rng(11)
    cost = rng.uniform(0.0, 13.0, (32, 64)).astype(np.float32)  # 1080p range
    dm = rng.random(32) < 0.3
    tm = rng.random(64) < 0.4
    dev, host = run_both(cost, dm, tm, gate=5.0)
    td, nd = gated_total(cost, dev)
    th, nh = gated_total(cost, host)
    assert nd == nh and abs(td - th) < 1e-3
