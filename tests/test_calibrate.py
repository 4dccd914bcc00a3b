"""Threshold-calibration harness (fire_tpu.calibrate) unit tests.

The sweep math is pure numpy; the production-path collector is covered
by the CPU smoke run in the module docstring and the TPU round-4 A/B
(docs/DESIGN.md).  Reference context: modules/face_recognition.py:342-367
hard-wires 0.7 and merges identities when an imposter similarity lands
just above it — calibrate.sweep is how we pick a better operating point.
"""

import numpy as np

from fire_tpu.calibrate import _best_iou_box, sweep


def test_sweep_separable_distributions():
    rng = np.random.default_rng(0)
    gen = rng.uniform(0.85, 0.99, 200)
    imp = rng.uniform(0.05, 0.55, 800)
    scores = np.concatenate([gen, imp])
    is_same = np.concatenate([np.ones(200, bool), np.zeros(800, bool)])
    out = sweep(scores, is_same, candidates=[0.7, 0.8])
    assert out["n_genuine"] == 200 and out["n_imposter"] == 800
    # fully separable: both candidates inside the gap have FAR=FRR=0
    for row in out["sweep"]:
        assert row["far"] == 0.0 and row["frr"] == 0.0
    # suggested threshold falls in the empirical gap
    assert 0.55 <= out["suggested_threshold"] <= 0.85
    assert out["genuine"]["min"] > out["imposter"]["max"]


def test_sweep_overlapping_distributions_reports_tradeoff():
    rng = np.random.default_rng(1)
    gen = rng.uniform(0.6, 0.95, 300)
    imp = rng.uniform(0.3, 0.75, 300)
    scores = np.concatenate([gen, imp])
    is_same = np.concatenate([np.ones(300, bool), np.zeros(300, bool)])
    out = sweep(scores, is_same, candidates=[0.5, 0.7, 0.9])
    by_th = {r["threshold"]: r for r in out["sweep"]}
    # monotone: raising the threshold can only lower FAR and raise FRR
    assert by_th[0.5]["far"] >= by_th[0.7]["far"] >= by_th[0.9]["far"]
    assert by_th[0.5]["frr"] <= by_th[0.7]["frr"] <= by_th[0.9]["frr"]
    # youden threshold sits inside the overlap region
    assert 0.3 < out["youden_threshold"] < 0.95


def test_best_iou_box_picks_overlap():
    dets = np.array([[0, 0, 10, 10], [50, 50, 30, 30], [48, 52, 28, 30]],
                    np.float32)
    gt = np.array([50, 50, 30, 30], np.float32)
    idx, iou = _best_iou_box(dets, gt)
    assert idx == 1 and iou == 1.0
    idx2, iou2 = _best_iou_box(dets[:1], gt)
    assert iou2 == 0.0
