"""End-to-end scorer tests (fire_tpu.eval_e2e.score_video): the metric
logic is pinned with stub recognizers before the real trained stack
uses it."""

import numpy as np
import pytest

from fire_tpu.eval_e2e import score_video
from fire_tpu.train.scenes import make_identities, render_scene_video


@pytest.fixture(scope="module")
def video_and_gt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    idents = make_identities(2, seed=3)
    path = str(tmp / "gt.avi")
    gt = render_scene_video(path, idents, hw=(120, 160), n_frames=8,
                            face_px=40, seed=1)
    return path, gt


class StubFR:
    """Emits scripted per-frame results; recognize_faces is driven by a
    frame counter against the GT list."""

    def __init__(self, gt, labeler):
        self.gt = gt
        self.labeler = labeler
        self.f = 0

    def recognize_faces(self, frame):
        boxes, ids = self.gt[self.f]
        out = [
            {"label": self.labeler(gid, self.f), "confidence": 1.0,
             "bbox": [float(v) for v in b]}
            for b, gid in zip(boxes, ids)
        ]
        self.f += 1
        return out


def test_score_video_perfect(video_and_gt):
    path, gt = video_and_gt
    fr = StubFR(gt, lambda gid, f: f"L{gid}")
    m = score_video(fr, path, gt)
    assert m["det_recall"] == 1.0 and m["det_precision"] == 1.0
    assert m["id_consistency"] == 1.0
    assert m["id_separation"] == 1.0
    assert m["identities"] == 2 and m["distinct_labels"] == 2


def test_score_video_label_flapping(video_and_gt):
    path, gt = video_and_gt
    # identity 0's label flips every frame -> consistency drops
    fr = StubFR(gt, lambda gid, f: f"L{gid}_{f % 2}" if gid == 0 else "Lx")
    m = score_video(fr, path, gt)
    assert m["id_consistency"] < 1.0
    assert m["det_recall"] == 1.0


def test_score_video_missed_and_spurious(video_and_gt):
    path, gt = video_and_gt

    class Miss(StubFR):
        def recognize_faces(self, frame):
            out = super().recognize_faces(frame)
            out = out[:1]  # drop the second face every frame
            out.append({"label": "ghost", "confidence": 1.0,
                        "bbox": [0.0, 0.0, 10.0, 10.0]})  # spurious
            return out

    fr = Miss(gt, lambda gid, f: f"L{gid}")
    m = score_video(fr, path, gt)
    assert m["det_recall"] == pytest.approx(0.5)
    assert m["det_precision"] == pytest.approx(0.5)
