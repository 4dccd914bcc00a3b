"""Identification evaluation: verification ROC / AUC over embeddings.

The reference reports identification AUC 0.991 on CASIA-FaceV5
(README.md:55,60) and that cosine similarity consistently beats
Euclidean (README.md:59) but ships no evaluation code.  This harness
supplies it: given labeled embeddings (or a directory of per-identity
face folders run through the engine), compute the all-pairs
same/different-identity verification ROC AUC for both metrics.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np


def pair_scores(
    embeddings: np.ndarray, labels: Sequence, metric: str = "cosine"
) -> Tuple[np.ndarray, np.ndarray]:
    """All-pairs scores + same-identity ground truth.

    Args:
      embeddings: (N, D); labels: length-N identity ids.
    Returns:
      (scores (N·(N−1)/2,), is_same (N·(N−1)/2,) bool) — higher score
      must mean "more likely same" (Euclidean distances are negated).
    """
    emb = np.asarray(embeddings, np.float32)
    if metric == "cosine":
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(norm, 1e-12)
        sims = emb @ emb.T
    elif metric == "euclidean":
        d2 = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
        sims = -np.sqrt(np.maximum(d2, 0.0))
    else:
        raise ValueError(f"unknown metric {metric}")
    labels = np.asarray(labels)
    iu = np.triu_indices(len(labels), k=1)
    return sims[iu], labels[:, None][iu[0], 0] == labels[iu[1]]


def roc_auc(scores: np.ndarray, is_same: np.ndarray) -> float:
    """AUC via the Mann-Whitney U statistic (rank-based, tie-aware)."""
    scores = np.asarray(scores, np.float64)
    pos = is_same.astype(bool)
    n_pos = int(pos.sum())
    n_neg = int((~pos).sum())
    if n_pos == 0 or n_neg == 0:
        raise ValueError("need both positive and negative pairs")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty_like(scores)
    ranks[order] = np.arange(1, len(scores) + 1, dtype=np.float64)
    # average ranks over ties
    sorted_scores = scores[order]
    i = 0
    while i < len(sorted_scores):
        j = i
        while j + 1 < len(sorted_scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
        i = j + 1
    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


def identification_auc(
    embeddings: np.ndarray, labels: Sequence, metrics: Sequence[str] = ("cosine", "euclidean")
) -> Dict[str, float]:
    """AUC per similarity metric — reproduces the reference's
    cosine-vs-Euclidean comparison (README.md:59)."""
    out = {}
    for m in metrics:
        s, y = pair_scores(embeddings, labels, m)
        out[m] = roc_auc(s, y)
    return out


def encode_directory(engine, root: str, size=(160, 160)):
    """Encode every ``root/<identity>/*`` image directly (no detection):
    images are presumed pre-cropped faces (the identity-folder training
    layout).  Returns (embeddings (N, D), labels)."""
    import os

    import cv2

    embs: List[np.ndarray] = []
    labels: List[str] = []
    for ident in sorted(os.listdir(root)):
        d = os.path.join(root, ident)
        if not os.path.isdir(d):
            continue
        batch, names = [], []
        for fname in sorted(os.listdir(d)):
            if not fname.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                continue
            img = cv2.imread(os.path.join(d, fname))
            if img is None:
                continue
            img = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_AREA)
            batch.append(img[..., ::-1].astype(np.float32) / 255.0)  # BGR→RGB [0,1]
            names.append(ident)
        if batch:
            embs.extend(engine.encode_faces(np.stack(batch)))
            labels.extend(names)
    if not embs:
        raise ValueError(
            f"no decodable images found under {root!r}: expected the "
            "identity-folder layout <root>/<identity>/*.{jpg,png,bmp}"
        )
    return np.stack(embs), labels


def evaluate_directory(engine, root: str, align: bool = True) -> Dict[str, float]:
    """CASIA-FaceV5-style evaluation: ``root/<identity>/*.{jpg,png,bmp}``
    → detect+align+encode every image with the live engine → AUC."""
    import os

    import cv2

    embs: List[np.ndarray] = []
    labels: List[str] = []
    for ident in sorted(os.listdir(root)):
        d = os.path.join(root, ident)
        if not os.path.isdir(d):
            continue
        for fname in sorted(os.listdir(d)):
            if not fname.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                continue
            img = cv2.imread(os.path.join(d, fname))
            if img is None:
                continue
            faces = engine.extract_faces(img, align=align)
            if not faces:
                continue
            emb = engine.encode_faces(np.stack(faces[:1]))[0]
            if np.linalg.norm(emb) == 0:
                continue
            embs.append(emb)
            labels.append(ident)
    if len(set(labels)) < 2:
        raise ValueError("need at least two identities with detected faces")
    return identification_auc(np.stack(embs), labels)


def main() -> None:
    """``python -m fire_tpu.eval --data DIR`` — verification AUC of the
    live engine on an identity-folder dataset; ``--trained`` loads
    encoder variables from ``python -m fire_tpu.train`` first.

    With ``--detect`` the full detect→align→encode path runs per image
    (CASIA-style photos); default encodes pre-cropped faces directly.
    """
    import argparse
    import json

    ap = argparse.ArgumentParser(description="FIRE-TPU verification AUC")
    ap.add_argument("--data", required=True, help="root: <root>/<identity>/*.png")
    ap.add_argument("--encoder", default="512", choices=["128", "512"])
    ap.add_argument("--detector", default="yunet",
                    choices=["yunet", "retinaface", "mediapipe"])
    ap.add_argument("--trained", default=None,
                    help="encoder variables msgpack from fire_tpu.train")
    ap.add_argument("--detect", action="store_true",
                    help="run detection+alignment instead of direct encode")
    args = ap.parse_args()

    from fire_tpu.config import RecognizerConfig
    from fire_tpu.pipeline.engine import DeviceEngine

    cfg = RecognizerConfig(
        detector_type=args.detector,
        encoder_model_type=args.encoder,
        weights_dir=None,
    ).with_embedding_dim()
    engine = DeviceEngine(cfg)
    if args.trained:
        engine.load_trained_encoder(args.trained)

    if args.detect:
        aucs, n = evaluate_directory(engine, args.data), None
    else:
        embs, labels = encode_directory(engine, args.data)
        aucs, n = identification_auc(embs, labels), len(labels)
    print(json.dumps({"auc": aucs, "n": n, "trained": bool(args.trained)}))


if __name__ == "__main__":
    main()
