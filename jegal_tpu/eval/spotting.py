"""Gestured-word spotting evaluation (AVS-Spot).

Replicates reference evaluation/evaluate_spotting.py:39-90: per video, the
word-frame attention matrix softmax((G·Cᵀ)/0.07) over words, transposed to
(W, T); the prediction is the argmax frame of the target word's row, correct
iff it lands within the ground-truth span ±frame_threshold (clamped at 0)
AND the score clears the threshold."""

from __future__ import annotations

import numpy as np

from jegal_tpu.eval.common import (
    attention_matrix,
    list_embedding_files,
    load_pkl,
    parse_word_boundaries,
)

from jegal_tpu.config import DEFAULT as _CFG

THRESHOLD = _CFG.eval.spot_threshold
FRAME_THRESHOLD = _CFG.eval.spot_frame_threshold


def spot_word(gesture_emb, content_emb, word_boundaries, target_word_boundary,
              thresh: float = THRESHOLD, frame_thresh: int = FRAME_THRESHOLD):
    """-> (correct: bool, pred_frame: int, pred_score: float)."""
    wbs = parse_word_boundaries(word_boundaries)
    target = parse_word_boundaries(target_word_boundary)
    attn = attention_matrix(np.asarray(gesture_emb), np.asarray(content_emb))
    word_idx = wbs.index(target)
    row = attn[word_idx]
    pred_idx = int(np.argmax(row))
    pred_score = float(row[pred_idx])
    start = max(0, int(target[1]) - frame_thresh)
    end = int(target[2]) + frame_thresh
    correct = start <= pred_idx <= end and pred_score >= thresh
    return correct, pred_idx, pred_score


def evaluate(path: str, thresh: float = THRESHOLD,
             frame_thresh: int = FRAME_THRESHOLD) -> dict:
    """Each .pkl's info must carry 'word_boundaries' and
    'target_word_boundary' (AVS-Spot CSV columns)."""
    correct = total = 0
    for fname in list_embedding_files(path):
        feats = load_pkl(fname)
        info = feats["info"]
        ok, _, _ = spot_word(
            feats["gesture_emb"], feats["content_emb"],
            info["word_boundaries"], info["target_word_boundary"],
            thresh, frame_thresh,
        )
        correct += int(ok)
        total += 1
    return {
        "accuracy": 100.0 * correct / max(total, 1),
        "correct": correct,
        "total": total,
    }
