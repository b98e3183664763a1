"""Cross-modal retrieval evaluation (AVS-Ret).

Replicates reference evaluation/evaluate_retrieval.py:18-110 — rank-of-
diagonal metrics over the cosine-similarity matrix of temporally mean-pooled
embeddings — with two intentional improvements documented in SURVEY.md §2.9:
the shipped script crashes (4-value/2-value unpack at :87-89); ours returns
metric dicts, and R@1 is reported in addition to R@{5,10,25,50} (same rank
vector, driver north-star metric)."""

from __future__ import annotations

import numpy as np

from jegal_tpu.eval.common import l2_normalize, list_embedding_files, load_pkl


def load_video_level_embeddings(path: str):
    """Mean over time/words -> video-level gesture and content embeddings
    (reference evaluate_retrieval.py:25-35)."""
    gesture, content, infos = [], [], []
    for fname in list_embedding_files(path):
        feats = load_pkl(fname)
        gesture.append(np.asarray(feats["gesture_emb"]).mean(axis=0).squeeze())
        content.append(np.asarray(feats["content_emb"]).mean(axis=0).squeeze())
        infos.append(feats["info"])
    return np.stack(gesture), np.stack(content), infos


def similarity_matrix(emb1: np.ndarray, emb2: np.ndarray) -> np.ndarray:
    e1 = l2_normalize(emb1.astype(np.float32), axis=1)
    e2 = l2_normalize(emb2.astype(np.float32), axis=1)
    return e1 @ e2.T


def rank_of_diagonal(sim: np.ndarray) -> np.ndarray:
    """Rank position of each diagonal entry within its row (0 = best),
    replicating the reference's sort-based computation
    (evaluate_retrieval.py:51-57, ties resolved identically)."""
    sx = np.sort(-sim, axis=1)
    d = -np.diag(sim)[:, None]
    ind = np.where(sx - d == 0)[1]
    return ind


def compute_metrics(sim: np.ndarray) -> dict:
    ind = rank_of_diagonal(sim)
    n = len(ind)
    return {
        "R1": float(np.sum(ind < 1)) / n,
        "R5": float(np.sum(ind < 5)) / n,
        "R10": float(np.sum(ind < 10)) / n,
        "R25": float(np.sum(ind < 25)) / n,
        "R50": float(np.sum(ind < 50)) / n,
        "MR": float(np.median(ind) + 1),
    }


def evaluate(path: str) -> dict:
    """-> {"c2g": metrics, "g2c": metrics} (content->gesture, gesture->content,
    reference evaluate_retrieval.py:100-110)."""
    gesture, content, _ = load_video_level_embeddings(path)
    return {
        "c2g": compute_metrics(similarity_matrix(content, gesture)),
        "g2c": compute_metrics(similarity_matrix(gesture, content)),
    }
