"""Gesture-only active speaker detection evaluation (AVS-Asd).

Replicates reference evaluation/evaluate_asd.py:26-124: for each query, the
mean-pooled content embedding scores the positive plus negative speakers'
mean-pooled gesture embeddings via cosine/0.07 softmax; accuracy is whether
the argmax over the first {2,4,6} candidates is the positive (index 0)."""

from __future__ import annotations

import ast
import os

import numpy as np

from jegal_tpu.config import DEFAULT as _CFG
from jegal_tpu.eval.common import TEMP, load_pkl, softmax


def _emb_path(res_dir: str, filename: str) -> str:
    parts = filename.split("/")
    return os.path.join(res_dir, parts[0] + "__" + parts[1] + ".pkl")


def _mean_embs(path: str, load_content: bool):
    feats = load_pkl(path)
    g = np.asarray(feats["gesture_emb"]).mean(axis=0)
    if load_content:
        return g, np.asarray(feats["content_emb"]).mean(axis=0)
    return g


def cosine_scores(query: np.ndarray, candidates: np.ndarray,
                  temp: float = TEMP) -> np.ndarray:
    """softmax over candidates of cosine(query, cand)/temp
    (reference evaluate_asd.py:43-51; torch CosineSimilarity eps=1e-8)."""
    qn = np.linalg.norm(query)
    cn = np.linalg.norm(candidates, axis=1)
    cos = (candidates @ query) / np.maximum(qn * cn, 1e-8)
    return softmax(cos / temp, axis=0)


def evaluate(res_dir: str, df) -> dict:
    """df: pandas frame of the AVS-Asd CSV (filename, neg_files)."""
    # n_spk -> [correct, total], driven by the same config the loop reads
    counts = {n: [0, 0] for n in _CFG.eval.asd_speakers}
    evaluated = 0
    for _, row in df.iterrows():
        qpath = _emb_path(res_dir, row["filename"])
        if not os.path.exists(qpath):
            continue
        q_gest, q_content = _mean_embs(qpath, load_content=True)
        all_gestures = [q_gest]
        for neg in ast.literal_eval(row["neg_files"]):
            npath = _emb_path(res_dir, neg)
            if not os.path.exists(npath):
                continue
            all_gestures.append(_mean_embs(npath, load_content=False))
        all_gestures = np.stack(all_gestures)
        evaluated += 1
        for n_spk in _CFG.eval.asd_speakers:
            cands = all_gestures[:n_spk]
            pred = int(np.argmax(cosine_scores(q_content, cands)))
            counts[n_spk][0] += int(pred == 0)
            counts[n_spk][1] += 1
    out = {"evaluated": evaluated}
    for n_spk, (c, t) in counts.items():
        out[f"acc_{n_spk}spk"] = c / t if t else 0.0
    return out
