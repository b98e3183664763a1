"""Shared evaluation utilities: pkl loading and gesture-content attention."""

from __future__ import annotations

import ast
import glob
import os
import pickle

import numpy as np

from jegal_tpu.config import DEFAULT as _CFG

# similarity temperature used across all eval tasks
# (reference evaluate_spotting.py:39, evaluate_asd.py:43, plot_heatmap.py:34)
TEMP = _CFG.model.temperature


def load_pkl(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def list_embedding_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.pkl")))


def l2_normalize(x: np.ndarray, axis: int = -1, eps: float = 1e-12) -> np.ndarray:
    """torch F.normalize(p=2) parity: x / max(||x||, eps)."""
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, eps)


def softmax(x: np.ndarray, axis: int) -> np.ndarray:
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def parse_word_boundaries(wb):
    """CSV cells store word boundaries as stringified lists."""
    if isinstance(wb, str):
        return ast.literal_eval(wb)
    return wb


def attention_matrix(gesture_emb: np.ndarray, content_emb: np.ndarray,
                     temp: float = TEMP) -> np.ndarray:
    """softmax((G @ C^T)/temp) over words, transposed to (W, T)
    (reference evaluate_spotting.py:39-57 / plot_heatmap.py:34-59)."""
    g = l2_normalize(gesture_emb.astype(np.float32))
    c = l2_normalize(content_emb.astype(np.float32))
    attn = g @ c.T / temp  # (T, W)
    return softmax(attn, axis=1).T  # (W, T)
