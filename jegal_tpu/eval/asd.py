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


# ---------------------------------------------------------------------------
# On-device path (single chip or sharded over the 'data' mesh axis)
# ---------------------------------------------------------------------------
#
# The candidate cosine/softmax/argmax of cosine_scores, batched over every
# query as ONE jit graph (SURVEY.md §5.8/§7). The softmax is monotone, so
# the device computes masked cosines and argmaxes directly — identical
# predictions, no exp needed. Queries shard over 'data' when a mesh is
# given (each query's candidates ride along; no collectives). Embedding
# mean-pooling and file IO stay on the host exactly as in evaluate().


def _asd_batch_device(query, cands, cand_count, n_spk_list):
    """query (N, D), cands (N, S, D), cand_count (N,) valid candidates ->
    {n_spk: pred (N,)} argmax over the first min(n_spk, count) candidates."""
    import jax.numpy as jnp

    qn = jnp.linalg.norm(query, axis=1)
    cn = jnp.linalg.norm(cands, axis=2)
    cos = (jnp.einsum("nsd,nd->ns", cands, query)
           / jnp.maximum(qn[:, None] * cn, 1e-8))
    s = jnp.arange(cos.shape[1])[None, :]
    preds = {}
    for n_spk in n_spk_list:
        mask = s < jnp.minimum(n_spk, cand_count)[:, None]
        preds[n_spk] = jnp.argmax(jnp.where(mask, cos, -jnp.inf), axis=1)
    return preds


def evaluate_device(res_dir: str, df, mesh=None) -> dict:
    """evaluate(), with the per-query scoring math as one device graph."""
    import jax
    import jax.numpy as jnp

    speakers = tuple(_CFG.eval.asd_speakers)
    queries, cand_sets = [], []
    for _, row in df.iterrows():
        qpath = _emb_path(res_dir, row["filename"])
        if not os.path.exists(qpath):
            continue
        q_gest, q_content = _mean_embs(qpath, load_content=True)
        gestures = [q_gest]
        for neg in ast.literal_eval(row["neg_files"]):
            npath = _emb_path(res_dir, neg)
            if os.path.exists(npath):
                gestures.append(_mean_embs(npath, load_content=False))
        queries.append(q_content)
        cand_sets.append(gestures)
    evaluated = len(queries)
    out = {"evaluated": evaluated}
    if not evaluated:
        for n_spk in speakers:
            out[f"acc_{n_spk}spk"] = 0.0
        return out

    d = queries[0].shape[0]
    s_max = max(max(len(c) for c in cand_sets), max(speakers))
    n_pad = evaluated
    if mesh is not None:
        dx = mesh.shape.get("data", 1)
        n_pad = ((evaluated + dx - 1) // dx) * dx
    q = np.zeros((n_pad, d), np.float32)
    cands = np.zeros((n_pad, s_max, d), np.float32)
    count = np.ones((n_pad,), np.int32)
    for i, (qc, cs) in enumerate(zip(queries, cand_sets)):
        q[i] = qc
        cands[i, : len(cs)] = np.stack(cs)
        count[i] = len(cs)

    from jegal_tpu.parallel.mesh import put_batch

    args = put_batch((q, cands, count), mesh)
    preds = jax.jit(_asd_batch_device, static_argnums=3)(*args, speakers)
    for n_spk in speakers:
        p = np.asarray(preds[n_spk])[:evaluated]
        out[f"acc_{n_spk}spk"] = float(np.mean(p == 0))
    return out
