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


# ---------------------------------------------------------------------------
# On-device path (single chip or sharded over the 'data' mesh axis)
# ---------------------------------------------------------------------------
#
# The per-video attention-softmax + target-row argmax of spot_word, batched
# over the whole embedding set as ONE jit graph (SURVEY.md §5.8/§7). Videos
# pad to a common (T, W); padded words take -inf logits (zero probability, so
# the valid-word softmax is untouched) and padded frames take -inf scores.
# Videos shard over 'data' when a mesh is given — each video's math is local,
# so the ICI sees nothing. The span/threshold correctness checks stay on the
# host (scalar compares per video). Equal to the numpy path whenever the
# target row is tie-free (measure-zero on real embeddings).


def _spot_batch_device(gesture, content, t_valid, w_valid, word_idx, temp):
    """gesture (N, T, D), content (N, W, D) fp32; *_valid counts; word_idx
    (N,) target word row -> (pred_frame (N,), pred_score (N,))."""
    import jax
    import jax.numpy as jnp

    def norm(x):
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(n, 1e-12)

    logits = jnp.einsum("ntd,nwd->ntw", norm(gesture), norm(content)) / temp
    wmask = jnp.arange(logits.shape[2])[None, :] < w_valid[:, None]
    logits = jnp.where(wmask[:, None, :], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=2)          # over words, per frame
    row = jnp.take_along_axis(
        attn, word_idx[:, None, None], axis=2)[..., 0]   # (N, T)
    tmask = jnp.arange(row.shape[1])[None, :] < t_valid[:, None]
    row = jnp.where(tmask, row, -jnp.inf)
    return jnp.argmax(row, axis=1), jnp.max(row, axis=1)


def evaluate_device(path: str, thresh: float = THRESHOLD,
                    frame_thresh: int = FRAME_THRESHOLD, mesh=None) -> dict:
    """evaluate(), with the attention/argmax math as one device graph."""
    import jax
    import jax.numpy as jnp

    videos = []
    for fname in list_embedding_files(path):
        feats = load_pkl(fname)
        info = feats["info"]
        wbs = parse_word_boundaries(info["word_boundaries"])
        target = parse_word_boundaries(info["target_word_boundary"])
        videos.append((np.asarray(feats["gesture_emb"], np.float32),
                       np.asarray(feats["content_emb"], np.float32),
                       wbs.index(target), target))
    if not videos:
        return {"accuracy": 0.0, "correct": 0, "total": 0}

    n = len(videos)
    d = videos[0][0].shape[1]

    def _pad16(x):
        return ((x + 15) // 16) * 16

    t_max = _pad16(max(g.shape[0] for g, _, _, _ in videos))
    w_max = _pad16(max(c.shape[0] for _, c, _, _ in videos))
    n_pad = n
    if mesh is not None:
        dx = mesh.shape.get("data", 1)
        n_pad = ((n + dx - 1) // dx) * dx
    gest = np.zeros((n_pad, t_max, d), np.float32)
    cont = np.zeros((n_pad, w_max, d), np.float32)
    t_valid = np.ones((n_pad,), np.int32)   # padded rows: 1 dummy frame/word
    w_valid = np.ones((n_pad,), np.int32)
    word_idx = np.zeros((n_pad,), np.int32)
    for i, (g, c, wi, _) in enumerate(videos):
        gest[i, : g.shape[0]] = g
        cont[i, : c.shape[0]] = c
        t_valid[i], w_valid[i], word_idx[i] = g.shape[0], c.shape[0], wi

    from jegal_tpu.eval.common import TEMP

    args = [jnp.asarray(a) for a in (gest, cont, t_valid, w_valid, word_idx)]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        args = [jax.device_put(a, NamedSharding(mesh, P("data")))
                for a in args]
    pred, score = jax.jit(_spot_batch_device, static_argnums=5)(*args, TEMP)
    pred, score = np.asarray(pred), np.asarray(score)

    correct = 0
    for i, (_, _, _, target) in enumerate(videos):
        start = max(0, int(target[1]) - frame_thresh)
        end = int(target[2]) + frame_thresh
        ok = start <= int(pred[i]) <= end and float(score[i]) >= thresh
        correct += int(ok)
    return {
        "accuracy": 100.0 * correct / n,
        "correct": correct,
        "total": n,
    }
