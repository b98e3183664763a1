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

# Per-group budget for the padded (m, t_max, d) f32 gesture tensor (~256 MB):
# one long outlier must not inflate the whole batch's padding (see
# evaluate_device grouping). Module-level so tests can shrink it to force
# multi-group runs.
MAX_GROUP_ELEMS = 1 << 26


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

    from jegal_tpu.data.bucketing import pow2_bucket

    def _bucket16(x):
        """Next power of two >= 16 — bounds distinct compile shapes."""
        return pow2_bucket(x, floor=16)

    # group videos by length (sorted) with a bounded padded-tensor budget
    # (MAX_GROUP_ELEMS): padding every video to the GLOBAL max would let one
    # long outlier inflate the whole (n, t_max, d) tensor (e.g. a 15k-frame
    # clip in a 500-video set -> ~30 GB); per-group local maxima keep the
    # device working set capped while same-length corpora run in one group
    order = sorted(range(n), key=lambda i: videos[i][0].shape[0])
    groups: list[list[int]] = []
    cur: list[int] = []
    for i in order:
        t_b = _bucket16(videos[i][0].shape[0])
        if cur and ((len(cur) + 1) * t_b * d > MAX_GROUP_ELEMS
                    or len(cur) >= 512):
            groups.append(cur)
            cur = []
        cur.append(i)
    if cur:
        groups.append(cur)

    from jegal_tpu.eval.common import TEMP

    pred = np.zeros((n,), np.int64)
    score = np.zeros((n,), np.float64)
    for idxs in groups:
        m = len(idxs)
        t_max = _bucket16(max(videos[i][0].shape[0] for i in idxs))
        w_max = _bucket16(max(videos[i][1].shape[0] for i in idxs))
        m_pad = m
        if mesh is not None:
            dx = mesh.shape.get("data", 1)
            m_pad = ((m + dx - 1) // dx) * dx
        gest = np.zeros((m_pad, t_max, d), np.float32)
        cont = np.zeros((m_pad, w_max, d), np.float32)
        t_valid = np.ones((m_pad,), np.int32)  # padded rows: 1 dummy each
        w_valid = np.ones((m_pad,), np.int32)
        word_idx = np.zeros((m_pad,), np.int32)
        for bi, i in enumerate(idxs):
            g, c, wi, _ = videos[i]
            gest[bi, : g.shape[0]] = g
            cont[bi, : c.shape[0]] = c
            t_valid[bi], w_valid[bi], word_idx[bi] = (g.shape[0],
                                                      c.shape[0], wi)
        from jegal_tpu.parallel.mesh import put_batch

        args = put_batch((gest, cont, t_valid, w_valid, word_idx), mesh)
        p, s = jax.jit(_spot_batch_device, static_argnums=5)(*args, TEMP)
        p, s = np.asarray(p), np.asarray(s)
        for bi, i in enumerate(idxs):
            pred[i], score[i] = p[bi], s[bi]

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
