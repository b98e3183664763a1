"""Word-level pooling as dense matmuls (TPU-native replacement for the
reference's per-sample Python loops, models/jegal.py:131-252).

The reference pools (a) subword -> word text embeddings by averaging each
word's subword tokens, and (b) frame -> word audio embeddings by averaging
the 25 Hz audio tokens inside each word's frame span. Both are data-dependent
gathers in torch; here the host precomputes, per sample, a pooling matrix
P (W_max, S) whose row w holds 1/n_w over word w's source positions, and the
device does one einsum  word_emb = P @ token_emb  — a dense MXU matmul with
static shapes.

Reference quirks preserved exactly:
  * text: word w's subwords span [start_idx[w], start_idx[w+1]); the LAST
    word's span extends to the END of the padded token axis — including the
    </s> token (and padding, when B > 1) — reference models/jegal.py:168-171.
  * text: a sample is invalid when it has more words than detected word
    starts (tokenizer merged words) or zero words (jegal.py:158-171,200-211).
  * audio: spans are [start - actual_start, end - actual_start + 1] where
    actual_start is the FIRST word's start frame (jegal.py:224-241); spans
    are clamped to the available tokens (torch slicing semantics).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp


def text_word_starts(input_ids: np.ndarray, offsets: np.ndarray,
                     special_ids: Sequence[int]) -> list[list[int]]:
    """Per-sample token indices that start a word: offset[0] == 0 and the
    token is not a special token (reference models/jegal.py:146-150)."""
    special = set(int(s) for s in special_ids)
    out = []
    for ids_row, off_row in zip(input_ids, offsets):
        starts = [
            i
            for i, (tid, off) in enumerate(zip(ids_row, off_row))
            if int(off[0]) == 0 and int(tid) not in special
        ]
        out.append(starts)
    return out


def build_text_pooling(word_starts: list[list[int]], num_words: list[int],
                       seq_len: int, w_max: int):
    """-> (P (B, w_max, seq_len) f32, valid (B,) bool, counts (B,) int32).

    P rows beyond a sample's word count are zero. Invalid samples (more words
    than word starts, or zero words) get an all-zero P and valid=False.
    """
    b = len(word_starts)
    p = np.zeros((b, w_max, seq_len), dtype=np.float32)
    valid = np.zeros((b,), dtype=bool)
    counts = np.zeros((b,), dtype=np.int32)
    for i, (starts, nw) in enumerate(zip(word_starts, num_words)):
        if nw <= 0 or nw > len(starts) or nw > w_max:
            continue
        valid[i] = True
        counts[i] = nw
        for w in range(nw):
            lo = starts[w]
            hi = starts[w + 1] if w < len(starts) - 1 else seq_len
            # reference parity: the last DETECTED word start extends to the
            # end of the padded axis (jegal.py:168-171). For w == nw-1 when
            # nw < len(starts) the span still ends at the next start.
            if hi <= lo:
                hi = lo + 1
            p[i, w, lo:hi] = 1.0 / (hi - lo)
    return p, valid, counts


def build_audio_pooling(word_boundaries: list[list], t_audio: int, w_max: int):
    """word_boundaries: per sample, list of [word, start_frame, end_frame]
    (frame units @ 25 fps == audio-token units).

    -> (P (B, w_max, t_audio) f32, valid (B,) bool, counts (B,) int32).
    """
    b = len(word_boundaries)
    p = np.zeros((b, w_max, t_audio), dtype=np.float32)
    valid = np.zeros((b,), dtype=bool)
    counts = np.zeros((b,), dtype=np.int32)
    for i, wbs in enumerate(word_boundaries):
        if not wbs or len(wbs) > w_max:
            continue
        actual_start = int(wbs[0][1])
        ok = True
        for w, entry in enumerate(wbs):
            lo = int(entry[1]) - actual_start
            hi = int(entry[2]) - actual_start + 1
            if lo < 0:
                # non-monotonic boundaries: the reference's negative torch
                # index yields an empty slice and crashes on .mean() — treat
                # the sample as invalid rather than pooling a clamped span
                ok = False
                break
            lo_c = min(lo, t_audio)
            hi_c = max(0, min(hi, t_audio))
            if hi_c <= lo_c:
                ok = False  # reference would crash on an empty span
                break
            p[i, w, lo_c:hi_c] = 1.0 / (hi_c - lo_c)
        if ok:
            valid[i] = True
            counts[i] = len(wbs)
        else:
            p[i] = 0.0
    return p, valid, counts


def pool_words(pooling_matrix, token_emb):
    """word_emb[b, w] = sum_s P[b, w, s] * token_emb[b, s]  -> (B, W_max, D)."""
    return jnp.einsum(
        "bws,bsd->bwd", pooling_matrix, token_emb,
        preferred_element_type=jnp.float32,
    ).astype(token_emb.dtype)
