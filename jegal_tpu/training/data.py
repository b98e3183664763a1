"""Training data pipeline: random word-window crops -> padded batches.

Re-implements the reference's DataGenerator_Train semantics (dataset.py:
15-195) with its use-before-assignment defect fixed (dataset.py:46 reads
start_frame before load_text computes it — SURVEY.md §2.9 defect 2; the
correct order is text first, then the visual/audio windows it determines):

  * sample num_words ~ U[5, min(len(words), U[10,19])] consecutive words
    (dataset.py:128-133),
  * window = [start word's start time, last word's end time] in frames,
  * visual features cropped to [start_frame, end_frame] (dataset.py:81-83),
  * audio cropped at sample_rate/fps x frames (dataset.py:175-178), mel'd,
  * word boundaries kept in absolute frames (pooling subtracts the first
    word's start — reference jegal.py:224).

Batches are padded to shape buckets with exactly-neutral masks/pooling,
producing the batch dict consumed by jegal_tpu.training.trainer.
"""

from __future__ import annotations

import os

import numpy as np

from jegal_tpu.data.bucketing import (
    MEL_BUCKETS,
    S_BUCKETS,
    T_BUCKETS,
    W_BUCKETS,
    next_bucket,
    pad_axis,
)
from jegal_tpu.ops import pooling as P
from jegal_tpu.ops.audio import HOP_LENGTH, SAMPLE_RATE, wav2filterbanks
from jegal_tpu.text.normalize import preprocess_text

FPS = 25


def sample_word_window(rows: list[str], rng: np.random.Generator):
    """rows: transcript 'WORD, START, END, SCORE' lines -> (text,
    start_frame, end_frame, word_boundaries) or None (reference
    dataset.py:107-165 with the defect-free ordering)."""
    if len(rows) < 5:
        return None
    max_words = rng.integers(10, 20)
    num_words = rng.integers(5, min(len(rows), max_words) + 1)
    start_idx = rng.integers(0, len(rows) - num_words + 1)

    start_time = float(rows[start_idx].split(", ")[1])
    end_time = float(rows[start_idx + num_words - 1].split(", ")[2])
    start_frame = round(start_time * FPS)
    end_frame = round(end_time * FPS)

    text = ""
    word_boundaries = []
    for i in range(start_idx, start_idx + num_words):
        parts = rows[i].split(", ")
        word = preprocess_text(parts[0])
        if word == "":
            continue
        text += word
        if i != start_idx + num_words - 1:
            text += " "
        word_boundaries.append([
            word, round(float(parts[1]) * FPS), round(float(parts[2]) * FPS)])
    if not word_boundaries:
        return None
    return text, start_frame, end_frame, word_boundaries


def load_training_sample(row, feature_dir: str, rng: np.random.Generator):
    """One CSV row (filename, text_path, audio_path) -> raw sample dict or
    None (invalid, reference-parity None-dropping)."""
    text_path, audio_path = row["text_path"], row["audio_path"]
    if not os.path.exists(text_path) or not os.path.exists(audio_path):
        return None
    with open(text_path, "r", encoding="utf-8") as f:
        rows = [line.strip() for line in f.readlines()][4:]
    window = sample_word_window(rows, rng)
    if window is None:
        return None
    text, start_frame, end_frame, wbs = window

    feats_path = os.path.join(feature_dir, row["filename"] + ".npy")
    try:
        feats = np.load(feats_path)
    except Exception:
        return None
    if feats.ndim != 2 or feats.shape[1] != 1024:
        return None
    feats = feats[start_frame : end_frame + 1]
    if len(feats) == 0:
        return None

    from jegal_tpu.ops.audio import load_wav

    wav = load_wav(audio_path)
    aud_fact = int(round(SAMPLE_RATE / FPS))
    wav = wav[aud_fact * start_frame : aud_fact * (end_frame + 1)]
    if len(wav) < HOP_LENGTH * 4:
        return None
    return {
        "visual_feats": feats.astype(np.float32),
        "text": text,
        "wav": wav,
        "word_boundaries": wbs,
    }


def collate_training_batch(samples: list[dict], tokenizer):
    """Raw samples -> the padded batch dict for trainer.train_step, or None
    if no sample survives validity checks."""
    import jax.numpy as jnp

    samples = [s for s in samples if s is not None]
    if not samples:
        return None

    # text: tokenize the whole batch together (HF-parity padding)
    batch = tokenizer.encode_words([s["text"] for s in samples])
    s_nat = batch.input_ids.shape[1]
    starts = P.text_word_starts(batch.input_ids, batch.offsets, batch.special_ids)
    n_words = [len(s["word_boundaries"]) for s in samples]
    w_bucket = next_bucket(max(n_words), W_BUCKETS)
    text_pool, tvalid, counts = P.build_text_pooling(
        starts, n_words, s_nat, w_bucket)

    # audio: mel per sample; pooling built against each sample's NATURAL
    # token count ((t_mel-1)//4+1, the CNN's output length), then padded to
    # the shared bucket — spans never index conv-on-padding tokens
    mels = [np.asarray(wav2filterbanks(jnp.asarray(s["wav"])[None]))[0]
            for s in samples]
    mel_bucket = next_bucket(max(m.shape[0] for m in mels), MEL_BUCKETS)
    pools, avalid_l = [], []
    for s, m in zip(samples, mels):
        t_audio = (m.shape[0] - 1) // 4 + 1
        p, v, _ = P.build_audio_pooling([s["word_boundaries"]], t_audio,
                                        w_bucket)
        pools.append(pad_axis(p, 2, mel_bucket // 4)[0])
        avalid_l.append(v[0])
    audio_pool = np.stack(pools)
    avalid = np.asarray(avalid_l)
    audio_valid = np.array([m.shape[0] for m in mels], np.int32)

    valid = tvalid & avalid
    keep = [i for i in range(len(samples)) if valid[i]]
    if not keep:
        return None

    t_bucket = next_bucket(max(len(samples[i]["visual_feats"]) for i in keep),
                           T_BUCKETS)
    s_bucket = next_bucket(s_nat, S_BUCKETS)

    def stack(make):
        return np.stack([make(i) for i in keep])

    feats = stack(lambda i: pad_axis(samples[i]["visual_feats"], 0, t_bucket))
    vmask = stack(lambda i: np.pad(
        np.ones(len(samples[i]["visual_feats"]), np.float32),
        (0, t_bucket - len(samples[i]["visual_feats"]))))
    mel = stack(lambda i: pad_axis(mels[i], 0, mel_bucket))
    ids = pad_axis(batch.input_ids[keep], 1, s_bucket,
                   value=tokenizer.pad_id)
    tmask = pad_axis(batch.attention_mask[keep], 1, s_bucket)
    tpool = pad_axis(text_pool[keep], 2, s_bucket)
    apool = audio_pool[keep]
    wmask = stack(lambda i: np.pad(
        np.ones(counts[i], np.float32), (0, w_bucket - counts[i])))

    return {
        "visual_feats": jnp.asarray(feats),
        "visual_mask": jnp.asarray(vmask),
        "input_ids": jnp.asarray(ids, jnp.int32),
        "text_mask": jnp.asarray(tmask, jnp.float32),
        "text_pool": jnp.asarray(tpool),
        "audio_mel": jnp.asarray(mel),
        "audio_pool": jnp.asarray(apool),
        "audio_valid": jnp.asarray(audio_valid[keep]),
        "word_mask": jnp.asarray(wmask),
    }
