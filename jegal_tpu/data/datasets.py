"""CSV-driven batch embedding extraction (AVS eval sets).

Mirrors the reference's DataGenerator_Test + extract_jegal_embs flow
(dataset.py:198-355; evaluation/extract_jegal_embs.py:56-125): each CSV row
names a clip (filename), its phrase, and stringified word boundaries;
visual GestSync features come from `<feature_dir>/<filename>.npy`, audio
from `<video_dir>/<filename>.wav`. Output: one .pkl per sample named
`<dir>__<clip>.pkl` with the documented schema.

Host/device pipelining: sample preparation (disk IO, mel, pooling matrices)
runs on a prefetch thread while the device computes the previous sample —
the TPU-native replacement for torch DataLoader workers. File-level
idempotent resume (skip existing outputs) is kept from the reference
(extract_gestsync_feats.py:281-284), with a structured error ledger instead
of silent except (SURVEY.md §5.3).
"""

from __future__ import annotations

import ast
import json
import os
import pickle
import sys
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from jegal_tpu.api import ClientError


def _out_name(filename: str) -> str:
    parts = filename.split("/")
    return parts[0] + "__" + parts[1] + ".pkl"


def load_sample(row, video_dir: str, feature_dir: str, modalities: str):
    """-> kwargs for JegalEngine.extract, or raises on missing inputs."""
    filename = row["filename"]
    kw: dict = {"modalities": modalities, "fname": None}
    if "v" in modalities:
        fpath = os.path.join(feature_dir, filename + ".npy")
        feats = np.load(fpath)
        if feats.ndim != 2 or feats.shape[1] != 1024:
            raise ValueError(f"bad GestSync feature shape {feats.shape}: {fpath}")
        kw["visual_feats"] = feats.astype(np.float32)
    if "t" in modalities or "a" in modalities:
        kw["word_boundaries"] = ast.literal_eval(row["word_boundaries"]) \
            if isinstance(row["word_boundaries"], str) else row["word_boundaries"]
    if "t" in modalities:
        kw["text"] = row["phrase"]
    if "a" in modalities:
        from jegal_tpu.ops.audio import load_wav

        kw["wav"] = load_wav(os.path.join(video_dir, filename + ".wav"))
    return kw


def extract_embeddings_csv(engine, csv_path: str, video_dir: str,
                           feature_dir: str, res_dir: str,
                           modalities: str = "vta", rank: int = 0,
                           nshard: int = 1, prefetch: int = 2,
                           batch_size: int = 1, mesh=None) -> dict:
    """Run the engine over a CSV shard; returns an accounting dict.

    batch_size > 1 groups bucket-compatible samples into device batches
    (optionally sharded over a mesh 'data' axis) via extract_many —
    numerically identical to per-sample extraction.
    """
    import pandas as pd

    df = pd.read_csv(csv_path)
    rows = [df.iloc[i] for i in range(len(df))]
    if nshard > 1:
        rows = rows[rank::nshard]
    os.makedirs(res_dir, exist_ok=True)

    stats = {"done": 0, "skipped": 0, "failed": 0, "invalid": 0}
    errors = []

    def prepare(row):
        out_path = os.path.join(res_dir, _out_name(row["filename"]))
        if os.path.exists(out_path):
            return ("skip", out_path, None, None)
        try:
            return ("ok", out_path, load_sample(row, video_dir, feature_dir,
                                                modalities), row)
        except Exception as e:  # ledger, not silence
            return ("err", out_path, str(e), row)

    def save(feats, row, out_path):
        feats["info"] = dict(row)  # full CSV row (phrase, boundaries,
        # target_word_boundary, neg_files, ...) — needed by the evals
        with open(out_path, "wb") as f:
            pickle.dump(feats, f)
        stats["done"] += 1

    pending = []  # (payload, row, out_path) accumulated for a device batch

    def flush():
        if not pending:
            return
        results = engine.extract_many([p for p, _, _ in pending],
                                      modalities=modalities,
                                      batch_size=batch_size, mesh=mesh)
        for feats, (_, row, out_path) in zip(results, pending):
            if feats is None:
                stats["invalid"] += 1
            else:
                save(feats, row, out_path)
        pending.clear()

    with ThreadPoolExecutor(max_workers=1) as pool:
        futures = [pool.submit(prepare, r) for r in rows[:prefetch]]
        idx = prefetch
        for i in range(len(rows)):
            status, out_path, payload, row = futures[i].result()
            if idx < len(rows):
                futures.append(pool.submit(prepare, rows[idx]))
                idx += 1
            if status == "skip":
                stats["skipped"] += 1
                continue
            if status == "err":
                stats["failed"] += 1
                errors.append({"file": str(row["filename"]), "error": payload})
                continue
            if batch_size <= 1:
                try:
                    feats = engine.extract(**payload)
                except ClientError as e:
                    # malformed row data (engine-validated): ledger it and
                    # keep the corpus run going, matching extract_many's
                    # None-for-invalid batch contract
                    stats["failed"] += 1
                    errors.append({"file": str(row["filename"]),
                                   "error": str(e)})
                    continue
                if feats is None:
                    stats["invalid"] += 1
                else:
                    save(feats, row, out_path)
            else:
                payload.pop("modalities", None)
                pending.append((payload, row, out_path))
                # accumulate several batches before flushing: extract_many
                # groups by shape signature, so a wider window packs ragged
                # rows (mixed s/w/mel buckets) into FULL same-sig chunks
                # instead of straggler ladder chunks, and its depth-1
                # pipeline gets more chunks to overlap. The window stages
                # full payloads (~1 MB/row at T=128: feats + wav + pools),
                # so it is capped at 256 rows regardless of batch_size —
                # bounds both staged memory (~0.25-1 GB worst case at long
                # T) and the rows a mid-run crash leaves unflushed for the
                # idempotent-skip restart to redo.
                if len(pending) >= min(batch_size * 8, 256):
                    flush()
        flush()

    for e in errors:
        print(json.dumps(e), file=sys.stderr)
    return stats
