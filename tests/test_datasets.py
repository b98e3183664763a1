"""Integration: synthetic AVS-style CSV -> batch embedding extraction ->
retrieval/spotting evals. Also checks batched extraction writes identical
embeddings to per-sample extraction and that resume skips existing files."""

import os
import pickle

import numpy as np
import pandas as pd
import pytest
import torch

import jax

from jegal_tpu.api import JegalEngine
from jegal_tpu.data.datasets import extract_embeddings_csv
from jegal_tpu.models import jegal as J
from jegal_tpu.models import roberta as R

from tok_util import make_word_tokenizer


@pytest.fixture(scope="module")
def engine():
    from transformers import XLMRobertaConfig, XLMRobertaModel

    cfg = R.RobertaConfig(vocab_size=64, hidden_size=768, num_layers=1,
                          num_heads=8, intermediate_size=256,
                          max_position_embeddings=64)
    torch.manual_seed(7)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=64, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=8, intermediate_size=256,
        max_position_embeddings=64, pad_token_id=1)).eval()
    return JegalEngine(
        jegal_params=J.init_params(jax.random.PRNGKey(3)),
        roberta_params=R.params_from_hf(hf.state_dict(), cfg),
        roberta_cfg=cfg,
        tokenizer=make_word_tokenizer(),
    )


@pytest.fixture(scope="module")
def avs_dirs(tmp_path_factory, rng):
    """Synthetic mini AVS set: 4 clips with features + wavs + CSV."""
    from scipy.io import wavfile

    root = tmp_path_factory.mktemp("avs")
    feat_dir = root / "feats"
    vid_dir = root / "vids"
    (feat_dir / "clips").mkdir(parents=True)
    (vid_dir / "clips").mkdir(parents=True)
    rows = []
    for i in range(4):
        t = 10 + i
        np.save(feat_dir / "clips" / f"c{i}.npy",
                rng.standard_normal((t, 1024)).astype(np.float32))
        wav = (rng.standard_normal(16000) * 400).astype(np.int16)
        wavfile.write(vid_dir / "clips" / f"c{i}.wav", 16000, wav)
        wbs = [["ab", 2, 6], ["hello", 7, 12], ["x", 13, 20]]
        rows.append({
            "filename": f"clips/c{i}",
            "phrase": "ab hello x",
            "word_boundaries": str(wbs),
            "target_word_boundary": str(["hello", 7, 12]),
        })
    csv = root / "avs.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return {"csv": str(csv), "feat": str(feat_dir), "vid": str(vid_dir),
            "root": root}


def test_extract_csv_end_to_end(engine, avs_dirs, tmp_path):
    res = str(tmp_path / "embs")
    stats = extract_embeddings_csv(
        engine, avs_dirs["csv"], avs_dirs["vid"], avs_dirs["feat"], res,
        modalities="vta")
    assert stats["done"] == 4 and stats["failed"] == 0

    with open(os.path.join(res, "clips__c0.pkl"), "rb") as f:
        d = pickle.load(f)
    assert d["gesture_emb"].shape == (10, 512)
    assert d["content_emb"].shape == (3, 512)
    assert d["info"]["phrase"] == "ab hello x"  # full CSV row preserved

    # evals run on the produced directory
    from jegal_tpu.eval import retrieval, spotting

    r = retrieval.evaluate(res)
    assert set(r) == {"c2g", "g2c"} and 0.0 <= r["c2g"]["R1"] <= 1.0
    s = spotting.evaluate(res)
    assert s["total"] == 4

    # resume: second run skips everything
    stats2 = extract_embeddings_csv(
        engine, avs_dirs["csv"], avs_dirs["vid"], avs_dirs["feat"], res,
        modalities="vta")
    assert stats2["skipped"] == 4 and stats2["done"] == 0


def test_extract_csv_batched_matches(engine, avs_dirs, tmp_path):
    res1 = str(tmp_path / "e1")
    res2 = str(tmp_path / "e2")
    extract_embeddings_csv(engine, avs_dirs["csv"], avs_dirs["vid"],
                           avs_dirs["feat"], res1, modalities="ta")
    extract_embeddings_csv(engine, avs_dirs["csv"], avs_dirs["vid"],
                           avs_dirs["feat"], res2, modalities="ta",
                           batch_size=4)
    for f in sorted(os.listdir(res1)):
        with open(os.path.join(res1, f), "rb") as fh:
            a = pickle.load(fh)
        with open(os.path.join(res2, f), "rb") as fh:
            b = pickle.load(fh)
        np.testing.assert_allclose(a["content_emb"], b["content_emb"],
                                   rtol=5e-4, atol=5e-4)


def test_extract_csv_error_ledger(engine, avs_dirs, tmp_path, capsys):
    """A missing feature file is counted as failed, not silently dropped."""
    df = pd.read_csv(avs_dirs["csv"])
    df.loc[0, "filename"] = "clips/missing"
    bad_csv = str(tmp_path / "bad.csv")
    df.to_csv(bad_csv, index=False)
    res = str(tmp_path / "e3")
    stats = extract_embeddings_csv(engine, bad_csv, avs_dirs["vid"],
                                   avs_dirs["feat"], res, modalities="ta")
    assert stats["failed"] == 1 and stats["done"] == 3


def test_extract_csv_client_error_row_isolated(engine, avs_dirs, tmp_path):
    """A row whose data trips the engine's ClientError validation (reversed
    word boundary) is ledgered/skipped without crashing the corpus run —
    in BOTH the per-sample (batch_size=1) and batched driver paths."""
    df = pd.read_csv(avs_dirs["csv"])
    # one reversed (start > end) boundary trips the engine's ClientError
    df.loc[1, "word_boundaries"] = str(
        [["ab", 6, 2], ["hello", 7, 12], ["x", 13, 20]])
    bad_csv = str(tmp_path / "rev.csv")
    df.to_csv(bad_csv, index=False)

    stats = extract_embeddings_csv(engine, bad_csv, avs_dirs["vid"],
                                   avs_dirs["feat"],
                                   str(tmp_path / "e_single"),
                                   modalities="ta")
    assert stats["done"] == 3 and stats["failed"] + stats["invalid"] == 1

    stats_b = extract_embeddings_csv(engine, bad_csv, avs_dirs["vid"],
                                     avs_dirs["feat"],
                                     str(tmp_path / "e_batch"),
                                     modalities="ta", batch_size=4)
    assert stats_b["done"] == 3
    assert stats_b["failed"] + stats_b["invalid"] == 1
