"""`jegal_tpu verify` — the one-command real-weight verification driver.

Real checkpoints are external to this image (zero egress), so the harness
is exercised with random weights against SELF-generated goldens: the
extract -> compare -> eval-smoke flow is identical the day real .pth files
arrive (VERDICT r1 item 4)."""

import os
import pickle

import numpy as np
import pytest

import jax

from jegal_tpu.api import JegalEngine
from jegal_tpu.models import jegal as J
from jegal_tpu.verify import compare_embeddings, run_verification

from tok_util import make_word_tokenizer

SAMPLES = "/root/reference/samples"


@pytest.fixture(scope="module")
def engine():
    import torch

    from jegal_tpu.models import roberta as R
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


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no reference samples")
def test_verify_schema_only(engine, tmp_path):
    """No goldens: extraction + schema for every weight-allowed combo
    (no gestsync weights -> v-combos are skipped), eval smoke runs."""
    verdict = run_verification(engine, SAMPLES, str(tmp_path / "out"))
    assert verdict["ok"], verdict
    assert verdict["combos"] == ["ta", "t", "a"]
    for name in ("sample1", "sample2"):
        for combo in verdict["combos"]:
            rep = verdict["samples"][name][combo]
            assert rep["ok"], rep
            assert os.path.exists(rep["saved"])
            assert rep["content_shape"][1] == 512
    # no gestsync weights -> nothing with both embeddings -> no smoke
    assert "retrieval_smoke" not in verdict


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no reference samples")
def test_verify_with_visual_runs_eval_smoke(engine, tmp_path, monkeypatch):
    """With gestsync weights the v-combos run and the retrieval smoke fires
    (the GestSync tower itself is parity-tested elsewhere; the feature
    extraction is stubbed to keep this test CPU-fast)."""
    import importlib

    from jegal_tpu.models import gestsync as G

    # (jegal_tpu.cli re-exports `main` the function, shadowing the submodule)
    cli = importlib.import_module("jegal_tpu.cli.main")

    rng = np.random.default_rng(0)
    monkeypatch.setattr(
        cli, "_decode_for_features",
        lambda path: (np.zeros((40, 270, 480, 3), np.uint8), None))
    monkeypatch.setattr(
        engine, "gestsync_features_from_raw",
        lambda frames, chin: rng.standard_normal((40, 1024)).astype(np.float32))
    monkeypatch.setattr(engine, "gestsync_params",
                        G.init_params(jax.random.PRNGKey(9)))
    verdict = run_verification(engine, SAMPLES, str(tmp_path / "out"),
                               combos=["vta", "ta"])
    assert verdict["ok"], verdict
    assert verdict["samples"]["sample1"]["vta"]["gesture_shape"] == [40, 512]
    assert "retrieval_smoke" in verdict
    assert set(verdict["retrieval_smoke"]) == {"c2g", "g2c"}


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no reference samples")
def test_verify_against_goldens(engine, tmp_path):
    """Self-generated goldens pass; a perturbed golden fails with a cosine
    report."""
    golden = tmp_path / "golden"
    verdict = run_verification(engine, SAMPLES, str(golden), combos=["ta"])
    assert verdict["ok"]

    v2 = run_verification(engine, SAMPLES, str(tmp_path / "out2"),
                          golden_dir=str(golden), combos=["ta"])
    assert v2["ok"], v2
    rep = v2["samples"]["sample1"]["ta"]["golden"]
    assert rep["ok"] and any("cosine" in c["msg"] for c in rep["checks"])

    # perturb one golden -> loud failure
    gpath = golden / "sample1_ta.pkl"
    with open(gpath, "rb") as f:
        d = pickle.load(f)
    d["content_emb"] = np.roll(d["content_emb"], 1, axis=0)
    with open(gpath, "wb") as f:
        pickle.dump(d, f)
    v3 = run_verification(engine, SAMPLES, str(tmp_path / "out3"),
                          golden_dir=str(golden), combos=["ta"])
    assert not v3["ok"]
    assert not v3["samples"]["sample1"]["ta"]["golden"]["ok"]


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="no reference samples")
def test_verify_records_visibility_rejection(engine, tmp_path, monkeypatch):
    """The gesture-visibility gate must produce a FAILED verdict entry, not
    the CLI helper's sys.exit(0) (which would read as a silent pass)."""
    import importlib

    from jegal_tpu.models import gestsync as G

    cli = importlib.import_module("jegal_tpu.cli.main")
    monkeypatch.setattr(cli, "_decode_for_features", lambda path: None)
    monkeypatch.setattr(engine, "gestsync_params",
                        G.init_params(jax.random.PRNGKey(9)))
    verdict = run_verification(engine, SAMPLES, str(tmp_path / "out"),
                               combos=["vta"])
    assert not verdict["ok"]
    assert "gesture-visibility" in verdict["samples"]["sample1"]["error"]


def test_compare_embeddings_presence_mismatch():
    ours = {"gesture_emb": np.ones((3, 4), np.float32), "content_emb": None}
    golden = {"gesture_emb": None,
              "content_emb": np.ones((2, 4), np.float32)}
    res = compare_embeddings(ours, golden, 1e-3)
    assert not res["ok"]
    assert len([c for c in res["checks"] if not c["ok"]]) == 2
