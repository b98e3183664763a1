"""CLI end-to-end smoke tests on the reference sample fixtures, with random
native checkpoints written to disk (real .pth/HF weights are not present in
this image; the converters are parity-tested separately)."""

import json
import os
import pickle

import numpy as np
import pytest
import torch

import jax

from jegal_tpu.cli.main import main
from jegal_tpu.convert import checkpoints as C
from jegal_tpu.models import jegal as J
from jegal_tpu.models import roberta as R

from tok_util import make_tiny_tokenizer

SAMPLES = "/root/reference/samples"


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpts")
    jegal_path = str(d / "jegal.npz")
    C.save_npz(J.init_params(jax.random.PRNGKey(0)), jegal_path)

    # tiny XLM-R: hidden must be 768 (encoder_text contract), 1 layer
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(0)
    hf = XLMRobertaModel(XLMRobertaConfig(
        vocab_size=300, hidden_size=768, num_hidden_layers=1,
        num_attention_heads=12, intermediate_size=256,
        max_position_embeddings=128, pad_token_id=1)).eval()
    cfg = R.RobertaConfig(vocab_size=300, hidden_size=768, num_layers=1,
                          num_heads=12, intermediate_size=256,
                          max_position_embeddings=128)
    roberta_path = str(d / "roberta.npz")
    C.save_roberta_npz(R.params_from_hf(hf.state_dict(), cfg), roberta_path,
                       num_heads=12)

    tok_path = str(d / "tokenizer.json")
    make_tiny_tokenizer().save(tok_path)
    return {"jegal": jegal_path, "roberta": roberta_path, "tok": tok_path}


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_infer_ta_on_sample1(ckpts, tmp_path, capsys):
    res = str(tmp_path / "res")
    main([
        "infer",
        "--checkpoint_path_jegal", ckpts["jegal"],
        "--roberta_path", ckpts["roberta"],
        "--tokenizer_path", ckpts["tok"],
        "--modalities", "ta",
        "--text_path", os.path.join(SAMPLES, "sample1.txt"),
        "--audio_path", os.path.join(SAMPLES, "sample1.wav"),
        "--res_dir", res,
    ])
    out = os.path.join(res, "sample1.pkl")
    assert os.path.exists(out)
    with open(out, "rb") as f:
        d = pickle.load(f)
    # sample1.txt has 8 words (README contract: content (W, 512))
    assert d["content_emb"].shape == (8, 512)
    assert d["gesture_emb"] is None
    np.testing.assert_allclose(
        np.linalg.norm(d["content_emb"], axis=-1), 1.0, rtol=1e-4)
    assert d["info"]["word_boundaries"][0][0] == "amount"
    # boundaries are frames: round(0.031*25) = 1
    assert d["info"]["word_boundaries"][0][1] == 1


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_infer_t_only_then_heatmap_needs_v(ckpts, tmp_path):
    res = str(tmp_path / "res")
    main([
        "infer",
        "--checkpoint_path_jegal", ckpts["jegal"],
        "--roberta_path", ckpts["roberta"],
        "--tokenizer_path", ckpts["tok"],
        "--modalities", "t",
        "--text_path", os.path.join(SAMPLES, "sample2.txt"),
        "--res_dir", res,
    ])
    with open(os.path.join(res, "sample2.pkl"), "rb") as f:
        d = pickle.load(f)
    assert d["gesture_emb"] is None and d["content_emb"] is not None


def test_infer_missing_args(ckpts):
    with pytest.raises(SystemExit):
        main(["infer", "--checkpoint_path_jegal", ckpts["jegal"],
              "--modalities", "a"])  # no --audio_path
    with pytest.raises(SystemExit):
        main(["infer", "--checkpoint_path_jegal", ckpts["jegal"],
              "--modalities", "v"])  # no --video_path


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_verify_cli_end_to_end(ckpts, tmp_path, capsys):
    """`jegal_tpu verify` through argv parsing: audio-only (no roberta /
    tokenizer / gestsync given) against the reference samples, JSON verdict
    on stdout, exit 0."""
    main(["verify", "--checkpoint_path_jegal", ckpts["jegal"],
          "--samples_dir", SAMPLES, "--res_dir", str(tmp_path / "v")])
    verdict = json.loads(capsys.readouterr().out)
    assert verdict["ok"] and verdict["combos"] == ["a"]
    assert os.path.exists(tmp_path / "v" / "sample1_a.pkl")


def test_warmup_cli(ckpts, capsys):
    """`jegal_tpu warmup` arg wiring: one combo at tiny buckets, JSON table
    with per-graph seconds."""
    main(["warmup", "--checkpoint_path", ckpts["jegal"],
          "--modalities", "a", "--w_buckets", "8", "--mel_buckets", "64"])
    out = json.loads(capsys.readouterr().out)
    assert out["graphs"][0]["combo"] == "a"
    assert out["graphs"][0]["mel"] == 64
    assert out["total_seconds"] > 0


def test_transcribe_cli_arg_validation(capsys):
    with pytest.raises(SystemExit, match="exactly one"):
        main(["transcribe", "--res_dir", "x"])


def test_convert_roundtrip(ckpts, tmp_path):
    params, cfg = C.load_roberta(ckpts["roberta"])
    assert cfg.hidden_size == 768 and cfg.num_layers == 1 and cfg.num_heads == 12
    tree = C.load_npz(ckpts["jegal"])
    assert "encoder_rgb" in tree and len(tree["encoder_rgb"]["layers"]) == 6
    # save/load roundtrip preserves values
    p2 = str(tmp_path / "again.npz")
    C.save_npz(tree, p2)
    tree2 = C.load_npz(p2)
    np.testing.assert_array_equal(
        np.asarray(tree["proj_op_rgb"]["kernel"]),
        np.asarray(tree2["proj_op_rgb"]["kernel"]))


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
def test_reference_pth_checkpoint_roundtrip(tmp_path):
    """Real reference checkpoint format: torch .pth with {'state_dict': ...}
    under DataParallel 'module.' prefixes -> load_gestsync -> convert CLI
    -> native .npz -> identical pytree."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from oracles import ref_gestsync

    gm = ref_gestsync()
    model = gm.GestSync()
    sd = {"module." + k: v for k, v in model.state_dict().items()}
    pth = str(tmp_path / "gestsync.pth")
    torch.save({"state_dict": sd}, pth)

    params = C.load_gestsync(pth)
    assert "net_aud" in params and "ff_aud" in params  # audio branch covered
    want = np.asarray(model.state_dict()["net_vid.conv1.weight"])
    got = np.asarray(params["net_vid"][0]["conv"]["kernel"])
    np.testing.assert_allclose(got.transpose(4, 3, 0, 1, 2), want, rtol=1e-6)

    # convert CLI -> npz -> reload matches
    npz = str(tmp_path / "gestsync.npz")
    main(["convert", "--model", "gestsync", "--src", pth, "--dst", npz])
    again = C.load_gestsync(npz)
    np.testing.assert_array_equal(
        np.asarray(params["ff2"]["kernel"]), np.asarray(again["ff2"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(params["transformer"]["layers"][3]["attn"]["q"]["kernel"]),
        np.asarray(again["transformer"]["layers"][3]["attn"]["q"]["kernel"]))


def test_eval_cli_on_device_equals_host(tmp_path, capsys):
    """eval-retrieval/-spotting/-asd --on_device through the CLI equal
    their host-path outputs on a small synthetic embedding set."""
    import pandas as pd

    d = tmp_path / "embs"
    d.mkdir()
    rng2 = np.random.default_rng(9)
    base = rng2.standard_normal((6, 512)).astype(np.float32)
    wbs = [["a", 0, 3], ["b", 4, 8], ["c", 9, 12]]
    for i in range(6):
        g = np.tile(base[i], (10, 1)) + 0.01 * rng2.standard_normal(
            (10, 512)).astype(np.float32)
        c = np.tile(base[i], (3, 1)) + 0.01 * rng2.standard_normal(
            (3, 512)).astype(np.float32)
        with open(d / f"s{i}__c.pkl", "wb") as f:
            pickle.dump({"gesture_emb": g, "content_emb": c,
                         "info": {"word_boundaries": str(wbs),
                                  "target_word_boundary": str(wbs[1])}}, f)
    csv = str(tmp_path / "asd.csv")
    pd.DataFrame([{"filename": f"s{i}/c",
                   "neg_files": str([f"s{j}/c" for j in range(3) if j != i])}
                  for i in range(6)]).to_csv(csv, index=False)

    def run(argv):
        main(argv)
        return json.loads(capsys.readouterr().out)

    for sub, extra in (("eval-retrieval", []), ("eval-spotting", []),
                       ("eval-asd", ["--file", csv])):
        host = run([sub, "--path", str(d)] + extra)
        dev = run([sub, "--path", str(d), "--on_device"] + extra)
        assert dev == host, (sub, dev, host)


def test_preprocess_filter_copy(tmp_path, capsys):
    """--final_dir/--filter_csv replicate the reference filter_and_merge
    rsync stage (preprocess_videos.py:534-548): CSV-selected .avi/.wav copy
    into the final tree; missing files are counted, not fatal."""
    initial = tmp_path / "initial"
    (initial / "vid1" / "preprocessed").mkdir(parents=True)
    (initial / "vid1" / "preprocessed" / "00000.avi").write_bytes(b"A")
    (initial / "vid1" / "preprocessed" / "00000.wav").write_bytes(b"W")
    csv_path = tmp_path / "filtered.csv"
    csv_path.write_text(
        "filename\nvid1/preprocessed/00000\nvid2/preprocessed/00001\n")
    final = tmp_path / "final"

    main(["preprocess", "--preprocessed_root", str(initial),
          "--final_dir", str(final), "--filter_csv", str(csv_path)])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats == {"copied": 2, "missing": 2}
    assert (final / "vid1" / "preprocessed" / "00000.avi").read_bytes() == b"A"
    assert (final / "vid1" / "preprocessed" / "00000.wav").read_bytes() == b"W"
