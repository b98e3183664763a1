"""Training data pipeline: word-window sampling, collation, and the
GestSync audio-branch shape contract."""

import numpy as np
import pytest

import jax

from jegal_tpu.training import data as D

from tok_util import make_word_tokenizer


def _rows(n=12):
    return [f"w{i}, {i * 0.4:.2f}, {i * 0.4 + 0.3:.2f}, 0.9" for i in range(n)]


def test_sample_word_window(rng):
    g = np.random.default_rng(0)
    rows = _rows()
    for _ in range(20):
        out = D.sample_word_window(rows, g)
        assert out is not None
        text, start, end, wbs = out
        assert 5 <= len(wbs) <= 19
        assert start == wbs[0][1] and end == wbs[-1][2]
        assert text.split(" ") == [w[0] for w in wbs]
    assert D.sample_word_window(_rows(3), g) is None  # too short


def test_load_and_collate(tmp_path, rng):
    from scipy.io import wavfile

    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rows = []
    for i in range(3):
        np.save(feat_dir / f"c{i}.npy",
                rng.standard_normal((150, 1024)).astype(np.float32))
        wav = (rng.standard_normal(16000 * 5) * 300).astype(np.int16)
        wav_path = tmp_path / f"c{i}.wav"
        wavfile.write(wav_path, 16000, wav)
        txt_path = tmp_path / f"c{i}.txt"
        txt_path.write_text("Text: x\nLang: en\n\nWORD, START, END, SCORE\n"
                            + "\n".join(_rows(10)) + "\n")
        rows.append({"filename": f"c{i}", "text_path": str(txt_path),
                     "audio_path": str(wav_path)})

    g = np.random.default_rng(1)
    samples = [D.load_training_sample(r, str(feat_dir), g) for r in rows]
    assert all(s is not None for s in samples)
    for s in samples:
        assert s["visual_feats"].shape[1] == 1024
        assert len(s["word_boundaries"]) >= 5

    batch = D.collate_training_batch(samples, make_word_tokenizer())
    assert batch is not None
    b = batch["visual_feats"].shape[0]
    assert b == 3
    assert batch["audio_mel"].shape[0] == b
    assert batch["text_pool"].shape[1] == batch["audio_pool"].shape[1]
    # word_mask counts match true word counts
    for i, s in enumerate(samples):
        assert int(batch["word_mask"][i].sum()) == len(s["word_boundaries"])
    # the batch feeds the trainer loss directly
    import __graft_entry__ as E
    from jegal_tpu.training import trainer

    jparams, rparams, cfg = E._models(jax.random.PRNGKey(0), roberta_layers=1,
                                      vocab=64, max_pos=64)
    loss = trainer.loss_fn(jparams, rparams, batch, jax.random.PRNGKey(1), cfg)
    assert np.isfinite(float(loss))


def test_missing_files_return_none(tmp_path):
    g = np.random.default_rng(0)
    row = {"filename": "x", "text_path": "/nope.txt", "audio_path": "/nope.wav"}
    assert D.load_training_sample(row, str(tmp_path), g) is None


def test_gestsync_audio_branch_shapes(rng):
    from jegal_tpu.models import gestsync as G
    from jegal_tpu.core.layers import init_conv, init_batch_norm

    key = iter(jax.random.split(jax.random.PRNGKey(0), 16))
    net_aud = []
    for i, spec in enumerate(G.AUD_SPEC):
        net_aud.append({
            "conv": init_conv(next(key),
                              spec["k"] + (G.AUD_CHANNELS[i], G.AUD_CHANNELS[i + 1])),
            "bn": init_batch_norm(G.AUD_CHANNELS[i + 1]),
        })
    params = {
        "net_aud": net_aud,
        "ff_aud": {
            "fc7": init_conv(next(key), (1, 1, 512, 512)),
            "bn7": init_batch_norm(512),
            "fc8": init_conv(next(key), (1, 1, 512, 1024)),
        },
    }
    # mel-style input: (B, F=80, T=100, 1)
    x = rng.standard_normal((1, 80, 100, 1)).astype(np.float32)
    import jax.numpy as jnp

    out = G.forward_aud(params, jnp.asarray(x))
    assert out.shape[0] == 1 and out.shape[1] == 1024
    assert np.isfinite(np.asarray(out)).all()
