"""Text normalization, transcript parsing, tokenizer adapter, bucketing."""

import os

import numpy as np
import pytest

from jegal_tpu.data.bucketing import next_bucket, pad_axis
from jegal_tpu.text.normalize import load_text, preprocess_text, validate_text_file

from tok_util import make_word_tokenizer

SAMPLES = "/root/reference/samples"


def test_preprocess_text():
    assert preprocess_text("Hat,") == "hat"
    assert preprocess_text("IT'S") == "its"
    assert preprocess_text("...") == ""


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="reference not mounted")
def test_load_sample1():
    text, wbs = load_text(os.path.join(SAMPLES, "sample1.txt"))
    assert text == "amount of numbers inside the hat mixing the"
    assert len(wbs) == 8
    # sec -> frames at 25 fps with round()
    assert wbs[0] == ["amount", round(0.031 * 25), round(0.255 * 25)]
    assert wbs[5][0] == "hat"  # punctuation stripped


def test_validate_text_file(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("Text: x\nLang: en\nWORD, START, END, SCORE\n")
    with pytest.raises(ValueError):
        validate_text_file(str(bad))
    good = tmp_path / "good.txt"
    good.write_text("Text: hi\nLang: en\n\nWORD, START, END, SCORE\nhi, 0.0, 0.4, 0.9\n")
    assert validate_text_file(str(good))
    text, wbs = load_text(str(good))
    assert text == "hi" and wbs == [["hi", 0, 10]]


def test_tokenizer_offsets_and_specials():
    tok = make_word_tokenizer()
    batch = tok.encode_words(["hello ab", "x"])
    assert batch.input_ids.shape[0] == 2
    # row 0: <s> + subwords + </s>; first token is cls=0
    assert batch.input_ids[0, 0] == 0
    assert 2 in batch.input_ids[0]  # sep present
    # word starts: offset[0]==0 and not special
    from jegal_tpu.ops.pooling import text_word_starts

    starts = text_word_starts(batch.input_ids, batch.offsets, batch.special_ids)
    assert len(starts[0]) == 2  # two words detected
    assert len(starts[1]) == 1
    # shorter row is padded with pad_id and mask 0
    assert batch.attention_mask[1].sum() < batch.attention_mask[0].sum()


def test_bucketing():
    assert next_bucket(1) == 32
    assert next_bucket(32) == 32
    assert next_bucket(33) == 64
    # past the table end: next multiple of the last bucket (not doubling —
    # a 3000-frame video pads to 3072, not 4096)
    assert next_bucket(513) == 1024
    assert next_bucket(1025) == 1536
    assert next_bucket(3000) == 3072
    with pytest.raises(ValueError):
        next_bucket(0)
    x = np.ones((2, 3))
    y = pad_axis(x, 1, 5)
    assert y.shape == (2, 5) and (y[:, 3:] == 0).all()
    with pytest.raises(ValueError):
        pad_axis(x, 1, 2)


def test_config_constants():
    from jegal_tpu.config import DEFAULT

    assert DEFAULT.audio.hop_length == 160
    assert DEFAULT.audio.sample_rate // DEFAULT.audio.hop_length // 4 == 25
    assert DEFAULT.model.temperature == 0.07
    d = DEFAULT.to_dict()
    assert d["eval"]["spot_frame_threshold"] == 9
