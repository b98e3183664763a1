"""Word-pooling matrices vs a naive loop implementing the reference
semantics (models/jegal.py:131-252)."""

import numpy as np

import jax.numpy as jnp

from jegal_tpu.ops import pooling as P


def _naive_text_pool(emb, starts, n_words, seq_len):
    """Reference get_word_level_embs semantics for one sample."""
    out = []
    for w in range(n_words):
        lo = starts[w]
        hi = starts[w + 1] if w < len(starts) - 1 else seq_len
        out.append(emb[lo:hi].mean(axis=0))
    return np.stack(out)


def test_text_pooling_matches_naive(rng):
    b, s, d, w_max = 3, 12, 8, 5
    emb = rng.standard_normal((b, s, d)).astype(np.float32)
    word_starts = [[1, 3, 6], [1, 2, 4, 7, 9], [1]]
    num_words = [3, 5, 1]
    p, valid, counts = P.build_text_pooling(word_starts, num_words, s, w_max)
    assert valid.all()
    assert list(counts) == num_words
    pooled = np.asarray(P.pool_words(jnp.asarray(p), jnp.asarray(emb)))
    for i in range(b):
        want = _naive_text_pool(emb[i], word_starts[i], num_words[i], s)
        np.testing.assert_allclose(pooled[i, : num_words[i]], want, rtol=1e-5, atol=1e-6)
        # padded word slots must be exactly zero
        assert (pooled[i, num_words[i]:] == 0).all()


def test_text_pooling_last_word_extends_to_pad():
    """Reference quirk: the last word's span includes </s> and padding
    (models/jegal.py:168-171)."""
    s = 8
    p, valid, _ = P.build_text_pooling([[1, 3]], [2], s, 4)
    assert valid[0]
    # word 1 spans tokens 3..7 (to end of padded axis)
    np.testing.assert_allclose(p[0, 1, 3:], 1.0 / 5)
    assert (p[0, 1, :3] == 0).all()


def test_text_pooling_invalid_samples():
    # more words than starts -> invalid; zero words -> invalid
    p, valid, counts = P.build_text_pooling([[1], [1, 2], []], [3, 2, 0], 6, 4)
    assert list(valid) == [False, True, False]
    assert (p[0] == 0).all() and (p[2] == 0).all()


def test_audio_pooling_matches_naive(rng):
    t, d, w_max = 20, 6, 4
    emb = rng.standard_normal((1, t, d)).astype(np.float32)
    wbs = [[["a", 10, 13], ["b", 14, 14], ["c", 15, 32]]]  # c clamps at t
    p, valid, counts = P.build_audio_pooling(wbs, t, w_max)
    assert valid[0] and counts[0] == 3
    pooled = np.asarray(P.pool_words(jnp.asarray(p), jnp.asarray(emb)))[0]
    # actual_start = 10: a -> tokens [0,4), b -> [4,5), c -> [5, 23) clamped to t
    # atol guards near-zero mean components (session rng varies across runs)
    np.testing.assert_allclose(pooled[0], emb[0, 0:4].mean(axis=0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pooled[1], emb[0, 4:5].mean(axis=0), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(pooled[2], emb[0, 5:t].mean(axis=0), rtol=1e-5, atol=1e-5)


def test_audio_pooling_empty_span_invalid():
    wbs = [[["a", 5, 7], ["b", 30, 31]]]  # b entirely out of range
    p, valid, _ = P.build_audio_pooling(wbs, 10, 4)
    assert not valid[0]
    assert (p[0] == 0).all()


def test_text_word_starts():
    ids = np.array([[0, 11, 12, 13, 2, 1, 1]])
    offs = np.zeros((1, 7, 2), np.int64)
    offs[0] = [(0, 0), (0, 2), (2, 4), (0, 3), (0, 0), (0, 0), (0, 0)]
    starts = P.text_word_starts(ids, offs, special_ids=(0, 2, 1))
    assert starts == [[1, 3]]  # token 2 continues word 0; specials excluded


def test_audio_pooling_negative_start_invalid():
    """Non-monotonic boundaries (a word starting before the first word) hit
    negative torch indices in the reference and crash — fail loud, not
    silently pool a clamped span."""
    wbs = [[["a", 10, 13], ["b", 4, 8]]]  # b starts before actual_start=10
    p, valid, _ = P.build_audio_pooling(wbs, 20, 4)
    assert not valid[0]
    assert (p[0] == 0).all()
