"""Build a tiny character-level BPE tokenizer (via the `tokenizers` wheel)
with XLM-R-style specials, for tests that need word-aligned subword
tokenization with offsets — no network, no vocab downloads."""

import string


def make_tiny_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    chars = list(string.ascii_lowercase + string.digits)
    vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
    for c in chars:
        vocab[c] = len(vocab)
    # a few merges so some words split into multi-char subwords
    merges = [("h", "e"), ("l", "o"), ("w", "o"), ("a", "b")]
    for a, b in merges:
        vocab[a + b] = len(vocab)
    tok = Tokenizer(models.BPE(vocab, merges, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>",
        pair="<s> $A </s> </s> $B </s>",
        special_tokens=[("<s>", 0), ("</s>", 2)],
    )
    return tok


def make_word_tokenizer():
    from jegal_tpu.text.tokenizer import WordTokenizer

    return WordTokenizer(make_tiny_tokenizer())
