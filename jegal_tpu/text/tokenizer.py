"""Tokenizer adapter producing word-aligned batches for the text branch.

Replicates the reference's use of the HF fast tokenizer
(models/jegal.py:116-129): pre-split words (`text.split(" ")` — single-space
split, reference jegal.py:119), `is_split_into_words=True`, offset mappings,
batch padding. The backing implementation is the `tokenizers` library (a
host-side Rust wheel); the vocabulary file is supplied by the user (e.g. the
xlm-roberta-base tokenizer.json) — no network access is assumed.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class WordBatch:
    """A padded, word-aligned token batch.

    input_ids / attention_mask: (B, S) int32; offsets: (B, S, 2) int32
    words: the per-sample word lists (post single-space split)
    special_ids: ids excluded from word starts (cls/sep/pad)
    """

    input_ids: np.ndarray
    attention_mask: np.ndarray
    offsets: np.ndarray
    words: list[list[str]]
    special_ids: tuple[int, ...]


class WordTokenizer:
    """Wraps a `tokenizers.Tokenizer` for pretokenized encoding with offsets.

    For xlm-roberta-base: cls=0 '<s>', pad=1 '<pad>', sep=2 '</s>'.
    """

    def __init__(self, tokenizer, cls_id: int = 0, pad_id: int = 1,
                 sep_id: int = 2, pad_token: str = "<pad>"):
        self.tok = tokenizer
        self.cls_id = cls_id
        self.pad_id = pad_id
        self.sep_id = sep_id
        self.pad_token = pad_token

    @classmethod
    def from_file(cls, path: str, **kw):
        from tokenizers import Tokenizer

        return cls(Tokenizer.from_file(path), **kw)

    @property
    def special_ids(self) -> tuple[int, ...]:
        return (self.cls_id, self.sep_id, self.pad_id)

    def encode_words(self, texts: list[str], pad_to: int | None = None) -> WordBatch:
        """texts: raw strings; each is split on single spaces into words and
        encoded pretokenized with specials + batch padding."""
        words = [t.split(" ") for t in texts]
        self.tok.enable_padding(pad_id=self.pad_id, pad_token=self.pad_token,
                                length=pad_to)
        encs = self.tok.encode_batch(words, is_pretokenized=True)
        s = max(len(e.ids) for e in encs)
        b = len(encs)
        ids = np.full((b, s), self.pad_id, dtype=np.int32)
        mask = np.zeros((b, s), dtype=np.int32)
        offs = np.zeros((b, s, 2), dtype=np.int32)
        for i, e in enumerate(encs):
            n = len(e.ids)
            ids[i, :n] = e.ids
            mask[i, :n] = e.attention_mask
            offs[i, :n] = np.asarray(e.offsets, dtype=np.int32)
        return WordBatch(ids, mask, offs, words, self.special_ids)
