"""Tokenizers for the three text surfaces of CycleDiffusion.

* :class:`CLIPBPETokenizer` — OpenAI CLIP byte-level BPE (used by both the SD
  conditioning text encoder and the ViT-B/32 scoring model; the reference
  calls ``clip.tokenize``).  Needs the standard
  ``bpe_simple_vocab_16e6.txt.gz`` merges file — a user-provided asset like
  the checkpoints (this environment has no network; the file ships with the
  openai-clip package or its repo).
* :class:`BertWordPieceTokenizer` — bert-base-uncased WordPiece (LDM
  text2img-large's ``BERTTokenizer``); needs the standard ``vocab.txt``.
* :class:`HashTokenizer` — deterministic hashed-vocabulary fallback for tests
  and benches when no assets are present.  NOT parity with any checkpoint.

All tokenizers return fixed-length ``(B, context_length) int32`` arrays.
"""

from __future__ import annotations

import gzip
import os
import re
from functools import lru_cache
from typing import List, Sequence

import numpy as np


# --------------------------------------------------------------------------- #
# OpenAI CLIP byte-level BPE
# --------------------------------------------------------------------------- #


@lru_cache()
def _bytes_to_unicode():
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


_CLIP_PAT = re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"""
    if False
    else r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""",
    re.IGNORECASE,
)


def _basic_clean(text: str) -> str:
    text = re.sub(r"\s+", " ", text)
    return text.strip().lower()


class CLIPBPETokenizer:
    """Byte-level BPE with the CLIP merges table.

    ``context_length=77``, ``<|startoftext|>`` / ``<|endoftext|>`` wrapping,
    zero padding, truncation keeps the EOT token — matching ``clip.tokenize``.
    """

    def __init__(self, bpe_path: str, context_length: int = 77):
        if not os.path.exists(bpe_path):
            raise FileNotFoundError(
                f"CLIP BPE merges file not found: {bpe_path}. Provide the "
                "standard bpe_simple_vocab_16e6.txt.gz asset (see README)."
            )
        self.context_length = context_length
        self.byte_encoder = _bytes_to_unicode()
        opener = gzip.open if bpe_path.endswith(".gz") else open
        with opener(bpe_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        # slice matches clip/simple_tokenizer.py; the pair-filter only guards
        # short synthetic files (blank tail lines) — every line in the real
        # asset's slice has exactly two elements
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        merges = [m for m in merges if len(m) == 2]
        vocab = list(_bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = dict(zip(vocab, range(len(vocab))))
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self.vocab_size = len(self.encoder)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                    new_word.extend(word[i:j])
                    i = j
                except ValueError:
                    new_word.extend(word[i:])
                    break
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode_text(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        for token in re.findall(_CLIP_PAT, _basic_clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(
                self.encoder[t] for t in self._bpe(token).split(" ")
            )
        return bpe_tokens

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            toks = [self.sot] + self.encode_text(text) + [self.eot]
            if len(toks) > self.context_length:
                toks = toks[: self.context_length]
                toks[-1] = self.eot
            out[i, : len(toks)] = toks
        return out


# --------------------------------------------------------------------------- #
# BERT WordPiece (bert-base-uncased)
# --------------------------------------------------------------------------- #


class BertWordPieceTokenizer:
    """Lowercasing basic tokenizer + WordPiece, [CLS] ... [SEP] + [PAD]
    padding to max_length — matching HF BertTokenizerFast with
    ``padding="max_length"`` as used by the reference's BERTTokenizer."""

    def __init__(self, vocab_path: str, max_length: int = 77):
        if not os.path.exists(vocab_path):
            raise FileNotFoundError(
                f"BERT vocab.txt not found: {vocab_path}. Provide the "
                "bert-base-uncased vocab asset (see README)."
            )
        self.max_length = max_length
        with open(vocab_path, encoding="utf-8") as f:
            tokens = [l.rstrip("\n") for l in f]
        self.vocab = {t: i for i, t in enumerate(tokens)}
        self.cls = self.vocab["[CLS]"]
        self.sep = self.vocab["[SEP]"]
        self.pad = self.vocab["[PAD]"]
        self.unk = self.vocab["[UNK]"]
        self.vocab_size = len(self.vocab)

    def _basic(self, text: str) -> List[str]:
        text = text.lower().strip()
        text = re.sub(r"([^\w\s])", r" \1 ", text)
        return text.split()

    def _wordpiece(self, word: str) -> List[int]:
        if word in self.vocab:
            return [self.vocab[word]]
        ids: List[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk]
            ids.append(cur)
            start = end
        return ids

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        out = np.full((len(texts), self.max_length), self.pad, dtype=np.int32)
        for i, text in enumerate(texts):
            ids: List[int] = []
            for w in self._basic(text):
                ids.extend(self._wordpiece(w))
            ids = [self.cls] + ids[: self.max_length - 2] + [self.sep]
            out[i, : len(ids)] = ids
        return out


# --------------------------------------------------------------------------- #
# Asset-free fallback
# --------------------------------------------------------------------------- #


class HashTokenizer:
    """Deterministic hashed tokenizer for tests/benches without vocab assets.

    NOT compatible with any pretrained checkpoint — id streams are stable
    across runs but carry no linguistic meaning.
    """

    def __init__(self, vocab_size: int = 49408, context_length: int = 77,
                 sot: int | None = None, eot: int | None = None):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.sot = vocab_size - 2 if sot is None else sot
        self.eot = vocab_size - 1 if eot is None else eot

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        import zlib  # crc32: stable across processes, unlike builtin hash()

        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            words = _basic_clean(text).split()
            ids = [self.sot] + [
                (zlib.crc32(w.encode()) % (self.vocab_size - 3)) + 1
                for w in words
            ][: self.context_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out
