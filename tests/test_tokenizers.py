"""Tokenizer tests: BPE algorithm with a synthetic merges file, WordPiece
with a synthetic vocab, and the asset-free hash fallback."""

import gzip
import os

import numpy as np
import pytest

from cyclediffusion_tpu.text import (
    BertWordPieceTokenizer,
    CLIPBPETokenizer,
    HashTokenizer,
)


def test_hash_tokenizer_stable_and_bounded():
    tok = HashTokenizer(vocab_size=100, context_length=8)
    a = tok(["hello world", "a much longer sentence that must be truncated ok"])
    b = tok(["hello world", "a much longer sentence that must be truncated ok"])
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 8)
    assert a.max() < 100 and a.min() >= 0
    assert a[0, 0] == tok.sot
    # eot is the max id so argmax pooling finds it
    assert tok.eot == 99


def test_clip_bpe_tokenizer_missing_asset():
    with pytest.raises(FileNotFoundError):
        CLIPBPETokenizer("/nonexistent/bpe.txt.gz")


def test_clip_bpe_tokenizer_synthetic_vocab(tmp_path):
    # minimal merges file: header line + a few merges over ascii bytes
    merges = "#version: synthetic\nh e\nl l\nhe ll\no</w> o</w>\n"
    path = str(tmp_path / "bpe.txt.gz")
    with gzip.open(path, "wt") as f:
        f.write(merges)
    tok = CLIPBPETokenizer(path, context_length=16)
    out = tok(["hello hello", "HELLO"])
    assert out.shape == (2, 16)
    assert out[0, 0] == tok.sot
    # lowercasing means HELLO == hello (compare the first word's tokens)
    np.testing.assert_array_equal(out[0, :3], out[1, :3])
    eot_pos = int(np.argmax(out[1]))
    assert out[1, eot_pos] == tok.eot


def test_bert_wordpiece_synthetic_vocab(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "wo",
             "##rld", "##llo", "he"]
    path = str(tmp_path / "vocab.txt")
    with open(path, "w") as f:
        f.write("\n".join(vocab))
    tok = BertWordPieceTokenizer(path, max_length=8)
    out = tok(["hello world", "worldly"])
    assert out.shape == (2, 8)
    assert out[0, 0] == tok.cls
    assert list(out[0, 1:4]) == [4, 5, tok.sep]
    # 'worldly' -> 'wo ##rld' then fails on 'ly' -> UNK for whole word
    assert tok.unk in out[1]


def test_bert_missing_asset():
    with pytest.raises(FileNotFoundError):
        BertWordPieceTokenizer("/nonexistent/vocab.txt")
