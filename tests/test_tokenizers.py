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


def test_clip_bpe_exact_ids_hand_derived(tmp_path):
    """Golden exact-id test with a hand-traced merges table.

    Verifies the full id arithmetic of the CLIP vocab construction
    (512 byte-level tokens, then one id per merge in file order, specials
    last) and the lowest-rank-first merge loop:
      merges: rank0 = (l, o)  rank1 = (lo, w</w>)  rank2 = (e, r</w>)
      "low"   -> l o w</w> -> lo w</w> -> low</w>          = [513]
      "lower" -> l o w e r</w> -> lo w e r</w> -> lo w er</w> = [512, 86, 514]
        ('w' = printable ascii: ord('w') - 33 = 86)
      "er"    -> e r</w> -> er</w>                          = [514]
    """
    merges = "#version: test\nl o\nlo w</w>\ne r</w>\n"
    path = str(tmp_path / "bpe.txt.gz")
    with gzip.open(path, "wt") as f:
        f.write(merges)
    tok = CLIPBPETokenizer(path, context_length=16)
    assert tok.sot == 515 and tok.eot == 516
    assert tok.encode_text("low lower er") == [513, 512, 86, 514, 514]
    out = tok(["low lower er"])
    np.testing.assert_array_equal(
        out[0, :7], [515, 513, 512, 86, 514, 514, 516])
    assert out[0, 7:].max() == 0


def test_clip_bpe_real_vocab_golden_ids():
    """Asset-gated: with the real bpe_simple_vocab_16e6.txt.gz, reproduce
    clip.tokenize's published ids (open_clip test fixture strings).  Skipped
    without the asset; one wrong merge rule here would silently destroy SD
    conditioning parity on real checkpoints."""
    path = os.environ.get("CYCLEDIFFUSION_CLIP_BPE")
    if not path or not os.path.exists(path):
        pytest.skip("no CLIP BPE asset")
    tok = CLIPBPETokenizer(path)
    assert tok.sot == 49406 and tok.eot == 49407
    out = tok(["a photo of a cat", "a photo of a dog"])
    np.testing.assert_array_equal(
        out[0, :7], [49406, 320, 1125, 539, 320, 2368, 49407])
    np.testing.assert_array_equal(
        out[1, :7], [49406, 320, 1125, 539, 320, 1929, 49407])


def test_bert_wordpiece_real_vocab_golden_ids():
    """Asset-gated: bert-base-uncased vocab reproduces HF BertTokenizer ids."""
    path = os.environ.get("CYCLEDIFFUSION_BERT_VOCAB")
    if not path or not os.path.exists(path):
        pytest.skip("no BERT vocab asset")
    tok = BertWordPieceTokenizer(path)
    out = tok(["a photo of a cat"])
    np.testing.assert_array_equal(
        out[0, :7], [101, 1037, 9361, 1997, 1037, 4937, 102])
    assert out[0, 7] == tok.pad
