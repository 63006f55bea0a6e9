"""C++ BPE encoders (csrc/tokenizer.cpp spbpe_*/fastbpe_*) must match the
pure-Python backends bit-for-bit — including unicode, emoji, truncation and
empty-string edges."""

import os

import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.data.bpe_backends import (
    FastBPE, SentencePieceBPE,
)
from socialmedia_textimage_classification_auxlosses_tpu.data.native import (
    native_available,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native tokenizer lib unavailable")

TEXTS = [
    "hello world",
    "hello hellox world",
    "x",
    "",
    "hel wo wrld",
    "héllo wörld",            # non-ASCII multibyte
    "emoji \U0001f600 test",  # 4-byte UTF-8
    "  spaced   out  ",
    "hello " * 40,            # truncation past max_length
    "hello world",       # NBSP: str.split() separator, not ASCII isspace
    "hello world　x",  # em space / ideographic space
    " hello world ",  # line/para separators + narrow NBSP
    "hello\tworld\x0bx",      # ASCII control whitespace
]


@pytest.fixture
def spm_dir(tmp_path):
    from transformers.utils import sentencepiece_model_pb2_new as pb2

    proto = pb2.ModelProto()

    def add(piece, score, typ):
        p = proto.pieces.add()
        p.piece, p.score, p.type = piece, score, typ

    add("<unk>", 0.0, 2)
    add("<s>", 0.0, 3)
    add("</s>", 0.0, 3)
    for piece, score in [("▁", -10.0), ("h", -9.0), ("e", -8.0), ("l", -7.0),
                         ("o", -6.0), ("▁h", -4.0), ("▁he", -2.0),
                         ("ll", -5.0), ("llo", -3.0), ("▁hello", -1.0),
                         ("w", -9.5), ("r", -9.4), ("d", -9.3),
                         ("▁w", -4.5), ("▁wo", -3.5), ("▁wor", -3.2),
                         ("▁worl", -3.1), ("▁world", -1.5),
                         ("é", -8.5), ("ö", -8.6)]:
        add(piece, score, 1)
    d = tmp_path / "bernice_model"
    d.mkdir()
    (d / "sentencepiece.bpe.model").write_bytes(proto.SerializeToString())
    return str(d)


@pytest.fixture
def bertweet_dir(tmp_path):
    d = tmp_path / "bertweet_model"
    d.mkdir()
    (d / "bpe.codes").write_text(
        "h e 100\nhe l 90\nhel lo</w> 80\nw o 70\nwo rld</w> 60\n")
    (d / "vocab.txt").write_text(
        "hello 50\nworld 40\nhel 30\nlo 20\nhe 10\nwo 9\nrld 8\nx 7\n")
    return str(d)


def test_spbpe_native_matches_python(spm_dir):
    path = os.path.join(spm_dir, "sentencepiece.bpe.model")
    nat = SentencePieceBPE(path, max_length=16, use_native=True)
    py = SentencePieceBPE(path, max_length=16, use_native=False)
    assert nat._native is not None, "native path did not engage"
    ids_n, mask_n, _ = nat.encode_batch(TEXTS)
    ids_p, mask_p, _ = py.encode_batch(TEXTS)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_fastbpe_native_matches_python(bertweet_dir):
    vocab = os.path.join(bertweet_dir, "vocab.txt")
    codes = os.path.join(bertweet_dir, "bpe.codes")
    nat = FastBPE(vocab, codes, max_length=16, use_native=True)
    py = FastBPE(vocab, codes, max_length=16, use_native=False)
    assert nat._native is not None, "native path did not engage"
    ids_n, mask_n, _ = nat.encode_batch(TEXTS)
    ids_p, mask_p, _ = py.encode_batch(TEXTS)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_fastbpe_native_matches_transformers(bertweet_dir):
    """And the native path stays id-for-id with transformers'
    BertweetTokenizer (the reference's loader, text_only.py:83-86)."""
    from transformers.models.bertweet.tokenization_bertweet import (
        BertweetTokenizer,
    )

    hf = BertweetTokenizer(os.path.join(bertweet_dir, "vocab.txt"),
                           os.path.join(bertweet_dir, "bpe.codes"))
    nat = FastBPE(os.path.join(bertweet_dir, "vocab.txt"),
                  os.path.join(bertweet_dir, "bpe.codes"),
                  max_length=16, use_native=True)
    assert nat._native is not None
    for text in ["hello world", "hello hellox world", "x", "", "hel wo wrld"]:
        ids, _, _ = nat.encode_batch([text])
        ref = hf(text, padding="max_length", truncation=True,
                 max_length=16)["input_ids"]
        np.testing.assert_array_equal(ids[0], np.asarray(ref, np.int32),
                                      err_msg=text)
