"""Rust-tokenizer backend paths: tokenizer.json and vocab.json+merges.txt
(RoBERTa layout), trained offline on a tiny corpus."""

import os

import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.data.tokenizers import (
    build_tokenizer,
)

CORPUS = ["hello world this is a tweet", "another tweet about the world",
          "hello hello hello twitter world"] * 10


@pytest.fixture
def bpe_dir(tmp_path):
    from tokenizers import ByteLevelBPETokenizer

    tok = ByteLevelBPETokenizer()
    tok.train_from_iterator(CORPUS, vocab_size=200, min_frequency=1,
                            special_tokens=["<s>", "<pad>", "</s>", "<unk>"])
    d = tmp_path / "roberta_model"
    d.mkdir()
    tok.save_model(str(d))
    assert (d / "vocab.json").exists() and (d / "merges.txt").exists()
    return str(d)


@pytest.fixture
def tokjson_dir(tmp_path):
    from tokenizers import BertWordPieceTokenizer

    tok = BertWordPieceTokenizer(lowercase=True)
    tok.train_from_iterator(CORPUS, vocab_size=120, min_frequency=1,
                            special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]"])
    d = tmp_path / "bert_model"
    d.mkdir()
    tok.save(str(d / "tokenizer.json"))
    return str(d)


def test_byte_level_bpe_roberta_layout(bpe_dir):
    tok = build_tokenizer("roberta", bpe_dir, max_length=12, vocab_size=200,
                          normalize=False)
    enc = tok(["hello world", ""])
    ids, mask = enc["ids"], enc["mask"]
    assert ids.shape == (2, 12)
    # roberta layout: <s> ... </s>, no token types
    assert "token_type_ids" not in enc
    assert mask[1].sum() == 2  # <s></s> only for empty text
    assert tok.pad_token_id == 1


def test_tokenizer_json_backend(tokjson_dir):
    tok = build_tokenizer("bert", tokjson_dir, max_length=10, vocab_size=120,
                          normalize=False)
    enc = tok(["hello world"])
    assert enc["ids"].shape == (1, 10)
    assert "token_type_ids" in enc
    assert enc["mask"][0].sum() >= 4  # cls + >=2 pieces + sep


def test_missing_dir_falls_back_to_hash(tmp_path):
    tok = build_tokenizer("bert", str(tmp_path / "nope"), max_length=8,
                          vocab_size=64)
    enc = tok(["x y z"])
    assert enc["ids"].max() < 64
