"""Tokenizer backends: hashing (native C++ vs Python bit-parity), WordPiece
(native vs pure-Python vs Rust), shapes and special-token layout."""

import os

import numpy as np
import pytest

from socialmedia_textimage_classification_auxlosses_tpu.data import native
from socialmedia_textimage_classification_auxlosses_tpu.data.tokenizers import (
    HashTokenizer, PyWordPiece, build_tokenizer,
)

TEXTS = ["hello world", "a b c d e f g", "", "repeated repeated tokens tokens"]


def test_hash_tokenizer_shapes_and_layout():
    tok = HashTokenizer(vocab_size=1000, max_length=8, use_token_types=True)
    ids, mask, tt = tok.encode_batch(TEXTS)
    assert ids.shape == (4, 8) and mask.shape == (4, 8) and tt.shape == (4, 8)
    assert ids[0, 0] == tok.cls_id
    assert ids[0, 3] == tok.sep_id
    assert mask[0].sum() == 4  # cls + 2 tokens + sep
    # empty text -> cls + sep only
    assert mask[2].sum() == 2
    # deterministic: same token, same id
    assert ids[3, 1] == ids[3, 2] and ids[3, 3] == ids[3, 4]


def test_hash_tokenizer_truncation():
    tok = HashTokenizer(vocab_size=1000, max_length=5, use_token_types=False)
    ids, mask, _ = tok.encode_batch(["one two three four five six"])
    assert mask[0].sum() == 5
    assert ids[0, 4] == tok.sep_id


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_native_hash_matches_python():
    tok = HashTokenizer(vocab_size=1000, max_length=10, use_token_types=False)
    ids_nat, mask_nat, _ = tok.encode_batch(TEXTS)
    # force python fallback
    out = []
    for text in TEXTS:
        toks = [tok._token_id(t) for t in text.split()][:8]
        row = [tok.cls_id] + toks + [tok.sep_id]
        ids = np.full(10, tok.pad_id, np.int32)
        ids[: len(row)] = row
        out.append(ids)
    np.testing.assert_array_equal(ids_nat, np.stack(out))


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "un", "##want",
         "##ed", "runn", "##ing", ",", "!"]


@pytest.fixture
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_py_wordpiece(vocab_file):
    tok = PyWordPiece(vocab_file, max_length=10, use_token_types=True)
    ids, mask, tt = tok.encode_batch(["hello unwanted running!"])
    v = {t: i for i, t in enumerate(VOCAB)}
    expect = [v["[CLS]"], v["hello"], v["un"], v["##want"], v["##ed"],
              v["runn"], v["##ing"], v["!"], v["[SEP]"]]
    assert ids[0, : len(expect)].tolist() == expect


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_native_wordpiece_matches_python(vocab_file):
    from socialmedia_textimage_classification_auxlosses_tpu.data.native import (
        NativeWordPiece,
    )

    texts = ["hello unwanted running!", "WORLD, hello", "zzz unknown"]
    nat = NativeWordPiece(vocab_file, 12, True)
    py = PyWordPiece(vocab_file, 12, True)
    ids_n, mask_n, _ = nat.encode_batch(texts)
    ids_p, mask_p, _ = py.encode_batch(texts)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_build_tokenizer_vocab_txt_path(tmp_path, vocab_file):
    import shutil

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    shutil.copy(vocab_file, model_dir / "vocab.txt")
    tok = build_tokenizer("bert", str(model_dir), max_length=10, vocab_size=100,
                          normalize=False)
    enc = tok(["hello world"])
    v = {t: i for i, t in enumerate(VOCAB)}
    assert enc["ids"][0, 1] == v["hello"]
    assert "token_type_ids" in enc


def test_build_tokenizer_hash_fallback():
    tok = build_tokenizer("bernice", None, max_length=10, vocab_size=500)
    enc = tok(["@user check https://t.co/x"])
    # normalization applied before hashing: @USER token present consistently
    tok2 = build_tokenizer("bernice", None, max_length=10, vocab_size=500)
    enc2 = tok2(["@other_user check https://t.co/y"])
    assert enc["ids"][0, 1] == enc2["ids"][0, 1]  # both -> @USER
    assert "token_type_ids" not in enc  # bernice: no token types
