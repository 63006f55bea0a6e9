"""BPE tokenizer backends for the two headline text models whose dirs ship
no ``tokenizer.json``:

* ``SentencePieceBPE`` — Bernice/XLM-R layout: a ``sentencepiece.bpe.model``
  protobuf (the reference loads it through ``AutoTokenizer``,
  reference mm_late.py:321, text_only.py:83-86). The ``sentencepiece``
  package is not installable here, so the ModelProto is parsed with the
  protobuf schema transformers vendors, and encoding re-implements
  SentencePiece's BPE merge loop (greedy highest-score adjacent merge).
  Ids use the fairseq alignment of ``XLMRobertaTokenizer``:
  ``{<s>:0, <pad>:1, </s>:2, <unk>:3}`` then ``sp_id + 1``.

* ``FastBPE`` — BERTweet layout: fairseq-style ``vocab.txt`` (token + count
  per line) + ``bpe.codes`` merges with ``</w>`` end-of-word markers and
  ``@@`` continuation suffixes. Semantics match
  ``transformers.BertweetTokenizer`` (parity-tested in
  tests/test_rust_tokenizer_paths.py); ids are ``{<s>:0, <pad>:1, </s>:2,
  <unk>:3}`` then vocab order.

Both emit the framework's fixed-shape (ids, mask, token_type_ids?) triple
with the RoBERTa-style ``<s> x </s>`` layout and no token types
(reference datasets.py:53-55).
"""

from __future__ import annotations

import os
import unicodedata
from typing import List, Optional

import numpy as np

SPM_NORMAL = 1
SPM_UNKNOWN = 2
SPM_CONTROL = 3


def _read_spm_pieces(model_path: str):
    """Parse a sentencepiece ModelProto -> [(piece, score, type)]."""
    from transformers.utils import sentencepiece_model_pb2_new as pb2

    proto = pb2.ModelProto()
    with open(model_path, "rb") as f:
        proto.ParseFromString(f.read())
    return [(p.piece, p.score, p.type) for p in proto.pieces]


class SentencePieceBPE:
    """SentencePiece-BPE encoder over a parsed ModelProto (XLM-R family).

    The merge loop runs in C++ when the native library is available
    (csrc/tokenizer.cpp ``spbpe_*``, bit-parity tested in
    tests/test_native_bpe.py); normalization and the ``▁`` marker stay
    Python-side either way."""

    def __init__(self, model_path: str, max_length: int,
                 use_token_types: bool = False, use_native: bool = True):
        pieces = _read_spm_pieces(model_path)
        self.scores = {}
        self.sp_ids = {}
        for i, (piece, score, typ) in enumerate(pieces):
            self.sp_ids[piece] = i
            if typ == SPM_NORMAL:
                self.scores[piece] = score
        self.max_length = max_length
        self.use_token_types = use_token_types
        # fairseq alignment (XLMRobertaTokenizer): sp ids shift by +1,
        # specials pinned.
        self.bos_id, self.pad_token_id, self.eos_id, self.unk_id = 0, 1, 2, 3
        self.offset = 1
        self._native = None
        if use_native:
            try:
                from .native import NativeSpBpe

                self._native = NativeSpBpe(
                    [p for p, _, _ in pieces],
                    np.array([s for _, s, _ in pieces], np.float32),
                    np.array([t == SPM_NORMAL for _, _, t in pieces], np.uint8),
                )
            except Exception:
                self._native = None

    # -- sentencepiece text pipeline -----------------------------------------

    def _normalize(self, text: str) -> str:
        # Approximation of the nmt_nfkc normalizer: NFKC + control chars to
        # space + collapse runs of whitespace (exact charsmap not vendored;
        # tweet text is already normalized upstream, data/normalize.py).
        text = unicodedata.normalize("NFKC", text)
        out = []
        for ch in text:
            if ch in ("\t", "\n", "\r") or unicodedata.category(ch) in ("Cc", "Cf"):
                ch = " "
            out.append(ch)
        return " ".join("".join(out).split())

    def _bpe(self, text: str) -> List[str]:
        """Greedy highest-score adjacent merge (sentencepiece bpe_model.cc)."""
        symbols = list(text)
        if not symbols:
            return []
        while True:
            best_score, best_i = None, -1
            for i in range(len(symbols) - 1):
                merged = symbols[i] + symbols[i + 1]
                s = self.scores.get(merged)
                if s is not None and (best_score is None or s > best_score):
                    best_score, best_i = s, i
            if best_i < 0:
                break
            symbols[best_i:best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
        return symbols

    def tokenize(self, text: str) -> List[str]:
        text = self._normalize(text)
        if not text:
            return []
        text = "▁" + text.replace(" ", "▁")  # dummy prefix + marker
        return self._bpe(text)

    def _token_id(self, token: str) -> int:
        sp = self.sp_ids.get(token)
        if sp is None or sp == 0:  # absent or the sp-level <unk>
            return self.unk_id
        return sp + self.offset

    def _marked(self, text: str) -> str:
        text = self._normalize(str(text))
        return ("▁" + text.replace(" ", "▁")) if text else ""

    def encode_batch(self, texts: List[str]):
        n, L = len(texts), self.max_length
        if self._native is not None:
            ids, mask = self._native.encode_batch(
                [self._marked(t) for t in texts], L)
            tt = np.zeros((n, L), np.int32) if self.use_token_types else None
            return ids, mask, tt
        ids = np.full((n, L), self.pad_token_id, np.int32)
        mask = np.zeros((n, L), np.int32)
        for i, text in enumerate(texts):
            toks = [self._token_id(t) for t in self.tokenize(str(text))]
            row = [self.bos_id] + toks[: L - 2] + [self.eos_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        tt = np.zeros((n, L), np.int32) if self.use_token_types else None
        return ids, mask, tt


class FastBPE:
    """fastBPE encoder over BERTweet's vocab.txt + bpe.codes.

    Encoding runs in C++ when the native library is available
    (csrc/tokenizer.cpp ``fastbpe_*``, bit-parity tested in
    tests/test_native_bpe.py)."""

    def __init__(self, vocab_path: str, merges_path: str, max_length: int,
                 use_token_types: bool = False, use_native: bool = True):
        self._native = None
        if use_native:
            try:
                from .native import NativeFastBpe

                self._native = NativeFastBpe(vocab_path, merges_path)
            except Exception:
                self._native = None
        self.encoder = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3}
        with open(vocab_path, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                idx = line.rfind(" ")
                if idx == -1:
                    raise ValueError(
                        f"bad fairseq vocab line (expected '<token> <cnt>'): {line!r}")
                self.encoder[line[:idx]] = len(self.encoder)
        with open(merges_path, encoding="utf-8") as f:
            merges = f.read().split("\n")[:-1]
        # bpe.codes lines are "left right count"; rank = line order
        self.bpe_ranks = {tuple(m.split()[:-1]): r for r, m in enumerate(merges)}
        self.cache = {}
        self.max_length = max_length
        self.use_token_types = use_token_types
        self.bos_id, self.pad_token_id, self.eos_id, self.unk_id = 0, 1, 2, 3

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token)
        word = tuple(list(word[:-1]) + [word[-1] + "</w>"])
        pairs = {(a, b) for a, b in zip(word, word[1:])}
        if not pairs:
            return token  # single-char quirk preserved (BertweetTokenizer.bpe)
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
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = {(a, b) for a, b in zip(word, word[1:])}
        out = "@@ ".join(word)[:-4]  # drop the trailing </w>
        self.cache[token] = out
        return out

    def tokenize(self, text: str) -> List[str]:
        toks: List[str] = []
        for word in str(text).split():
            toks.extend(self._bpe(word).split(" "))
        return toks

    def encode_batch(self, texts: List[str]):
        n, L = len(texts), self.max_length
        if self._native is not None:
            ids, mask = self._native.encode_batch(texts, L)
            tt = np.zeros((n, L), np.int32) if self.use_token_types else None
            return ids, mask, tt
        ids = np.full((n, L), self.pad_token_id, np.int32)
        mask = np.zeros((n, L), np.int32)
        for i, text in enumerate(texts):
            toks = [self.encoder.get(t, self.unk_id) for t in self.tokenize(text)]
            row = [self.bos_id] + toks[: L - 2] + [self.eos_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        tt = np.zeros((n, L), np.int32) if self.use_token_types else None
        return ids, mask, tt


def try_sp_bpe(model_dir: str, max_length: int,
               use_token_types: bool) -> Optional[SentencePieceBPE]:
    path = os.path.join(model_dir, "sentencepiece.bpe.model")
    if not os.path.isfile(path):
        return None
    return SentencePieceBPE(path, max_length, use_token_types)


def try_fast_bpe(model_dir: str, max_length: int,
                 use_token_types: bool) -> Optional[FastBPE]:
    merges = os.path.join(model_dir, "bpe.codes")
    vocab = os.path.join(model_dir, "vocab.txt")
    if not (os.path.isfile(merges) and os.path.isfile(vocab)):
        return None
    return FastBPE(vocab, merges, max_length, use_token_types)
