"""Host-side tokenization feeding fixed-shape device buffers (SURVEY.md
section 2.2: "tokenizers lib retained host-side; padding/truncation layout is
ours").

The reference calls ``tokenizer.encode_plus`` per *sample*, per *epoch*
(reference ``datasets.py:38-47``). Here tokenization is vectorised once per
split into padded ``(N, max_length)`` int32 arrays and cached — the XLA step
never sees a ragged shape.

Backends, in order of preference per model dir:
  1. ``tokenizer.json``            -> HF tokenizers (Rust) fast tokenizer
  2. ``sentencepiece.bpe.model``   -> vendored SentencePiece-BPE decoder
                                      (Bernice/XLM-R layout, data/bpe_backends.py)
  3. ``bpe.codes``+``vocab.txt``   -> fastBPE (BERTweet layout,
                                      data/bpe_backends.py)
  4. ``vocab.txt``                 -> Rust BertWordPiece; else our C++
                                      WordPiece (csrc/tokenizer.cpp via
                                      ctypes); else pure-Python WordPiece
  5. ``vocab.json``+``merges.txt`` -> Rust byte-level BPE (RoBERTa layout)
  6. none (fully offline)          -> deterministic FNV-1a hashing tokenizer
                                      (C++ when built, bit-identical Python
                                      fallback) — engaged with a LOUD warning

Every backend emits the same triple (ids, attention_mask, token_type_ids?)
with the family's special-token layout (BERT: [CLS] x [SEP]; RoBERTa-likes:
<s> x </s> and no token types — reference datasets.py:53-55).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..utils.logging import get_logger
from .normalize import TweetNormalizer

logger = get_logger(__name__)


class BatchEncoding(dict):
    @property
    def ids(self):
        return self["ids"]


class HashTokenizer:
    """Deterministic offline tokenizer: whitespace tokens FNV-1a-hashed into
    the vocab range. Exists so every pipeline/CLI path runs hermetically (no
    downloaded vocabs); swaps out transparently when a real vocab is present.
    Encoding runs in the native C++ library when built (``data/native.py``),
    with a bit-identical Python fallback.
    """

    def __init__(self, vocab_size: int, max_length: int, use_token_types: bool,
                 pad_id=0, unk_id=1, cls_id=2, sep_id=3):
        self.vocab_size = vocab_size
        self.max_length = max_length
        self.use_token_types = use_token_types
        self.pad_id, self.unk_id, self.cls_id, self.sep_id = pad_id, unk_id, cls_id, sep_id
        self.pad_token_id = pad_id

    def _token_id(self, token: str) -> int:
        from .native import fnv1a

        return 4 + fnv1a(token) % (self.vocab_size - 4)

    def encode_batch(self, texts: List[str]):
        texts = [str(t) for t in texts]
        from . import native

        out = native.hash_encode_batch(texts, self.max_length, self.vocab_size,
                                       self.pad_id, self.cls_id, self.sep_id)
        if out is not None:
            ids, mask = out
            tt = (np.zeros((len(texts), self.max_length), np.int32)
                  if self.use_token_types else None)
            return ids, mask, tt
        n, L = len(texts), self.max_length
        ids = np.full((n, L), self.pad_id, np.int32)
        mask = np.zeros((n, L), np.int32)
        for i, text in enumerate(texts):
            toks = [self._token_id(t) for t in text.split()][: L - 2]
            row = [self.cls_id] + toks + [self.sep_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        tt = np.zeros((n, L), np.int32) if self.use_token_types else None
        return ids, mask, tt


class RustTokenizer:
    """HF `tokenizers` (Rust) backend with our fixed-shape padding layout."""

    def __init__(self, tok, max_length: int, use_token_types: bool, pad_id: int):
        self.tok = tok
        self.max_length = max_length
        self.use_token_types = use_token_types
        self.pad_token_id = pad_id
        tok.enable_truncation(max_length)
        tok.enable_padding(length=max_length, pad_id=pad_id, pad_token="[PAD]")

    def encode_batch(self, texts: List[str]):
        encs = self.tok.encode_batch([str(t) for t in texts])
        ids = np.asarray([e.ids for e in encs], np.int32)
        mask = np.asarray([e.attention_mask for e in encs], np.int32)
        tt = (
            np.asarray([e.type_ids for e in encs], np.int32)
            if self.use_token_types else None
        )
        return ids, mask, tt


def _try_rust_backend(model_dir: str, max_length: int, use_token_types: bool):
    try:
        return _rust_backend(model_dir, max_length, use_token_types)
    except Exception:
        return None


def _ensure_bert_postprocessor(tok):
    """Attach a [CLS] ... [SEP] template when the serialized tokenizer has no
    post-processor (real HF tokenizer.json files include one; tokenizers-lib
    BertWordPieceTokenizer does not)."""
    if tok.post_processor is not None:
        return tok
    cls_id, sep_id = tok.token_to_id("[CLS]"), tok.token_to_id("[SEP]")
    if cls_id is None or sep_id is None:
        return tok
    from tokenizers.processors import TemplateProcessing

    tok.post_processor = TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B:1 [SEP]:1",
        special_tokens=[("[CLS]", cls_id), ("[SEP]", sep_id)],
    )
    return tok


def _rust_backend(model_dir: str, max_length: int, use_token_types: bool):
    import tokenizers

    tj = os.path.join(model_dir, "tokenizer.json")
    if os.path.isfile(tj):
        tok = tokenizers.Tokenizer.from_file(tj)
        tok = _ensure_bert_postprocessor(tok)
        pad_id = tok.token_to_id("[PAD]")
        if pad_id is None:
            pad_id = tok.token_to_id("<pad>") or 0
        return RustTokenizer(tok, max_length, use_token_types, pad_id)
    vt = os.path.join(model_dir, "vocab.txt")
    if os.path.isfile(vt):
        from tokenizers import BertWordPieceTokenizer

        tok = BertWordPieceTokenizer(vt, lowercase=True)
        inner = _ensure_bert_postprocessor(tok._tokenizer)
        return RustTokenizer(inner, max_length, use_token_types,
                             tok.token_to_id("[PAD]") or 0)
    vj = os.path.join(model_dir, "vocab.json")
    mg = os.path.join(model_dir, "merges.txt")
    if os.path.isfile(vj) and os.path.isfile(mg):
        from tokenizers import ByteLevelBPETokenizer
        from tokenizers.processors import RobertaProcessing

        tok = ByteLevelBPETokenizer(vj, mg)
        tok._tokenizer.post_processor = RobertaProcessing(
            sep=("</s>", tok.token_to_id("</s>")), cls=("<s>", tok.token_to_id("<s>"))
        )
        inner = tok._tokenizer
        pad = tok.token_to_id("<pad>") or 1
        rt = RustTokenizer.__new__(RustTokenizer)
        rt.tok = inner
        rt.max_length = max_length
        rt.use_token_types = use_token_types
        rt.pad_token_id = pad
        inner.enable_truncation(max_length)
        inner.enable_padding(length=max_length, pad_id=pad, pad_token="<pad>")
        return rt
    return None


class TweetTokenizerFrontend:
    """Normalization + tokenization + caching facade used by the pipeline.

    ``normalize=True`` applies the BERTweet tweet normalization exactly where
    the reference does (reference datasets.py:36,161).
    """

    def __init__(self, backend, normalize: bool = True):
        self.backend = backend
        self.normalizer = TweetNormalizer() if normalize else None
        self.max_length = backend.max_length
        self.pad_token_id = backend.pad_token_id
        self.use_token_types = backend.use_token_types

    def __call__(self, texts) -> BatchEncoding:
        texts = [str(t) for t in texts]
        if self.normalizer is not None:
            texts = [self.normalizer.normalize(t) for t in texts]
        ids, mask, tt = self.backend.encode_batch(texts)
        out = BatchEncoding(ids=ids, mask=mask)
        if tt is not None:
            out["token_type_ids"] = tt
        return out


class PyWordPiece:
    """Pure-Python greedy WordPiece over a BERT-layout vocab.txt (last-resort
    fallback; same algorithm as the native/Rust paths)."""

    def __init__(self, vocab_path: str, max_length: int, use_token_types: bool):
        with open(vocab_path) as f:
            self.vocab = {line.rstrip("\r\n"): i for i, line in enumerate(f)}
        self.max_length = max_length
        self.use_token_types = use_token_types
        self.unk = self.vocab.get("[UNK]", 100)
        self.cls = self.vocab.get("[CLS]", 101)
        self.sep = self.vocab.get("[SEP]", 102)
        self.pad_token_id = self.vocab.get("[PAD]", 0)

    def _word(self, word: str):
        if len(word) > 100:
            return [self.unk]
        pieces, start = [], 0
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
            pieces.append(cur)
            start = end
        return pieces

    def encode_batch(self, texts: List[str]):
        import re as _re

        n, L = len(texts), self.max_length
        ids = np.full((n, L), self.pad_token_id, np.int32)
        mask = np.zeros((n, L), np.int32)
        for i, text in enumerate(texts):
            words = _re.findall(r"\w+|[^\w\s]", str(text).lower())
            toks: List[int] = []
            for w in words:
                toks.extend(self._word(w))
            row = [self.cls] + toks[: L - 2] + [self.sep]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        tt = np.zeros((n, L), np.int32) if self.use_token_types else None
        return ids, mask, tt


def _try_wordpiece_backends(model_dir, max_length, use_tt):
    vt = os.path.join(model_dir, "vocab.txt")
    if not os.path.isfile(vt):
        return None
    try:
        from .native import NativeWordPiece

        return NativeWordPiece(vt, max_length, use_tt)
    except Exception:
        return PyWordPiece(vt, max_length, use_tt)


def build_tokenizer(
    model_name: str,
    model_dir: Optional[str],
    max_length: int,
    vocab_size: int,
    normalize: bool = True,
) -> TweetTokenizerFrontend:
    from ..models.text import NO_TOKEN_TYPES

    use_tt = model_name not in NO_TOKEN_TYPES
    backend = None
    if model_dir and os.path.isdir(model_dir):
        from .bpe_backends import try_fast_bpe, try_sp_bpe

        # tokenizer.json wins; then the family-specific BPE layouts, which
        # must be probed BEFORE plain vocab.txt (BERTweet's fairseq vocab.txt
        # would be mis-parsed as WordPiece).
        if os.path.isfile(os.path.join(model_dir, "tokenizer.json")):
            backend = _try_rust_backend(model_dir, max_length, use_tt)
        if backend is None:
            backend = try_sp_bpe(model_dir, max_length, use_tt)
        if backend is None:
            backend = try_fast_bpe(model_dir, max_length, use_tt)
        if backend is None:
            backend = _try_rust_backend(model_dir, max_length, use_tt)
        if backend is None:
            backend = _try_wordpiece_backends(model_dir, max_length, use_tt)
        if backend is None:
            logger.warning(
                "build_tokenizer(%s): model dir %r has no recognizable "
                "tokenizer layout (tokenizer.json / sentencepiece.bpe.model / "
                "bpe.codes+vocab.txt / vocab.txt / vocab.json+merges.txt) — "
                "FALLING BACK TO THE HASHING TOKENIZER. Token ids will NOT "
                "match the pretrained model's vocabulary.",
                model_name, model_dir)
    if backend is None:
        if model_dir:
            logger.warning(
                "build_tokenizer(%s): model dir %r not found — using the "
                "hashing tokenizer (hermetic mode).", model_name, model_dir)
        backend = HashTokenizer(vocab_size, max_length, use_tt)
    else:
        logger.info("build_tokenizer(%s): backend %s", model_name,
                    type(backend).__name__)
    return TweetTokenizerFrontend(backend, normalize=normalize)
