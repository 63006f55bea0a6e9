"""ctypes bindings + lazy build for the native host tokenizer
(``csrc/tokenizer.cpp``) — the framework's C++ equivalent of the Rust
tokenizers the reference leans on (SURVEY.md section 2.2).

The shared library is compiled on first use (g++, ~1s) and cached next to the
source; every caller falls back to the pure-Python implementations if the
toolchain is unavailable, so nothing hard-depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from ..utils.logging import get_logger

logger = get_logger(__name__)

_CSRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "csrc",
)
_LIB_PATH = os.path.join(_CSRC, "libsmtc_tokenizer.so")
_lib = None
_build_failed = False


def _build() -> bool:
    src = os.path.join(_CSRC, "tokenizer.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # toolchain missing / sandboxed
        logger.info("native tokenizer build failed (%s); using Python path", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.isfile(_LIB_PATH) or (
        os.path.isfile(os.path.join(_CSRC, "tokenizer.cpp"))
        and os.path.getmtime(os.path.join(_CSRC, "tokenizer.cpp"))
        > os.path.getmtime(_LIB_PATH)
    ):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _build_failed = True
        return None
    lib.hash_encode_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.wp_load.restype = ctypes.c_void_p
    lib.wp_load.argtypes = [ctypes.c_char_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    lib.wp_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.spbpe_load.restype = ctypes.c_void_p
    lib.spbpe_load.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
    ]
    lib.spbpe_free.argtypes = [ctypes.c_void_p]
    lib.spbpe_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.fastbpe_load.restype = ctypes.c_void_p
    lib.fastbpe_load.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.fastbpe_free.argtypes = [ctypes.c_void_p]
    lib.fastbpe_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def _pack(texts: List[str]) -> Tuple[bytes, np.ndarray]:
    enc = [t.encode("utf-8") for t in texts]
    offsets = np.zeros(len(enc) + 1, np.int64)
    for i, b in enumerate(enc):
        offsets[i + 1] = offsets[i] + len(b)
    return b"".join(enc), offsets


def hash_encode_batch(texts: List[str], max_len: int, vocab_size: int,
                      pad_id: int, cls_id: int, sep_id: int):
    lib = get_lib()
    if lib is None:
        return None
    buf, offsets = _pack(texts)
    n = len(texts)
    ids = np.empty((n, max_len), np.int32)
    mask = np.empty((n, max_len), np.int32)
    lib.hash_encode_batch(
        buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        max_len, vocab_size, pad_id, cls_id, sep_id,
        ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return ids, mask


def fnv1a(token: str) -> int:
    """Python mirror of the C++ FNV-1a (used when the library is absent)."""
    h = 2166136261
    for b in token.encode("utf-8"):
        h = ((h ^ b) * 16777619) & 0xFFFFFFFF
    return h


class NativeSpBpe:
    """C++ SentencePiece-BPE merge loop (Bernice/XLM-R). The ModelProto is
    parsed by the caller (data/bpe_backends.py); pieces+scores arrive here as
    flat arrays. Texts passed to ``encode_batch`` must be pre-normalized with
    the ``▁`` word markers applied — bit-parity with the Python
    ``SentencePieceBPE`` is tested in tests/test_native_bpe.py."""

    def __init__(self, pieces: List[str], scores, is_normal):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib = lib
        buf, offsets = _pack(pieces)
        scores = np.ascontiguousarray(scores, np.float32)
        is_normal = np.ascontiguousarray(is_normal, np.uint8)
        self._handle = lib.spbpe_load(
            buf, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            is_normal.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            len(pieces),
        )
        if not self._handle:
            raise RuntimeError("spbpe_load failed")

    def encode_batch(self, marked_texts: List[str], max_length: int):
        buf, offsets = _pack(marked_texts)
        n = len(marked_texts)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        self._lib.spbpe_encode_batch(
            self._handle, buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return ids, mask

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.spbpe_free(self._handle)
        except Exception:
            pass


class NativeFastBpe:
    """C++ fastBPE encoder (BERTweet: fairseq vocab.txt + bpe.codes)."""

    def __init__(self, vocab_path: str, codes_path: str):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib = lib
        self._handle = lib.fastbpe_load(vocab_path.encode(),
                                        codes_path.encode())
        if not self._handle:
            raise RuntimeError(
                f"fastbpe_load failed ({vocab_path}, {codes_path})")

    def encode_batch(self, texts: List[str], max_length: int):
        buf, offsets = _pack([str(t) for t in texts])
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        self._lib.fastbpe_encode_batch(
            self._handle, buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return ids, mask

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.fastbpe_free(self._handle)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Native image decoder (csrc/imgdec.cpp): JPEG/PNG decode + PIL-convention
# triangle resize in one C++ call, with libjpeg DCT scaling on downscale.
# Separate shared object because it links -ljpeg -lpng; if those dev libs are
# absent the build fails quietly and callers keep the PIL path.
# ---------------------------------------------------------------------------

def _host_cpu_tag() -> str:
    """Stable tag for the *build host's* CPU ISA.

    The imgdec library is compiled with ``-march=native``, so a cached .so is
    only valid on a CPU with the same feature set. On multi-host pod runs off
    a shared checkout (``obj_features --shard``) each host must build and load
    its own binary — keying the filename on the CPU flags makes a stale
    foreign binary a cache miss instead of a SIGILL.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = line
                    break
    except OSError:
        pass
    h = hashlib.sha1(feats.encode()).hexdigest()[:8]
    return f"{platform.machine()}-{h}"


_IMGDEC_LIB_PATH = os.path.join(_CSRC, f"libsmtc_imgdec.{_host_cpu_tag()}.so")
_imgdec_lib = None
_imgdec_failed = False


def _build_imgdec() -> bool:
    src = os.path.join(_CSRC, "imgdec.cpp")
    if not os.path.isfile(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", src, "-o", _IMGDEC_LIB_PATH, "-ljpeg", "-lpng"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # toolchain or libjpeg/libpng headers missing
        logger.info("native imgdec build failed (%s); using PIL path", e)
        return False


def get_imgdec_lib() -> Optional[ctypes.CDLL]:
    global _imgdec_lib, _imgdec_failed
    if _imgdec_lib is not None:
        return _imgdec_lib
    if _imgdec_failed:
        return None
    src = os.path.join(_CSRC, "imgdec.cpp")
    if not os.path.isfile(_IMGDEC_LIB_PATH) or (
        os.path.isfile(src)
        and os.path.getmtime(src) > os.path.getmtime(_IMGDEC_LIB_PATH)
    ):
        if not _build_imgdec():
            _imgdec_failed = True
            return None
    try:
        lib = ctypes.CDLL(_IMGDEC_LIB_PATH)
    except OSError:
        _imgdec_failed = True
        return None
    lib.smtc_decode_resize.restype = ctypes.c_int
    lib.smtc_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.smtc_decode_full.restype = ctypes.c_int
    lib.smtc_decode_full.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.smtc_decode_resize_mem.restype = ctypes.c_int
    lib.smtc_decode_resize_mem.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _imgdec_lib = lib
    return _imgdec_lib


def imgdec_available() -> bool:
    return get_imgdec_lib() is not None


def native_decode_resize(path: str, size: int) -> Optional[np.ndarray]:
    """Decode (JPEG/PNG sniffed by signature) + resize to (size, size, 3)
    uint8. None on any failure — the caller falls back to PIL."""
    lib = get_imgdec_lib()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.smtc_decode_resize(
        os.fsencode(path), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def native_decode_resize_mem(data: bytes, size: int) -> Optional[np.ndarray]:
    """In-memory decode (JPEG/PNG sniffed by signature) + resize to
    (size, size, 3) uint8 — the serving request path (image_b64 bytes,
    no file). None on any failure — the caller falls back to PIL."""
    lib = get_imgdec_lib()
    if lib is None or not data:
        return None
    out = np.empty((size, size, 3), np.uint8)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    rc = lib.smtc_decode_resize_mem(
        ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(len(data)), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def native_decode_full(path: str,
                       max_pixels: int = 64 << 20) -> Optional[np.ndarray]:
    """Full-scale decode to (h, w, 3) uint8 (parity tests)."""
    lib = get_imgdec_lib()
    if lib is None:
        return None
    cap = max_pixels * 3
    buf = np.empty(cap, np.uint8)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    rc = lib.smtc_decode_full(
        os.fsencode(path),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


class NativeWordPiece:
    """C++ WordPiece encoder over a BERT-layout vocab.txt."""

    def __init__(self, vocab_path: str, max_length: int, use_token_types: bool):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib = lib
        self._handle = lib.wp_load(vocab_path.encode())
        if not self._handle:
            raise RuntimeError(f"cannot load vocab {vocab_path}")
        self.max_length = max_length
        self.use_token_types = use_token_types
        self.pad_token_id = 0

    def encode_batch(self, texts: List[str]):
        buf, offsets = _pack([str(t) for t in texts])
        n = len(texts)
        ids = np.empty((n, self.max_length), np.int32)
        mask = np.empty((n, self.max_length), np.int32)
        tts = np.zeros((n, self.max_length), np.int32) if self.use_token_types else None
        self._lib.wp_encode_batch(
            self._handle, buf,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
            self.max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            tts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) if tts is not None
            else None,
        )
        return ids, mask, tts

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass
