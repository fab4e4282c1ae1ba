"""ctypes wrapper for the native C++ byte-level BPE tokenizer.

The reference tokenizes through the HF `tokenizers` Rust library
(reference moondream.py:89); `native/bpe.cpp` is the in-repo native
equivalent for byte-level-BPE tokenizers (the scheme of both moondream
tokenizer generations). This wrapper parses any compatible
tokenizer.json, undoes the GPT-2 byte<->unicode mapping, and drives the
C library. Parity with the HF library is tested on a locally trained
tokenizer (tests/test_native_bpe.py).

Limitations (documented, not silent): added/special tokens are not
split out of raw text (the framework's prompt templates are token-id
lists, so plain text never contains them), and non-byte-level BPE
schemes are rejected.
"""

from __future__ import annotations

import ctypes
import json
import os
import threading
from typing import List, Sequence

from .tokenizer import TokenizerBase

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmdbpe.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _byte_to_unicode() -> dict:
    """GPT-2's printable-byte mapping (public domain scheme): printable
    bytes map to themselves, the rest to U+0100+i in order."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAD))
        + list(range(0xAE, 0x100))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_B2U = _byte_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def _load_lib():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            import subprocess

            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR, "libmdbpe.so"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.bpe_create.restype = ctypes.c_void_p
            lib.bpe_create.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.bpe_encode.restype = ctypes.c_int32
            lib.bpe_encode.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.bpe_decode.restype = ctypes.c_int32
            lib.bpe_decode.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int32,
            ]
            lib.bpe_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load_lib() is not None


class NativeBPETokenizer(TokenizerBase):
    """Byte-level BPE over the C++ core. Build from a tokenizer.json."""

    def __init__(self, vocab: dict, merges: List, use_regex: bool = True):
        import numpy as np

        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native BPE library unavailable")
        self._lib = lib

        n = max(vocab.values()) + 1
        token_bytes = [b""] * n
        for tok_str, tid in vocab.items():
            try:
                raw = bytes(_U2B[ch] for ch in tok_str)
            except KeyError:
                # added/special tokens contain chars outside the byte
                # alphabet; they never appear in plain-text encoding
                raw = tok_str.encode("utf-8")
            token_bytes[tid] = raw

        blob = b"".join(token_bytes)
        lens = np.asarray([len(t) for t in token_bytes], np.int32)

        left = np.empty(len(merges), np.int32)
        right = np.empty(len(merges), np.int32)
        for i, m in enumerate(merges):
            a, b = m.split(" ", 1) if isinstance(m, str) else (m[0], m[1])
            left[i] = vocab[a]
            right[i] = vocab[b]

        buf = ctypes.create_string_buffer(blob, len(blob))
        self._handle = lib.bpe_create(
            buf, lens.ctypes.data, n,
            left.ctypes.data, right.ctypes.data, len(merges),
            1 if use_regex else 0,
        )
        self._np = np

    @classmethod
    def from_file(cls, path: str) -> "NativeBPETokenizer":
        with open(path) as f:
            spec = json.load(f)
        model = spec.get("model", {})
        if model.get("type") != "BPE":
            raise ValueError(f"not a BPE tokenizer: {model.get('type')}")
        pre = spec.get("pre_tokenizer") or {}
        pres = pre.get("pretokenizers", [pre]) if pre else []
        kinds = {p.get("type") for p in pres}
        if pres and "ByteLevel" not in kinds:
            raise ValueError(f"unsupported pre_tokenizer: {kinds}")
        use_regex = all(p.get("use_regex", True) for p in pres) if pres else False
        return cls(model["vocab"], model["merges"], use_regex=use_regex)

    def encode(self, text: str) -> List[int]:
        data = text.encode("utf-8")
        max_out = max(16, 2 * len(data) + 16)
        out = self._np.empty(max_out, self._np.int32)
        n = self._lib.bpe_encode(
            self._handle, data, len(data), out.ctypes.data, max_out
        )
        if n == -2:
            raise RuntimeError(
                "bpe_encode: input byte has no vocab id (tokenizer's byte "
                "alphabet is incomplete)"
            )
        if n < 0:
            raise RuntimeError("bpe_encode overflow")
        return out[:n].tolist()

    def decode(self, ids: Sequence[int]) -> str:
        arr = self._np.asarray(list(ids), self._np.int32)
        max_out = max(16, 8 * len(arr) + 16)
        buf = ctypes.create_string_buffer(max_out)
        n = self._lib.bpe_decode(
            self._handle, arr.ctypes.data, len(arr), buf, max_out
        )
        if n < 0:
            raise RuntimeError("bpe_decode overflow")
        return buf.raw[:n].decode("utf-8", errors="replace")

    def __del__(self):
        try:
            self._lib.bpe_destroy(self._handle)
        except Exception:
            pass
