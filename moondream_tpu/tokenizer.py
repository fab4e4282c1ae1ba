"""Tokenizer loading.

The reference loads the HF "moondream/starmie-v1" tokenizer from the hub at
model construction (/root/reference/moondream/torch/moondream.py:89). This
module keeps that capability (any HF tokenizers-compatible tokenizer.json,
from a local path or the hub when reachable) and adds a self-contained
byte-level fallback so the framework runs fully offline (tests, smoke runs,
air-gapped deployments).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence


class TokenizerBase:
    def encode(self, text: str) -> List[int]:
        raise NotImplementedError

    def decode(self, ids: Sequence[int]) -> str:
        raise NotImplementedError


class HFTokenizer(TokenizerBase):
    """Wrapper over the HF `tokenizers` Rust library."""

    def __init__(self, tok):
        self._tok = tok

    @classmethod
    def from_file(cls, path: str) -> "HFTokenizer":
        from tokenizers import Tokenizer

        return cls(Tokenizer.from_file(path))

    @classmethod
    def from_pretrained(cls, name: str) -> "HFTokenizer":
        from tokenizers import Tokenizer

        return cls(Tokenizer.from_pretrained(name))

    def encode(self, text: str) -> List[int]:
        return self._tok.encode(text).ids

    def decode(self, ids: Sequence[int]) -> str:
        return self._tok.decode(list(ids))


class ByteTokenizer(TokenizerBase):
    """Deterministic, reversible byte-level tokenizer for offline use.

    Token id = byte value + `offset`, keeping ids 0..offset-1 free for the
    special tokens the prompt templates use (TokenizerConfig ids 0-9 /
    template word ids). Not a linguistic tokenizer — a harness so every code
    path (encode/decode/streaming/grounding) is exercisable without hub
    access.
    """

    def __init__(self, offset: int = 256):
        self.offset = offset

    def encode(self, text: str) -> List[int]:
        return [b + self.offset for b in text.encode("utf-8")]

    def decode(self, ids: Sequence[int]) -> str:
        # total over any vocab: ids beyond offset+255 (possible when a
        # big-vocab model runs with random weights) fold into byte range
        data = bytes((i - self.offset) % 256 for i in ids if i >= self.offset)
        return data.decode("utf-8", errors="ignore")


def load_tokenizer(spec: Optional[str] = None) -> TokenizerBase:
    """Resolve a tokenizer:

      * explicit file path or MOONDREAM_TOKENIZER env -> tokenizer.json
      * hub name (contains "/") -> tokenizers.from_pretrained (needs network)
      * None / "byte" -> offline ByteTokenizer
    """
    spec = spec or os.environ.get("MOONDREAM_TOKENIZER")
    if spec is None or spec == "byte":
        return ByteTokenizer()
    if os.path.exists(spec):
        if os.environ.get("MOONDREAM_NATIVE_BPE"):
            # in-repo C++ byte-level BPE (native/bpe.cpp) — parity-tested
            # against the HF library; opt-in via env
            from .native_bpe import NativeBPETokenizer, available

            if available():
                try:
                    return NativeBPETokenizer.from_file(spec)
                except ValueError:
                    pass  # non-byte-level-BPE scheme: fall through to HF
        return HFTokenizer.from_file(spec)
    try:
        return HFTokenizer.from_pretrained(spec)
    except Exception:
        # Offline fallback keeps the model usable for structure-level work.
        return ByteTokenizer()
