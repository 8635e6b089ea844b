"""Sentence-aware text chunking with a UTF-8 byte budget.

Behavior parity with reference `src/f5_tts/infer/utils_infer.py:70-97` (`chunk_text`):
split on ASCII sentence punctuation followed by whitespace, or CJK/Vietnamese
full-width punctuation, then greedily pack sentences into chunks whose UTF-8 byte
length stays within ``max_chars``. A trailing single-byte sentence gets a joining
space appended before packing.
"""

from __future__ import annotations

import re

_SPLIT_RE = re.compile(r"(?<=[;:,.!?])\s+|(?<=[；：，。！？])")


def chunk_text(text: str, max_chars: int = 135) -> list[str]:
    chunks: list[str] = []
    current = ""
    for sentence in _SPLIT_RE.split(text):
        piece = sentence + " " if sentence and len(sentence[-1].encode("utf-8")) == 1 else sentence
        if len(current.encode("utf-8")) + len(sentence.encode("utf-8")) <= max_chars:
            current += piece
        else:
            if current:
                chunks.append(current.strip())
            current = piece
    if current:
        chunks.append(current.strip())
    return chunks
