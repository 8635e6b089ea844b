"""Vietnamese phonemization + phoneme-index mapping.

Parity with reference `src/f5_tts/model/alignment_utils.py:10-102`: prefers
``viphoneme`` (vi2IPA), then espeak ``phonemizer``, falling back to character-level
"phonemes" — the fallback keeps the whole duration/alignment pipeline functional in
dependency-free environments (this is also what the reference does when its optional
imports fail).

``phoneme_to_indices`` grows the map dynamically: index 0 is reserved for padding,
unseen phonemes get the next free index.
"""

from __future__ import annotations

try:  # optional
    from viphoneme import vi2IPA

    _HAS_VIPHONEME = True
except ImportError:  # pragma: no cover
    _HAS_VIPHONEME = False

try:  # optional
    from phonemizer import phonemize as _espeak_phonemize

    _HAS_ESPEAK = True
except ImportError:  # pragma: no cover
    _HAS_ESPEAK = False


def phonemize(text: str, language: str = "vi") -> list[str]:
    """Text -> phoneme token list."""
    if _HAS_VIPHONEME and language == "vi":
        ipa = vi2IPA(text)
        return [p for p in ipa.split() if p]
    if _HAS_ESPEAK:
        out = _espeak_phonemize(text, language=language, backend="espeak", strip=True)
        return [p for p in out.split() if p]
    # character fallback: each non-space character is one token
    return [c for c in text if not c.isspace()]


def phoneme_to_indices(
    phonemes: list[str], phoneme_map: dict[str, int], grow: bool = True
) -> list[int]:
    """Phonemes -> int ids; 0 = pad. Grows the map for unseen phonemes when allowed."""
    ids = []
    for p in phonemes:
        if p not in phoneme_map:
            if not grow:
                continue
            phoneme_map[p] = len(phoneme_map) + 1  # 0 reserved for padding
        ids.append(phoneme_map[p])
    return ids


def text_to_phoneme_indices(
    text: str, phoneme_map: dict[str, int], language: str = "vi", grow: bool = False
) -> list[int]:
    return phoneme_to_indices(phonemize(text, language), phoneme_map, grow=grow)
