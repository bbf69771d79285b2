"""ASCII transliteration (unidecode stand-in), dependency-free.

The reference normalizer calls ``unidecode.unidecode`` to ASCII-fold accented
characters (reference: ``load_data/tokenizer.py:31``). We reproduce the part
of that behavior exercised by POI/transcript text — Latin-script accent
folding — using Unicode NFKD decomposition plus a small override table for
Latin letters that do not decompose (ß, æ, ø, đ, þ, …), matching
unidecode's published mappings for those characters.

Characters from non-Latin scripts that NFKD cannot fold are dropped — which
is also what the reference pipeline does downstream, since its next step
removes every non ``[\\sa-zA-Z0-9]`` character anyway
(``load_data/tokenizer.py:34``), making the end-to-end tokenizer output
insensitive to this divergence.
"""

from __future__ import annotations

import unicodedata

# Latin characters whose unidecode transliteration is not recoverable from
# NFKD decomposition (they are letters in their own right, not accent
# compositions).
_OVERRIDES = {
    "ß": "ss", "ẞ": "SS",
    "æ": "ae", "Æ": "AE",
    "œ": "oe", "Œ": "OE",
    "ø": "o", "Ø": "O",
    "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D",
    "þ": "th", "Þ": "Th",
    "ł": "l", "Ł": "L",
    "ħ": "h", "Ħ": "H",
    "ı": "i", "İ": "I",
    "ŋ": "ng", "Ŋ": "NG",
    "ĸ": "k",
    "—": "--", "–": "-", "‘": "'", "’": "'", "“": '"', "”": '"',
    "·": "*", "•": "*", "…": "...",
    "°": "deg",
}


def ascii_fold(text: str) -> str:
    """Fold ``text`` to ASCII: NFKD-decompose, drop combining marks, apply
    the override table, drop anything still non-ASCII."""
    if not text:
        return text
    out = []
    for ch in text:
        if ord(ch) < 128:
            out.append(ch)
            continue
        mapped = _OVERRIDES.get(ch)
        if mapped is not None:
            out.append(mapped)
            continue
        decomposed = unicodedata.normalize("NFKD", ch)
        for d in decomposed:
            if ord(d) < 128:
                out.append(d)
            elif d in _OVERRIDES:
                out.append(_OVERRIDES[d])
            # else: combining mark or unmapped script char -> dropped
    return "".join(out)
