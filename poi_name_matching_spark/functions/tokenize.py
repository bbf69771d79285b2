"""Tokenizers with per-token parity to the reference.

Reference semantics (``load_data/tokenizer.py``):

* ``tokenize_on_space`` (:13-15): ``re.findall(r"\\S+", s)``.
* ``tokenize_name`` (:24-50), the canonical normalizer and the default
  ``tokenize`` (:73-75): lowercase -> ``;`` to space -> ASCII-fold ->
  strip every char not in ``[\\sa-zA-Z0-9]`` -> split on whitespace ->
  drop filtered stopwords (case-insensitively) -> Snowball-stem each token.
"""

from __future__ import annotations

import re

from .asciifold import ascii_fold
from .stemmer import snowball_stem
from .stopwords import FILTERED_STOPWORDS

#: Exactly the characters Python ``re``'s ``\s`` matches on ``str``
#: (Unicode White_Space plus the FS/GS/RS/US separators). Java regex
#: (Spark) and RE2 (DuckDB) define ``\s`` as ASCII-only — and disagree
#: with EACH OTHER on ``\x0b`` — so every engine-side whitespace split
#: uses this explicit class instead, keeping all three engines
#: bit-identical to ``re.findall(r"\S+", s)`` on any input
#: (``test_tokenize.py`` pins the set against ``re`` exhaustively).
WS_CHARS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    + "".join(map(chr, range(0x2000, 0x200B)))
    + "\u2028\u2029\u202f\u205f\u3000"
)
#: regex character class form, valid verbatim in Python re, Java regex,
#: and RE2 (whitespace chars need no escaping inside a class)
WS_CLASS = "[" + WS_CHARS + "]"

_WS_TOKEN = re.compile(r"\S+")
_NON_ALNUM = re.compile(r"[^\sa-zA-Z0-9]")


def tokenize_on_space(text: str) -> list[str]:
    return _WS_TOKEN.findall(text)


def tokenize_name(name: str) -> list[str]:
    s = name.lower()
    s = s.replace(";", " ")
    s = ascii_fold(s)
    s = _NON_ALNUM.sub("", s)
    tokens = _WS_TOKEN.findall(s)
    tokens = [t for t in tokens if t.lower() not in FILTERED_STOPWORDS]
    return [snowball_stem(t) for t in tokens]


# The reference's `tokenize` alias dispatches to tokenize_name
# (load_data/tokenizer.py:73-75).
tokenize = tokenize_name


def concat_token_list(tokens: list[str]) -> str:
    """Join with a trailing space (reference ``tokenizer.py:67-71``)."""
    return "".join(t + " " for t in tokens)
