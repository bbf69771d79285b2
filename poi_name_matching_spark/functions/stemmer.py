"""Snowball "english" (Porter2) stemmer, pure Python, dependency-free.

Implements Martin Porter's published Snowball English stemming algorithm
(https://snowballstem.org/algorithms/english/stemmer.html), matching the
behavior of the reference's ``SnowballStemmer(language='english')`` call
(reference: ``load_data/tokenizer.py:60-65``) — including the standard
special-word exception list — so token streams are identical without an
NLTK runtime dependency.

R1/R2 are maintained as fixed character offsets from the start of the word
(all mutations happen at the word's end, so the offsets never move), which
is exactly the region semantics of the published algorithm.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Exceptional forms defined by the published algorithm (exception1 +
# invariant forms + the -ceed/-eed exceptions).
_SPECIAL_WORDS = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
    "inning": "inning", "innings": "inning", "outing": "outing",
    "outings": "outing", "canning": "canning", "cannings": "canning",
    "herring": "herring", "herrings": "herring", "earring": "earring",
    "earrings": "earring", "proceed": "proceed", "proceeds": "proceed",
    "proceeded": "proceed", "proceeding": "proceed", "exceed": "exceed",
    "exceeds": "exceed", "exceeded": "exceed", "exceeding": "exceed",
    "succeed": "succeed", "succeeds": "succeed", "succeeded": "succeed",
    "succeeding": "succeed",
}

_STEP2_SUFFIXES = (
    "ization", "ational", "fulness", "ousness", "iveness", "tional",
    "biliti", "lessli", "entli", "ation", "alism", "aliti", "ousli",
    "iviti", "fulli", "enci", "anci", "abli", "izer", "ator", "alli",
    "bli", "ogi", "li",
)
_STEP3_SUFFIXES = (
    "ational", "tional", "alize", "icate", "iciti", "ative", "ical",
    "ness", "ful",
)
_STEP4_SUFFIXES = (
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
    "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
)


def _standard_r1(word: str) -> int:
    """Offset of R1: after the first consonant that follows a vowel."""
    for i in range(1, len(word)):
        if word[i] not in _VOWELS and word[i - 1] in _VOWELS:
            return i + 1
    return len(word)


def _compute_r1_r2(word: str) -> tuple[int, int]:
    if word.startswith(("gener", "arsen")):
        p1 = 5
    elif word.startswith("commun"):
        p1 = 6
    else:
        p1 = _standard_r1(word)
    p2 = p1 + _standard_r1(word[p1:]) if p1 < len(word) else len(word)
    return p1, min(p2, len(word))


def _ends_short_syllable(word: str) -> bool:
    """word ends in a short syllable (per the Snowball definition)."""
    n = len(word)
    if n >= 3:
        c3, v2, c1 = word[-3], word[-2], word[-1]
        if c3 not in _VOWELS and v2 in _VOWELS and c1 not in _VOWELS and c1 not in "wxY":
            return True
    if n == 2 and word[0] in _VOWELS and word[1] not in _VOWELS:
        return True
    return False


@lru_cache(maxsize=262144)
def snowball_stem(word: str) -> str:
    word = word.lower()
    if len(word) <= 2:
        return word
    if word in _SPECIAL_WORDS:
        return _SPECIAL_WORDS[word]

    # Prelude: normalize apostrophes, strip a leading one, mark consonant-y.
    word = (
        word.replace("’", "'").replace("‘", "'").replace("‛", "'")
    )
    if word.startswith("'"):
        word = word[1:]
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    p1, p2 = _compute_r1_r2(word)

    def in_r1(suffix_len: int) -> bool:
        return len(word) - suffix_len >= p1

    def in_r2(suffix_len: int) -> bool:
        return len(word) - suffix_len >= p2

    # Step 0: 's' / 's / '
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        if any(ch in _VOWELS for ch in word[:-2]):
            word = word[:-1]

    # Step 1b
    for suf in ("eedly", "ingly", "edly", "eed", "ing", "ed"):
        if word.endswith(suf):
            if suf in ("eed", "eedly"):
                if in_r1(len(suf)):
                    word = word[: -len(suf)] + "ee"
            else:
                if any(ch in _VOWELS for ch in word[: -len(suf)]):
                    word = word[: -len(suf)]
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif len(word) <= p1 and _ends_short_syllable(word):
                        word += "e"
            break

    # Step 1c: replace suffix y/Y by i if preceded by a non-vowel which is
    # not the first letter of the word.
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # Step 2 (suffix must lie in R1)
    for suf in _STEP2_SUFFIXES:
        if word.endswith(suf):
            if in_r1(len(suf)):
                if suf == "tional":
                    word = word[:-2]
                elif suf in ("enci", "anci", "abli"):
                    word = word[:-1] + "e"
                elif suf == "entli":
                    word = word[:-2]
                elif suf in ("izer", "ization"):
                    word = word[: -len(suf)] + "ize"
                elif suf in ("ational", "ation", "ator"):
                    word = word[: -len(suf)] + "ate"
                elif suf in ("alism", "aliti", "alli"):
                    word = word[: -len(suf)] + "al"
                elif suf == "fulness":
                    word = word[:-4]
                elif suf in ("ousli", "ousness"):
                    word = word[: -len(suf)] + "ous"
                elif suf in ("iveness", "iviti"):
                    word = word[: -len(suf)] + "ive"
                elif suf in ("biliti", "bli"):
                    word = word[: -len(suf)] + "ble"
                elif suf == "ogi":
                    if len(word) >= 4 and word[-4] == "l":
                        word = word[:-1]
                elif suf in ("fulli", "lessli"):
                    word = word[:-2]
                elif suf == "li":
                    if len(word) >= 3 and word[-3] in _LI_ENDING:
                        word = word[:-2]
            break

    # Step 3 (in R1; "ative" additionally requires R2)
    for suf in _STEP3_SUFFIXES:
        if word.endswith(suf):
            if in_r1(len(suf)):
                if suf == "tional":
                    word = word[:-2]
                elif suf == "ational":
                    word = word[:-7] + "ate"
                elif suf == "alize":
                    word = word[:-3]
                elif suf in ("icate", "iciti", "ical"):
                    word = word[: -len(suf)] + "ic"
                elif suf in ("ful", "ness"):
                    word = word[: -len(suf)]
                elif suf == "ative":
                    if in_r2(5):
                        word = word[:-5]
            break

    # Step 4 (in R2; "ion" only when preceded by s or t)
    for suf in _STEP4_SUFFIXES:
        if word.endswith(suf):
            if in_r2(len(suf)):
                if suf == "ion":
                    if len(word) >= 4 and word[-4] in "st":
                        word = word[:-3]
                else:
                    word = word[: -len(suf)]
            break

    # Step 5
    if word.endswith("e"):
        if in_r2(1):
            word = word[:-1]
        elif in_r1(1) and not _ends_short_syllable(word[:-1]):
            word = word[:-1]
    elif word.endswith("l"):
        if in_r2(1) and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
