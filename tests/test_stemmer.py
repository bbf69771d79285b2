"""Snowball-English stemmer parity vectors.

Expected outputs are from the published Snowball "english" algorithm
(snowballstem.org) — hand-verified step-by-step — plus the special-word
exception list. The reference calls NLTK's SnowballStemmer('english')
(``load_data/tokenizer.py:60-65``), which implements the same algorithm.
"""

import pytest

from poi_name_matching_spark.functions.stemmer import snowball_stem

VECTORS = [
    # plurals / step 1a
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "tie"),
    ("cries", "cri"),
    ("gaps", "gap"),
    ("gas", "gas"),
    ("this", "this"),
    ("fairs", "fair"),
    ("friends", "friend"),
    ("cafes", "cafe"),
    # step 1b
    ("agreed", "agre"),
    ("feed", "feed"),
    ("plastered", "plaster"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("hopping", "hop"),
    ("hoping", "hope"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("meetings", "meet"),
    # step 1c
    ("happy", "happi"),
    ("crying", "cri"),
    # steps 2-4
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("vietnamization", "vietnam"),
    ("predication", "predic"),
    ("friendly", "friend"),
    ("fairly", "fair"),
    ("generously", "generous"),
    # step 5
    ("above", "abov"),
    ("mouse", "mous"),
    ("mice", "mice"),
    ("chinese", "chines"),
    ("china", "china"),
    ("dave", "dave"),
    ("avenue", "avenu"),
    ("ave", "ave"),
    ("pizza", "pizza"),
    ("laspadas", "laspada"),
    # special words & invariants
    ("skis", "ski"),
    ("skies", "sky"),
    ("dying", "die"),
    ("lying", "lie"),
    ("tying", "tie"),
    ("early", "earli"),
    ("only", "onli"),
    ("news", "news"),
    ("innings", "inning"),
    ("proceeded", "proceed"),
    ("exceeding", "exceed"),
    ("succeeds", "succeed"),
    # short words pass through
    ("a", "a"),
    ("be", "be"),
    ("tov", "tov"),
]


@pytest.mark.parametrize("word,expected", VECTORS)
def test_stem(word, expected):
    assert snowball_stem(word) == expected


def test_lowercases_input():
    assert snowball_stem("Friendly") == "friend"


def test_consonant_y_marking():
    # y after a vowel is consonant-marked, so it survives as y
    assert snowball_stem("boy") == "boy"
    assert snowball_stem("say") == "say"
    # initial y is a consonant; following vowel-cons gives normal stemming
    assert snowball_stem("yearly") == "year"
