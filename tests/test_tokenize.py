"""Tokenizer parity with the reference normalizer (FIXTURES.md §3).

The canonical pin is the reference's own example sentence
(``load_data/tokenizer.py:117``), worked through its documented steps:
lower -> ';'->space -> ascii-fold -> strip non-[\\sa-zA-Z0-9] -> split ->
drop filtered stopwords -> Snowball stem.
"""

from poi_name_matching_spark.functions.stopwords import FILTERED_STOPWORDS
from poi_name_matching_spark.functions.tokenize import (
    concat_token_list,
    tokenize_name,
    tokenize_on_space,
)


def test_reference_example_sentence():
    sent = (
        "He'l\"l0 and hÄéj! is . & mouse mice it's tov its friends friendly "
        "fairs fairly cafes both above china chinese dave laspadas"
    )
    assert tokenize_name(sent) == [
        "hell0", "haej", "mous", "mice", "tov", "friend", "friend",
        "fair", "fair", "cafe", "both", "abov", "china", "chines",
        "dave", "laspada",
    ]


def test_tokenize_on_space():
    assert tokenize_on_space("  Park  Avenue\tPizza \n") == ["Park", "Avenue", "Pizza"]
    assert tokenize_on_space("") == []


def test_semicolon_to_space():
    assert tokenize_name("pizza;pasta") == ["pizza", "pasta"]


def test_stopword_filter_is_pre_stem():
    # 'its' is a stopword (from "it's"); 'both' (len 4) is not filtered
    assert "both" not in FILTERED_STOPWORDS
    assert "its" in FILTERED_STOPWORDS
    assert tokenize_name("its both") == ["both"]


def test_accent_folding():
    assert tokenize_name("Café Zürich") == ["cafe", "zurich"]


def test_park_avenue():
    # soft-TFIDF walkthrough input (test_hybrid_func.py:430)
    assert tokenize_name("Park Avenue Pizza") == ["park", "avenu", "pizza"]
    assert tokenize_name("Park Ave Pizza") == ["park", "ave", "pizza"]


def test_concat_token_list_trailing_space():
    assert concat_token_list(["a", "b"]) == "a b "
