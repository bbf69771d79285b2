"""Property-based kernel tests (hypothesis)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from poi_name_matching_spark.functions import kernels
from poi_name_matching_spark.functions.tokenize import tokenize_name

text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), max_size=40
)
ascii_word = st.text(alphabet="abcdefgh ", max_size=30)


@settings(max_examples=300, deadline=None)
@given(ascii_word, ascii_word)
def test_fast_jaro_equals_naive(a, b):
    assert kernels.jaro_similarity(a, b) == kernels._jaro_similarity_reference(a, b)


@settings(max_examples=200, deadline=None)
@given(text, text)
def test_jaro_bounds_and_symmetry_of_matches(a, b):
    s = kernels.jaro_similarity(a, b)
    assert 0.0 <= s <= 1.0
    jw = kernels.jaro_winkler_similarity(a, b)
    assert s <= jw <= 1.0  # boost only increases


@settings(max_examples=200, deadline=None)
@given(text, text)
def test_damerau_le_levenshtein(a, b):
    assert kernels.damerau_levenshtein_distance(a, b) <= kernels.levenshtein_distance(a, b)


@settings(max_examples=200, deadline=None)
@given(text, text)
def test_levenshtein_metric_properties(a, b):
    d = kernels.levenshtein_distance(a, b)
    assert d == kernels.levenshtein_distance(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))


@settings(max_examples=200, deadline=None)
@given(text)
def test_tokenize_name_output_alphabet(s):
    for tok in tokenize_name(s):
        assert tok
        assert all(c.isascii() and (c.isalnum()) for c in tok), tok
        assert tok == tok.lower()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(["park", "ave", "pizza", "cedar", "schl"]), max_size=8),
       st.lists(st.sampled_from(["park", "ave", "pizza", "cedar", "schl"]), max_size=8))
def test_soft_tfidf_exact_and_bounds(tx, ty):
    df_map = kernels.build_document_frequency([tx, ty, ["other", "doc"]])
    s = kernels.soft_tfidf_pair(
        tx, ty, df_map, 3, kernels.jaro_winkler_similarity, 0.9
    )
    if tx == ty:
        assert s == 1.0
    elif not tx or not ty:
        assert s == 0.0
    else:
        assert s >= 0.0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.floats(-5, 5, allow_subnormal=False).filter(
            lambda x: x == 0 or abs(x) > 1e-6
        ),
        min_size=1,
        max_size=16,
    )
)
def test_cosine_self_is_one_or_zero(v):
    c = kernels.cosine_vec(v, v)
    if any(x != 0 for x in v):
        assert abs(c - 1.0) < 1e-9
    else:
        assert c == 0.0
