"""Frozen stopword list matching the reference's filter_stopwords semantics.

The reference (``load_data/tokenizer.py:52-58``) takes the NLTK English
stopword list, strips apostrophes, and keeps only words of length <= 3.
NLTK is not a runtime dependency here: the full NLTK list is quoted verbatim
in the reference's own comment (``load_data/tokenizer.py:114``), and the
filtered result is frozen below so tokenizer behavior can never drift with
an NLTK data update.

Derivation (documented, not executed at runtime)::

    [re.sub(r"[']", '', w) for w in NLTK_STOPWORDS if len(re.sub(r"[']", '', w)) <= 3]
"""

# 68 words: every NLTK English stopword whose apostrophe-stripped form has
# length <= 3 (e.g. "it's" -> "its", "don" from "don't" tokenization, single
# letters from NLTK's contraction pieces).
FILTERED_STOPWORDS = frozenset(
    {
        "a", "ain", "all", "am", "an", "and", "any", "are", "as", "at",
        "be", "but", "by", "can", "d", "did", "do", "don", "few", "for",
        "had", "has", "he", "her", "him", "his", "how", "i", "if", "in",
        "is", "isn", "it", "its", "ll", "m", "ma", "me", "my", "no",
        "nor", "not", "now", "o", "of", "off", "on", "or", "our", "out",
        "own", "re", "s", "she", "so", "t", "the", "to", "too", "up",
        "ve", "was", "we", "who", "why", "won", "y", "you",
    }
)

# Sorted tuple form for broadcasting as a literal array into Spark SQL
# (array_except against this removes stopwords JVM-side when tokens are
# already lowercased).
FILTERED_STOPWORDS_SORTED = tuple(sorted(FILTERED_STOPWORDS))
