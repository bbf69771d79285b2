"""Scalar function library: tokenization + similarity kernels.

Pure-Python/numpy implementations (no Spark imports here) so parity with the
reference formulas is settled off-cluster; ``spark_udfs`` wraps them in
Arrow-vectorized pandas UDFs / native Column expressions.
"""

from .stopwords import FILTERED_STOPWORDS
from .tokenize import tokenize_name, tokenize_on_space
from .stemmer import snowball_stem

__all__ = [
    "FILTERED_STOPWORDS",
    "tokenize_name",
    "tokenize_on_space",
    "snowball_stem",
]
