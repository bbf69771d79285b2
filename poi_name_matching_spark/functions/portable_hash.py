"""Engine-portable hash family for the LSH operators.

The default LSH paths hash with Spark-internal functions (``xxhash64``,
splitmix64-mixed FNV) — fast, but not reproducible outside Spark, which
is why the banding queries were previously `no_oracle` in the driver's
DuckDB cross-check. This module defines a hash family built ONLY from
32-bit-safe modular arithmetic that DuckDB (or any ANSI SQL engine with
64-bit integers) evaluates bit-identically:

* ``poly_hashes(s)`` — two Horner polynomial hashes over the string's
  code points, ``h = (h*B + code) % M`` with prime moduli.  SQL twin:
  ``list_reduce`` over ``unicode()`` codes (:func:`sql_poly_hash`).
* ``affine(h1, h2, j)`` — the Kirsch–Mitzenmacher double-hashing family
  ``g_j = (h1 + (j+1)*h2) % M1`` giving ``j``-indexed independent-ish
  hash functions for MinHash signatures and SimHash bit projections.
* ``plane_coeff`` — a 3-round affine-mod PRNG in [-1, 1) for random
  hyperplane coefficients, expressible as pure column arithmetic in
  BOTH engines (:func:`plane_coeff_col` / :func:`sql_plane_coeff`).

Every product stays below 2^62, so 64-bit signed arithmetic never
overflows (DuckDB raises on BIGINT overflow rather than wrapping).

These are the ORACLE-PARITY variants: statistically adequate for
banding but weaker mixers than the default splitmix64/xxhash64 paths,
which remain the production default (``hash_family='fast'``).
"""

from __future__ import annotations

import numpy as np

#: Mersenne prime 2^31-1 — the primary modulus (fits int32; products of
#: two residues fit comfortably in int64)
M1 = 2_147_483_647
#: second prime modulus for the independent h2 polynomial
M2 = 1_000_000_007
B1 = 131
B2 = 137
#: bit threshold: affine value >= HALF → bit 1 (balanced for prime M1)
HALF = (M1 + 1) // 2

# 3-round plane-coefficient PRNG constants (classic LCG multipliers)
_PC_A0 = 8191
_PC_A1 = 131_071
_PC_M1 = 1_103_515_245
_PC_M2 = 69_069
_PC_C = 12_345


def poly_hashes(s: str) -> tuple[int, int]:
    """Two Horner polynomial hashes over code points (mod M1 / M2)."""
    h1 = h2 = 0
    for ch in s:
        c = ord(ch)
        h1 = (h1 * B1 + c) % M1
        h2 = (h2 * B2 + c) % M2
    return h1, h2


def affine(h1: int, h2: int, j: int) -> int:
    """j-th member of the double-hashing family (j >= 0)."""
    return (h1 + (j + 1) * h2) % M1


def plane_coeff(family: int, p: int, d: int) -> float:
    """Deterministic hyperplane coefficient in [-1, 1) for (plane-family,
    plane, dimension) — pure integer arithmetic, python reference."""
    x = ((family * _PC_A0 + p) * _PC_A1 + d) % M1
    u1 = (x * _PC_M1 + _PC_C) % M1
    u2 = (u1 * _PC_M2 + _PC_C) % M1
    return (u2 % 10_000) / 5_000.0 - 1.0


# --------------------------------------------------------------------------
# Spark side
# --------------------------------------------------------------------------


def plane_coeff_col(family: int, p: int, d):
    """:func:`plane_coeff` as a Spark Column expression over a dimension
    column ``d`` (all intermediates cast long — the first product
    exceeds int32)."""
    from pyspark.sql import functions as F

    x = (
        F.lit(int((family * _PC_A0 + p) * _PC_A1)).cast("long")
        + d.cast("long")
    ) % F.lit(M1)
    u1 = (x * F.lit(_PC_M1) + F.lit(_PC_C)) % F.lit(M1)
    u2 = (u1 * F.lit(_PC_M2) + F.lit(_PC_C)) % F.lit(M1)
    return (u2 % F.lit(10_000)).cast("double") / F.lit(5_000.0) - F.lit(1.0)


def make_portable_minhash_udf(num_hashes: int = 64):
    """minhash(tokens array<string>) -> array<long> over the portable
    family: signature[j] = min over the token SET of affine(h1,h2,j).
    Bit-identical to the DuckDB pipeline from :func:`sql_minhash_cte`."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def portable_minhash_udf(tokens):
        j = np.arange(1, num_hashes + 1, dtype=np.int64)[:, None]
        empty = [M1] * num_hashes
        cache: dict[str, tuple[int, int]] = {}
        out = []
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append(empty)
                continue
            hs = []
            for t in set(toks):
                v = cache.get(t)
                if v is None:
                    v = poly_hashes(t)
                    cache[t] = v
                hs.append(v)
            h = np.asarray(hs, dtype=np.int64)  # (n, 2)
            sig = (h[None, :, 0] + j * h[None, :, 1]) % M1
            out.append(sig.min(axis=1).tolist())
        return pd.Series(out)

    return portable_minhash_udf


def make_portable_simhash_udf(bits: int = 60):
    """simhash(tokens array<string>) -> long over the portable family:
    bit j of the fingerprint is set iff the token-occurrence-weighted
    vote Σ ±1 is positive, where a token votes +1 on bit j when
    affine(h1,h2,j) >= HALF. 60 bits (not 64) keeps the fingerprint
    strictly positive in a signed 64-bit integer on both engines."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    assert bits <= 62

    @pandas_udf(LongType())
    def portable_simhash_udf(tokens):
        from collections import Counter

        j = np.arange(1, bits + 1, dtype=np.int64)[:, None]
        shifts = np.arange(bits, dtype=np.int64)
        cache: dict[str, tuple[int, int]] = {}
        out = []
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append(0)
                continue
            cnt = Counter(toks)
            hs, counts = [], []
            for t, c in cnt.items():
                v = cache.get(t)
                if v is None:
                    v = poly_hashes(t)
                    cache[t] = v
                hs.append(v)
                counts.append(c)
            h = np.asarray(hs, dtype=np.int64)
            c = np.asarray(counts, dtype=np.int64)
            vals = (h[None, :, 0] + j * h[None, :, 1]) % M1
            votes = (np.where(vals >= HALF, c, -c)).sum(axis=1)
            fp = int(np.sum(np.left_shift((votes > 0).astype(np.int64), shifts)))
            out.append(fp)
        return pd.Series(out)

    return portable_simhash_udf


def make_portable_winnow_udf(k: int = 8, window: int = 4):
    """winnow(text) -> array<long>: winnowing fingerprints (Schleimer et
    al., SIGMOD'03) over the portable family — gram hash = Horner
    polynomial ``(h*B1 + code) % M1`` over the k code points, then
    sliding-window min + distinct. Vectorized per row: Horner runs as k
    shifted numpy ops over the code array (mod applied each step, so
    arbitrary code points can't overflow int64). Whitespace is
    normalized with the SAME explicit class both engines split on.

    This is the oracle-parity twin of the HOF path in
    ``operators/textstats.winnow_fingerprints``: the nested Column
    expression re-evaluates the normalized string per gram character
    (O(len²·k) per row in codegen), so the portable variant ships as an
    Arrow-batched UDF like the portable minhash/simhash."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    from .tokenize import WS_CLASS

    ws_re = re.compile(WS_CLASS + "+")

    @pandas_udf(ArrayType(LongType()))
    def portable_winnow_udf(texts):
        out = []
        for s in texts:
            if s is None:
                out.append([])
                continue
            norm = ws_re.sub(" ", s.lower())
            n = len(norm)
            n_grams = n - (k - 1)
            if n_grams <= 0:
                out.append([])
                continue
            codes = np.fromiter((ord(c) for c in norm), dtype=np.int64, count=n)
            h = np.zeros(n_grams, dtype=np.int64)
            for j in range(k):
                h = (h * B1 + codes[j : j + n_grams]) % M1
            n_windows = max(n_grams - (window - 1), 1)
            win = min(window, n_grams)
            mins = np.lib.stride_tricks.sliding_window_view(
                h[: n_windows + win - 1], win
            ).min(axis=1)
            # preserve first-appearance order like array_distinct
            seen: dict[int, None] = dict.fromkeys(mins.tolist())
            out.append(list(seen))
        return pd.Series(out)

    return portable_winnow_udf


# --------------------------------------------------------------------------
# DuckDB SQL twins (used by the driver-contract oracle queries)
# --------------------------------------------------------------------------

def sql_poly_hash(expr: str, base: int, mod: int) -> str:
    """Horner fold over code points — DuckDB twin of :func:`poly_hashes`."""
    codes = f"list_transform(range(length({expr})), i -> unicode({expr}[i+1]))"
    return (
        f"list_reduce(list_prepend(0::BIGINT, {codes}), "
        f"(acc, c) -> (acc * {base} + c) % {mod})"
    )


def sql_affine(h1: str, h2: str, j: str) -> str:
    # explicit BIGINT: DuckDB types bare literals INT32 and raises on
    # overflow instead of promoting
    return f"(({h1})::BIGINT + (({j})::BIGINT + 1) * ({h2})::BIGINT) % {M1}"


def sql_plane_coeff(family: str, p: str, d: str) -> str:
    """DuckDB twin of :func:`plane_coeff` (family/p/d are SQL expressions)."""
    x = f"((({family}) * {_PC_A0} + ({p}))::BIGINT * {_PC_A1} + ({d})) % {M1}"
    u1 = f"(({x}) * {_PC_M1} + {_PC_C}) % {M1}"
    u2 = f"(({u1}) * {_PC_M2} + {_PC_C}) % {M1}"
    return f"((({u2}) % 10000) / 5000.0 - 1.0)"


def sql_plane_dot(vec: str, family: str, p: str) -> str:
    """Sequential left fold of Σ vec[d]*coeff(family,p,d) — the same
    association order as Spark's ``F.aggregate``, so the IEEE sum (and
    its sign) is bit-identical across engines."""
    coeff = sql_plane_coeff(family, p, "d")
    terms = (
        f"list_transform(range(len({vec})), d -> ({vec})[d+1] * ({coeff}))"
    )
    return f"list_reduce(list_prepend(0.0, {terms}), (acc, x) -> acc + x)"
