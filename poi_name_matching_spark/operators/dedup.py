"""Document-level deduplication family — the large-scale training-data
operators layered on the same kernels the matcher uses.

All operate on a documents table ``(doc_id, text, ...)``:

* ``exact_dedup``           — hash-groupBy, keep min doc_id per content hash
* ``ngram_jaccard_pairs``   — n-gram shingle Jaccard near-dup pairs
* ``minhash_lsh_pairs``     — shingle → MinHash → band bucket-join → verify
* ``simhash_pairs``         — 64-bit SimHash, bucket by rotated prefixes
* ``embedding_near_dup``    — cosine over embedding column via LSH buckets

Design: every near-dup operator is (candidate generation by equi-join on a
computed key) → (exact verification on the candidate pairs) — the same
blocking→scoring shape as the matcher. The skew machinery is WIRED IN,
not just available: every bucket relation routes through
``blocking.salt_oversized`` (bounded per-bucket membership →
``max_bucket_size²`` candidate bound per salted bucket), and token-less
documents are dropped before bucketing (they would otherwise share one
degenerate signature/fingerprint and form a single quadratic bucket).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.spark_udfs import (
    cosine_array,
    jaccard_tokens,
    make_minhash_udf,
    whitespace_tokens,
)
from .blocking import salt_oversized

#: default per-bucket membership bound for the MULTI-BAND dedup
#: operators (MinHash, embedding LSH). A bucket of B members implies B²
#: candidate pairs, so an unsalted Zipf-hot bucket (shared boilerplate
#: prefix, near-empty docs) is quadratic at web scale; buckets above the
#: bound are split into deterministic salted sub-buckets (cross-salt
#: pairs inside a hot bucket are sacrificed — the multi-band families
#: keep recall through their other bands). The SINGLE-band operators
#: (``ngram_jaccard_pairs``) and the pigeonhole-guaranteed
#: ``simhash_pairs`` default to ``max_bucket_size=0`` (strict, exhaustive
#: semantics): salting there silently loses true pairs, so it is opt-in.
DEFAULT_MAX_BUCKET = 1000

#: diagnostic bound for the STRICT (unsalted) single-band operators:
#: when ``max_bucket_size=0`` and any bucket exceeds this, a warning
#: makes the opt-in salting knob discoverable before the B² pair blowup
#: bites at scale. Costs one slim aggregate job per call; set to None
#: to disable the diagnostic entirely.
WARN_UNSALTED_BUCKET_BOUND: int | None = DEFAULT_MAX_BUCKET


def _diagnostics_enabled(diagnostics: "bool | None") -> bool:
    """Resolve a per-call ``diagnostics`` override against the module
    switch: explicit True/False wins; None defers to whether
    ``WARN_UNSALTED_BUCKET_BOUND`` is set. The diagnostic costs one slim
    aggregate job at CALL time — callers building plans they may prune
    or abandon should pass ``diagnostics=False`` to stay fully lazy."""
    if diagnostics is not None:
        return diagnostics
    return WARN_UNSALTED_BUCKET_BOUND is not None


def _warn_if_bucket_oversized(bucketed: DataFrame, operator: str) -> None:
    """Log when the largest unsalted bucket exceeds the diagnostic bound
    (B members ⇒ B² candidate pairs). Called only on the strict
    ``max_bucket_size=0`` paths; the input must be a SLIM relation
    (already checkpointed or cheap to recompute). Gating is the
    caller's job (``_diagnostics_enabled``); when the module bound is
    silenced but a caller forced ``diagnostics=True``, the default
    bound applies — explicit True must actually warn."""
    bound = (
        WARN_UNSALTED_BUCKET_BOUND
        if WARN_UNSALTED_BUCKET_BOUND is not None
        else DEFAULT_MAX_BUCKET
    )
    row = bucketed.groupBy("bucket").count().agg(F.max("count")).first()
    biggest = row[0] if row is not None and row[0] is not None else 0
    if biggest > bound:
        import logging

        logging.getLogger(__name__).warning(
            "%s: largest candidate bucket has %d members (> %d) under the "
            "strict max_bucket_size=0 default — that is up to ~%d candidate "
            "pairs from one bucket. At scale, opt in to salting via "
            "max_bucket_size (recall contract in the operator docstring) or "
            "prefer minhash_lsh_pairs; set "
            "dedup.WARN_UNSALTED_BUCKET_BOUND=None to silence.",
            operator,
            biggest,
            bound,
            biggest * (biggest - 1) // 2,
        )


def content_hash(text: Column) -> Column:
    """Deterministic content key (md5 of exact bytes) — exact dedup key."""
    return F.md5(text)


def exact_dedup(documents: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative per exact text content.

    groupBy(min) rather than dropDuplicates: deterministic winner under
    any partitioning (dropDuplicates keeps an arbitrary first row)."""
    return (
        documents.groupBy(content_hash(F.col(text_col)).alias("content_key"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .select(id_col, "content_key", "dup_count")
    )


def char_ngrams(text: Column, n: int = 5) -> Column:
    """array of distinct char n-gram shingles, JVM-side (no UDF):
    sequence+transform+substring then array_distinct."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(text, i, n)))


def word_ngrams(tokens: Column, n: int = 3) -> Column:
    """array of distinct word n-gram shingles from a token array."""
    count = F.greatest(F.size(tokens) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(1), count)
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_tokens: int = 2,
    max_bucket_size: int = 0,
    min_tokens: int = 1,
    diagnostics: bool | None = None,
) -> DataFrame:
    """Near-dup pairs by word-ngram Jaccard >= threshold.

    Candidates: docs sharing a rare-ish leading shingle prefix (first
    ``band_tokens`` whitespace tokens) — cheap blocking; verification is
    the native array intersect/union expression. The prefix key is
    Zipf-hot (stop-word openers), so buckets above ``max_bucket_size``
    are salted (``blocking.salt_oversized``) — the quadratic bound per
    (salted) bucket is ``max_bucket_size²`` regardless of key heat.

    RECALL CONTRACT under salting: this operator has a SINGLE band, so
    a true pair split across salt sub-buckets of an oversized bucket is
    LOST. The default (``max_bucket_size=0``) is therefore the strict,
    exhaustive within-prefix semantics; callers at web scale OPT IN to
    the cap (trading recall inside hot buckets — overwhelmingly
    boilerplate — for the ``max_bucket_size²`` pair bound), or prefer
    ``minhash_lsh_pairs`` (16 bands of whole-set hashes recover
    cross-salt pairs) when hot prefixes carry signal. Empty-token docs
    are dropped (no shingle, and they would all share one degenerate
    bucket). For high thresholds the MinHash path below scales better;
    this is the exact-verify baseline.
    """
    toks = whitespace_tokens(F.col(text_col))
    shingled = documents.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        word_ngrams(toks, n).alias("shingles"),
    ).filter(F.size("toks") >= int(max(min_tokens, 1)))
    shingled = shingled.select(
        "id",
        "shingles",
        F.concat_ws(" ", F.slice("toks", 1, band_tokens)).alias("bucket"),
    )
    if max_bucket_size:
        shingled = salt_oversized(
            shingled, max_bucket_size, id_col="id", key_col="bucket"
        )
    elif _diagnostics_enabled(diagnostics):
        # strict default: diagnose hot buckets on the slim projection of
        # the SAME plan — Catalyst prunes the unused shingle arrays out
        # of the aggregate, so this is one light agg job (at CALL time;
        # pass diagnostics=False for fully lazy plan construction) and
        # cannot drift from the bucket definition the join actually uses
        _warn_if_bucket_oversized(
            shingled.select("id", "bucket"), "ngram_jaccard_pairs"
        )
    left = shingled.select(
        F.col("id").alias("left_id"),
        F.col("shingles").alias("l_sh"),
        F.col("bucket"),
    )
    right = shingled.select(
        F.col("id").alias("right_id"),
        F.col("shingles").alias("r_sh"),
        F.col("bucket"),
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("jaccard", jaccard_tokens(F.col("l_sh"), F.col("r_sh")))
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("left_id", "right_id", "jaccard")
        .dropDuplicates(["left_id", "right_id"])
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    ngram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    verify: bool = True,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    hash_family: str = "fast",
    min_tokens: int = 1,
) -> DataFrame:
    """Near-dup pairs via shingle→MinHash→band→bucket-join (+ exact
    Jaccard verification — LSH is candidate generation only).

    Shuffles: one per band-key join (unioned; single shuffle on the
    exploded key), one dedup, one verify join. Bands/rows tuned so the
    S-curve threshold (1/bands)^(rows⁻¹) sits below ``threshold``.

    Skew guards: token-less docs are dropped BEFORE signing (they would
    all share the degenerate all-MAX_HASH signature → one quadratic
    bucket at web scale), and band buckets above ``max_bucket_size`` are
    salted. A true near-dup pair split by salting in one hot band still
    collides in its other bands (the keys hash the whole token set).

    ``hash_family``: ``'fast'`` (default, splitmix64/xxhash64 — the
    production mixer) or ``'portable'`` (double-hashing over polynomial
    code-point hashes, reproducible in ANSI SQL — the driver-contract
    oracle re-derives the ENTIRE banding pipeline in DuckDB against it;
    band keys are then the plain ':'-joined signature slices instead of
    an xxhash64 of the slice).
    """
    rows_per_band = num_hashes // bands
    toks = whitespace_tokens(F.col(text_col))
    shingled = (
        documents.select(F.col(id_col).alias("id"), toks.alias("toks"))
        .filter(F.size("toks") >= int(max(min_tokens, 1)))
        .select("id", word_ngrams(F.col("toks"), ngram).alias("shingles"))
    )
    if hash_family == "portable":
        from ..functions.portable_hash import make_portable_minhash_udf

        minhash = make_portable_minhash_udf(num_hashes)
        with_sig = shingled.withColumn("mh", minhash(F.col("shingles")))
        band_keys = F.array(
            *[
                F.concat_ws(
                    ":",
                    F.lit(f"b{i}"),
                    F.slice("mh", i * rows_per_band + 1, rows_per_band).cast(
                        "array<string>"
                    ),
                )
                for i in range(bands)
            ]
        )
    else:
        minhash = make_minhash_udf(num_hashes, seed)
        with_sig = shingled.withColumn("mh", minhash(F.col("shingles")))
        band_keys = F.array(
            *[
                F.concat(
                    F.lit(f"b{i}:"),
                    F.xxhash64(F.slice("mh", i * rows_per_band + 1, rows_per_band)),
                )
                for i in range(bands)
            ]
        )
    # bucket relation is SLIM (id, bucket) — the shingle payload is
    # re-joined only for verification, so salting (which references the
    # relation three times) never recomputes the MinHash UDF or ships
    # shingles × bands through the shuffle
    buckets = with_sig.select("id", F.explode(band_keys).alias("bucket"))
    if max_bucket_size:
        buckets = buckets.localCheckpoint(eager=True)
        buckets = salt_oversized(
            buckets, max_bucket_size, id_col="id", key_col="bucket"
        )
    left = buckets.select(F.col("id").alias("left_id"), "bucket")
    right = buckets.select(F.col("id").alias("right_id"), "bucket")
    cand = (
        left.join(right, "bucket")
        .filter(F.col("left_id") < F.col("right_id"))
        .dropDuplicates(["left_id", "right_id"])
    )
    if not verify:
        return cand.select("left_id", "right_id")
    lsh = shingled.select(F.col("id").alias("left_id"), F.col("shingles").alias("l_sh"))
    rsh = shingled.select(F.col("id").alias("right_id"), F.col("shingles").alias("r_sh"))
    return (
        cand.join(lsh, "left_id")
        .join(rsh, "right_id")
        .withColumn("jaccard", jaccard_tokens(F.col("l_sh"), F.col("r_sh")))
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
        .select("left_id", "right_id", "jaccard")
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array, fully JVM-side: per-token xxhash64,
    per-bit +1/-1 vote aggregated with higher-order functions.

    bit b of result = 1 iff Σ_tokens sign(bit b of xxhash64(token)) > 0.
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    # one aggregate per bit (python-level unroll: shift amounts must be
    # literals); each is a JVM-side fold over the token-hash array.
    # closure factory, NOT a default arg: pandas-style `b=b` would make
    # the lambda 3-ary and Spark would bind a lambda variable to it
    def _vote(b: int) -> Column:
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    result = F.lit(0).cast("long")
    for b in range(64):
        result = result.bitwiseOR(
            F.when(_vote(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return result


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def make_simhash_udf():
    """Fast SimHash: numpy-vectorized pandas UDF (splitmix64 token mixing,
    np.unpackbits vote matrix). ~50× the interpreted higher-order-function
    expression of :func:`simhash64`; fingerprints differ from the JVM
    variant (different token hash) but SimHash only needs
    self-consistency. Default path for ``simhash_pairs``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    from ..functions.embedding import fnv1a
    from ..functions.spark_udfs import _splitmix64

    # no type annotations: `from __future__ import annotations` turns them
    # into strings that pyspark's hint inspection can't resolve against
    # the locally-imported pandas
    @pandas_udf(LongType())
    def simhash_udf(tokens):
        cache: dict[str, int] = {}

        def th(t: str) -> int:
            v = cache.get(t)
            if v is None:
                v = fnv1a(t.encode("utf-8"))
                cache[t] = v
            return v

        out = []
        for toks in tokens:
            if toks is None or len(toks) == 0:
                out.append(0)
                continue
            h = _splitmix64(
                np.fromiter((th(t) for t in toks), dtype=np.uint64)
            )
            bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1)
            # int64 BEFORE the subtraction: the uint sum would wrap
            # negative votes to huge positives (all-ones fingerprints)
            votes = bits.sum(axis=0).astype(np.int64) * 2 - len(h)
            fp = np.packbits((votes > 0).astype(np.uint8)).view(np.uint64)[0]
            out.append(int(fp.astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return simhash_udf


def simhash_pairs(
    documents: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 4,
    use_fast_udf: bool = True,
    max_bucket_size: int = 0,
    hash_family: str = "fast",
    diagnostics: bool | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash distance <= max_hamming.

    Candidate generation by the pigeonhole principle: split the 64-bit
    fingerprint into ``blocks`` 16-bit blocks; two fingerprints within
    Hamming distance (blocks-1) share at least one exact block — bucket
    equi-join per block, verify with bit_count. (Manku et al., WWW'07
    construction, re-expressed as DataFrame joins.)

    ``use_fast_udf``: numpy pandas-UDF fingerprint (default); False uses
    the pure-JVM expression (slower: higher-order functions are
    interpreted, 64 folds per row — kept for environments where Python
    workers are undesirable).

    Skew guards: token-less docs dropped (all share fingerprint 0).
    RECALL CONTRACT: the default (``max_bucket_size=0``) keeps the
    strict pigeonhole guarantee — EVERY ≤max_hamming pair is returned.
    16-bit blocks of boilerplate-heavy corpora collide massively, so
    web-scale callers may OPT IN to salting buckets above
    ``max_bucket_size``; the guarantee then holds only for blocks that
    are not salted away (a pair whose every shared block bucket is
    oversized AND salt-split is lost; the ``blocks`` keys give partial
    redundancy — 4 chances).
    """
    assert max_hamming < blocks, "pigeonhole requires max_hamming < blocks"
    toks = whitespace_tokens(F.col(text_col))
    base = documents.select(
        F.col(id_col).alias("id"), toks.alias("toks")
    ).filter(F.size("toks") > 0)
    if hash_family == "portable":
        # 60-bit fingerprint over the SQL-portable double-hashing family
        # (strictly positive in signed 64-bit on every engine) — the
        # driver-contract oracle recomputes it brute-force in DuckDB
        from ..functions.portable_hash import make_portable_simhash_udf

        bits = 60
        fingerprint_col = make_portable_simhash_udf(bits)(F.col("toks"))
    else:
        bits = 64
        fingerprint_col = (
            make_simhash_udf()(F.col("toks"))
            if use_fast_udf
            else simhash64(F.col("toks"))
        )
    width = bits // blocks
    sh = base.select("id", fingerprint_col.alias("sh"))
    mask = (1 << width) - 1
    block_keys = F.array(
        *[
            F.concat(
                F.lit(f"s{i}:"),
                F.shiftright("sh", i * width).bitwiseAND(F.lit(mask)),
            )
            for i in range(blocks)
        ]
    )
    buckets = sh.select("id", "sh", F.explode(block_keys).alias("bucket"))
    if max_bucket_size:
        # lazy localCheckpoint before salting: the salt plan references
        # the bucket relation three times and should not recompute the
        # fingerprint UDF per reference. eager=False runs no job until
        # the caller acts, and the checkpoint blocks are freed by the
        # ContextCleaner when the returned plan is dropped — persist()
        # here would pin a CacheManager entry for the session lifetime
        # (an unbounded leak for a long-lived driver calling this per
        # batch, with no handle returned to unpersist). Trade-off:
        # truncated lineage (an executor loss fails the stage instead
        # of recomputing) — acceptable for a deterministic
        # single-stage relation.
        buckets = buckets.localCheckpoint(eager=False)
        buckets = salt_oversized(
            buckets, max_bucket_size, id_col="id", key_col="bucket"
        )
    elif _diagnostics_enabled(diagnostics):
        # strict default + diagnostics on: checkpoint so the
        # fingerprint UDF is computed once for BOTH the hot-bucket
        # diagnostic and the pair join. The diagnostic aggregate is the
        # one eager job this branch runs at CALL time (cost and off
        # switches documented on WARN_UNSALTED_BUCKET_BOUND and the
        # ``diagnostics`` parameter).
        buckets = buckets.localCheckpoint(eager=False)
        _warn_if_bucket_oversized(buckets, "simhash_pairs")
    left = buckets.select(F.col("id").alias("left_id"), F.col("sh").alias("l_sh"), "bucket")
    right = buckets.select(F.col("id").alias("right_id"), F.col("sh").alias("r_sh"), "bucket")
    return (
        left.join(right, "bucket")
        .filter(F.col("left_id") < F.col("right_id"))
        .dropDuplicates(["left_id", "right_id"])
        .withColumn("hamming", hamming64(F.col("l_sh"), F.col("r_sh")))
        .filter(F.col("hamming") <= max_hamming)
        .select("left_id", "right_id", "hamming")
    )


def embedding_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    tables: int = 8,
    seed: int = 42,
    max_bucket_size: int = DEFAULT_MAX_BUCKET,
    hash_family: str = "fast",
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold.

    Candidates via random-hyperplane LSH with an **OR-construction**
    (mirroring MinHash banding): ``tables`` independent sign sketches of
    ``planes`` hyperplanes each; a pair is a candidate if it shares ANY
    table's full sketch. Per-plane collision probability at angle θ is
    p = 1 - θ/π, so recall = 1 - (1 - p^planes)^tables — at cosine 0.95
    with 8×8 that is ≈0.99, where a single AND-only 12-plane sketch
    (the previous design) sat at ≈0.15 for cosine 0.9. Exact cosine
    verification follows candidate generation, so extra candidates cost
    time, never correctness. Buckets above ``max_bucket_size`` are
    salted (hub regions of embedding space).
    """
    # deterministic per-dimension plane coefficients: hash(seed, table,
    # plane, dim) → ±[0,1); each table draws an independent plane family.
    # hash_family='portable' swaps xxhash64 for the SQL-reproducible
    # affine-mod PRNG so the driver oracle re-derives the buckets
    # exactly; NOTE the portable family is intentionally seed-free (its
    # plane family IS the table index, so the SQL oracle needs no seed
    # plumbing) — pass the fast family for seed-ensembled sketches.
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    if hash_family == "portable":
        from ..functions.portable_hash import plane_coeff_col
        from .ann import ANN_PLANE_FAMILY

        # portable plane family = table index; family ANN_PLANE_FAMILY
        # is reserved for ivf_topk's sign sketch — colliding with it
        # would make that table's buckets fully correlated with the ANN
        # sketch instead of independent, silently weakening the
        # OR-construction's recall
        if tables > ANN_PLANE_FAMILY:
            raise ValueError(
                f"hash_family='portable' supports at most "
                f"{ANN_PLANE_FAMILY} tables (family "
                f"{ANN_PLANE_FAMILY} is reserved for the ANN sign "
                f"sketch); got tables={tables} — use the 'fast' family "
                "for larger seed-ensembled sketches"
            )

        def _coeff(t: int, p: int, d: Column) -> Column:
            return plane_coeff_col(t, p, d)

    else:
        from ..functions.spark_udfs import hyperplane_coeff

        def _coeff(t: int, p: int, d: Column) -> Column:
            return hyperplane_coeff(d, seed, t, p)

    def plane_sign(t: int, p: int) -> Column:
        coeffs = F.transform(dim_idx, lambda d: _coeff(t, p, d))
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    table_keys = F.array(
        *[
            F.concat(
                F.lit(f"e{t}:"), *[plane_sign(t, p) for p in range(planes)]
            )
            for t in range(tables)
        ]
    )
    # slim (id, bucket) relation: the sketch HOF computation is
    # interpreted and must run once (checkpoint before the thrice-
    # referencing salt plan); vectors are re-joined only for the exact
    # verification of deduped candidates
    sk = embeddings.select(
        F.col(id_col).alias("id"), F.explode(table_keys).alias("bucket")
    )
    if max_bucket_size:
        sk = sk.localCheckpoint(eager=True)
        sk = salt_oversized(sk, max_bucket_size, id_col="id", key_col="bucket")
    left = sk.select(F.col("id").alias("left_id"), "bucket")
    right = sk.select(F.col("id").alias("right_id"), "bucket")
    cand = (
        left.join(right, "bucket")
        .filter(F.col("left_id") < F.col("right_id"))
        .dropDuplicates(["left_id", "right_id"])
    )
    vl = embeddings.select(F.col(id_col).alias("left_id"), F.col(vec_col).alias("l_v"))
    vr = embeddings.select(F.col(id_col).alias("right_id"), F.col(vec_col).alias("r_v"))
    return (
        cand.join(vl, "left_id")
        .join(vr, "right_id")
        .withColumn("cosine", cosine_array(F.col("l_v"), F.col("r_v")))
        .filter(F.col("cosine") >= F.lit(float(threshold)))
        .select("left_id", "right_id", "cosine")
    )
