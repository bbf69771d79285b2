"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 as a (spark_fn, oracle_sql) pair over the driver's testdata
tables (TESTDATA.md; DuckDB pre-registers them as views).

Conventions (driver compare = row-count + schema + order-insensitive
value hash):
* every computed column is aliased identically on both sides;
* floats are rounded to 6 decimals on BOTH sides so JVM/DuckDB float
  formatting differences don't break the value hash;
* queries are sized for sf0.01 (documents/embeddings = hundreds of rows,
  lineitem ~60k) but written scale-independent.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.spark_udfs import (
    cosine_array,
    haversine_meters,
    jaro_winkler_udf,
    levenshtein_sim,
    whitespace_tokens,
)
from .functions.tokenize import WS_CLASS
from .operators import ann, dedup, textstats
from .operators.signatures import build_signatures

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _q(name: str, sql: str | None = None):
    def deco(fn):
        # validate the oracle BEFORE registering so a rejected
        # registration leaves no oracle-less query behind
        if sql is not None:
            # RE2's ``\s`` (ASCII, no \x0b) disagrees with both Java's
            # (ASCII incl. \x0b) and Python's (Unicode). Every oracle is
            # written with ``\s`` for readability and rewritten here to
            # the explicit WS_CLASS character set — the same class the
            # Spark side splits on (functions/tokenize.py) — so both
            # engines tokenize bit-identically on ANY input. The rewrite
            # is TEXTUAL, so guard its blind spots loudly: a ``\S`` (not
            # rewritten → keeps RE2's ASCII meaning) or a ``\s`` inside
            # a bracket class (``[^\s,]`` would nest into a different
            # set) must fail registration, not silently diverge.
            if r"\S" in sql:
                raise ValueError(
                    f"oracle {name!r}: \\S is not rewritten to the "
                    "portable class — use list_filter(regexp_split_to_"
                    "array(.., '\\s+'), t -> t <> '') instead"
                )
            if re.search(r"\[[^\]]*\\s", sql):
                raise ValueError(
                    f"oracle {name!r}: \\s inside a bracket class would "
                    "nest after the WS_CLASS rewrite — spell the class "
                    "out explicitly"
                )
            ORACLE[name] = sql.replace(r"\s", WS_CLASS)
        QUERIES[name] = fn
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(c) -> F.Column:
    return F.round(c, 6)


# =====================================================================
# §2.2 Projections / filters / predicates
# =====================================================================


@_q(
    "p2_filter_eq",
    """SELECT event_id, user_id, value FROM events WHERE event_type = 'click'""",
)
def p2_filter_eq(spark, sf_dir):
    """P2: equality filter + projection (reference load_yelp.py:13)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "value")
    )


@_q(
    "p3_label_filter",
    """SELECT label, count(*) AS n FROM embeddings
       WHERE label NOT IN (2, 3) GROUP BY label""",
)
def p3_label_filter(spark, sf_dir):
    """P3: drop unusable label classes (drop_label.py:24-41,
    baseline.py:124-125) then group-count."""
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(~F.col("label").isin(2, 3))
        .groupBy("label")
        .agg(F.count("*").alias("n"))
    )


@_q(
    "p4_inequality_filter",
    """SELECT o_orderkey, o_orderstatus FROM orders
       WHERE o_orderstatus <> 'O'""",
)
def p4_inequality_filter(spark, sf_dir):
    """P4: inequality filter (drop exact pairs, drop_label.py:43-73)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "O")
        .select("o_orderkey", "o_orderstatus")
    )


@_q(
    "p5_bbox_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
       WHERE l_quantity < 40 AND l_quantity > 10
         AND l_discount > 0.02 AND l_discount < 0.08""",
)
def p5_bbox_filter(spark, sf_dir):
    """P5: 4-way range predicate — the bounding-box restrict
    (label_data.py:130-156) over numeric columns; partition-prunable."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") < 40)
        & (F.col("l_quantity") > 10)
        & (F.col("l_discount") > 0.02)
        & (F.col("l_discount") < 0.08)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


@_q(
    "p6_point_update",
    """SELECT p_partkey,
              CASE WHEN p_brand = 'Brand#13' THEN 0 ELSE p_size END AS p_size_new
       FROM part""",
)
def p6_point_update(spark, sf_dir):
    """P6: keyed point update as an expression (edit_label.py:31-50) —
    no in-place mutation; MERGE INTO on Iceberg in production."""
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_brand") == "Brand#13", F.lit(0))
        .otherwise(F.col("p_size"))
        .alias("p_size_new"),
    )


@_q(
    "p7_substring_filter",
    """SELECT doc_id FROM documents WHERE text NOT LIKE '%vector%'""",
)
def p7_substring_filter(spark, sf_dir):
    """P7: substring-containment delete (edit_label.py:52-59)."""
    return (
        _t(spark, sf_dir, "documents")
        .filter(~F.col("text").contains("vector"))
        .select("doc_id")
    )


@_q(
    "p8_name_dedup",
    """SELECT p_brand, min(p_partkey) AS p_partkey FROM part GROUP BY p_brand""",
)
def p8_name_dedup(spark, sf_dir):
    """P8: keep one row per name (label_data.py:209-220) — min-id winner
    (deterministic, unlike the reference's keep-first loop)."""
    return (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.min("p_partkey").alias("p_partkey"))
    )


# =====================================================================
# §2.3 Joins
# =====================================================================


@_q(
    "j1_grid_band_join",
    """SELECT c.c_custkey, s.s_suppkey,
              round(abs(c.c_acctbal - s.s_acctbal), 6) AS bal_diff
       FROM customer c JOIN supplier s
         ON abs(c.c_acctbal - s.s_acctbal) < 100.0""",
)
def j1_grid_band_join(spark, sf_dir):
    """J1: the band (theta) join executed as a grid-cell equi-join —
    the reference's ±0.0002° box blocking (label_data.py:53-62) over a
    numeric axis: cell = floor(v/width); explode each left row to its
    3 neighbor cells; equi-join on cell; exact band predicate after.
    Catalyst turns the nested loop into a shuffled hash join."""
    width = 100.0
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.explode(
            F.array(
                F.floor(F.col("c_acctbal") / width) - 1,
                F.floor(F.col("c_acctbal") / width),
                F.floor(F.col("c_acctbal") / width) + 1,
            )
        ).alias("cell"),
    )
    supp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        F.floor(F.col("s_acctbal") / width).alias("cell"),
    )
    return (
        cust.join(supp, "cell")
        .filter(F.abs(F.col("c_acctbal") - F.col("s_acctbal")) < width)
        .select(
            "c_custkey",
            "s_suppkey",
            _r6(F.abs(F.col("c_acctbal") - F.col("s_acctbal"))).alias("bal_diff"),
        )
        .dropDuplicates(["c_custkey", "s_suppkey"])
    )


@_q(
    "j2_anti_join",
    """SELECT c_custkey FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')""",
)
def j2_anti_join(spark, sf_dir):
    """J2: already-labeled skip → left_anti join (label_data.py:63-69);
    against the urgent-orders subset so the anti side is non-trivial."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey")


@_q(
    "j4_tag_lookup_join",
    """SELECT o.o_orderkey, c.c_name, c.c_mktsegment
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
)
def j4_tag_lookup_join(spark, sf_dir):
    """J4: attribute lookup by key → broadcast equi-join
    (handle_df.py:96-111): customer side is dimension-sized."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_name", "c_mktsegment")


# =====================================================================
# §2.4 Aggregations
# =====================================================================


@_q(
    "a1_group_count",
    """SELECT event_type, count(*) AS n,
              round(max(value), 6) AS max_value,
              round(avg(value), 6) AS avg_value
       FROM events GROUP BY event_type""",
)
def a1_group_count(spark, sf_dir):
    """A1: class counts + per-class max/mean (handle_df.py:32-93)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            _r6(F.max("value")).alias("max_value"),
            _r6(F.avg("value")).alias("avg_value"),
        )
    )


@_q(
    "a2_corpus_distinct",
    """SELECT c_mktsegment AS name FROM customer
       UNION SELECT o_orderpriority FROM orders""",
)
def a2_corpus_distinct(spark, sf_dir):
    """A2: distinct union of two name columns (token_based_func.py:18-35)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_mktsegment").alias("name"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderpriority").alias("name"))
    return c.union(o).distinct()


@_q(
    "a3_document_frequency",
    """SELECT token, count(*) AS df FROM (
           SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
           FROM documents WHERE length(trim(text)) > 0
       ) WHERE token <> '' GROUP BY token""",
)
def a3_document_frequency(spark, sf_dir):
    """A3: document frequency with per-doc set semantics
    (test_hybrid_func.py:27-32)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.explode(F.array_distinct(whitespace_tokens(F.col("text")))).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )


@_q(
    "a4_count_vectorize",
    """SELECT doc_id, token, count(*) AS tf FROM (
           SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
           FROM documents WHERE length(trim(text)) > 0
       ) WHERE token <> '' GROUP BY doc_id, token""",
)
def a4_count_vectorize(spark, sf_dir):
    """A4: count-vectorizer document-term counts (token_based_func.py:64-95,
    CountVectorizer(lowercase=False, token_pattern=\\S+) semantics)."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(whitespace_tokens(F.col("text"))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )


@_q(
    "a5_tfidf_weights",
    """WITH df AS (
           SELECT token, count(*) AS df FROM (
               SELECT DISTINCT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
               FROM documents WHERE length(trim(text)) > 0
           ) WHERE token <> '' GROUP BY token
       ), n AS (SELECT count(*) AS corpus_size FROM documents)
       SELECT token, round(ln(corpus_size * 1.0 / df), 6) AS idf_log
       FROM df, n""",
)
def a5_tfidf_weights(spark, sf_dir):
    """A5: log-idf weights (token_based_func.py:97-128; idf form of
    test_hybrid_func.py:186)."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    df = a3_document_frequency(spark, sf_dir)
    return df.select(
        "token", _r6(F.log(F.lit(float(n)) / F.col("df"))).alias("idf_log")
    )


@_q(
    "a6_minmax_scan",
    """SELECT round(min(l_quantity), 6) AS min_qty, round(max(l_quantity), 6) AS max_qty,
              round(min(l_extendedprice), 6) AS min_price,
              round(max(l_extendedprice), 6) AS max_price
       FROM lineitem""",
)
def a6_minmax_scan(spark, sf_dir):
    """A6: global min/max scan (load_gov_NC.py:36-56)."""
    return _t(spark, sf_dir, "lineitem").agg(
        _r6(F.min("l_quantity")).alias("min_qty"),
        _r6(F.max("l_quantity")).alias("max_qty"),
        _r6(F.min("l_extendedprice")).alias("min_price"),
        _r6(F.max("l_extendedprice")).alias("max_price"),
    )


@_q(
    "a7_confusion_matrix",
    """SELECT
         CAST(sum(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
       FROM (
         SELECT CASE WHEN value >= 50 THEN 1 ELSE 0 END AS label,
                CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS pred
         FROM events
       )""",
)
def a7_confusion_matrix(spark, sf_dir):
    """A7: TP/FP/FN/TN in one partial+final agg
    (evaluation_metrics.py:65-79) over a deterministic synthetic
    labeling of the events table."""
    ev = _t(spark, sf_dir, "events").select(
        F.when(F.col("value") >= 50, 1).otherwise(0).alias("label"),
        F.when(F.col("event_id") % 2 == 0, 1).otherwise(0).alias("pred"),
    )
    y, p = F.col("label"), F.col("pred")
    return ev.agg(
        F.sum(F.when((y == 1) & (p == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((y == 0) & (p == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((y == 1) & (p == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((y == 0) & (p == 0), 1).otherwise(0)).alias("tn"),
    )


@_q(
    "a10_exact_similar_split",
    """SELECT (l_returnflag = l_linestatus) AS is_exact, count(*) AS n
       FROM lineitem GROUP BY (l_returnflag = l_linestatus)""",
)
def a10_exact_similar_split(spark, sf_dir):
    """A10: partition pairs by name-equality (handle_df.py:115-148)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy((F.col("l_returnflag") == F.col("l_linestatus")).alias("is_exact"))
        .agg(F.count("*").alias("n"))
    )


# =====================================================================
# §2.5 Set ops
# =====================================================================


@_q(
    "o1_union_all",
    """SELECT c_name AS name FROM customer
       UNION ALL SELECT s_name FROM supplier""",
)
def o1_union_all(spark, sf_dir):
    """O1: union-all of entity tables (baseline.py:117-123 concat)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_name").alias("name"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_name").alias("name"))
    return c.unionByName(s)


# =====================================================================
# §2.7 Similarity kernels (relational form)
# =====================================================================

_NATION_PAIRS_SQL = """
    SELECT a.n_name AS left_name, b.n_name AS right_name
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
"""


@_q(
    "k_char_kernels_pairs",
    f"""SELECT left_name, right_name,
              round(1.0 - levenshtein(left_name, right_name) * 1.0 /
                    greatest(length(left_name), length(right_name)), 6) AS lev_sim,
              round(1.0 - damerau_levenshtein(left_name, right_name) * 1.0 /
                    greatest(length(left_name), length(right_name)), 6) AS dl_sim,
              round(j + p * 0.1 * (1.0 - j), 6) AS jw_sim
       FROM (
         SELECT left_name, right_name,
                CASE WHEN left_name = right_name AND length(left_name) = 1 THEN 0.0
                     ELSE jaro_similarity(left_name, right_name) END AS j,
                CASE WHEN substr(left_name,1,4) = substr(right_name,1,4) THEN 4
                     WHEN substr(left_name,1,3) = substr(right_name,1,3) THEN 3
                     WHEN substr(left_name,1,2) = substr(right_name,1,2) THEN 2
                     WHEN substr(left_name,1,1) = substr(right_name,1,1) THEN 1
                     ELSE 0 END AS p
         FROM ({_NATION_PAIRS_SQL})
       )""",
)
def k_char_kernels_pairs(spark, sf_dir):
    """K1 + K2 + K3/K4 in one scan over all nation-name pairs (merged
    from the former k1_levenshtein_pairs / k2_damerau_pairs /
    k4_jaro_winkler_pairs rows so the registry stays within the driver's
    query budget — every kernel column is still hash-verified):

    * ``lev_sim`` — normalized levenshtein, native expression
      (character_based_func.py:15-34);
    * ``dl_sim`` — damerau-levenshtein similarity (OSA variant, marked
      unused by the reference at character_based_func.py:37-58); the
      pair set is verified OSA==DL so DuckDB's full-DL builtin is a
      valid oracle;
    * ``jw_sim`` — jaro-winkler with NLTK semantics (p=0.1, max_l=4,
      boost applied unconditionally — unlike DuckDB's >0.7-gated
      builtin, so the oracle composes jaro_similarity + the explicit
      prefix boost)."""
    from .functions.spark_udfs import damerau_sim_udf

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    a = n.select(F.col("n_nationkey").alias("ak"), F.col("n_name").alias("left_name"))
    b = n.select(F.col("n_nationkey").alias("bk"), F.col("n_name").alias("right_name"))
    return (
        a.crossJoin(b)
        .filter(F.col("ak") < F.col("bk"))
        .select(
            "left_name",
            "right_name",
            _r6(levenshtein_sim(F.col("left_name"), F.col("right_name"))).alias(
                "lev_sim"
            ),
            _r6(damerau_sim_udf(F.col("left_name"), F.col("right_name"))).alias(
                "dl_sim"
            ),
            _r6(jaro_winkler_udf(F.col("left_name"), F.col("right_name"))).alias(
                "jw_sim"
            ),
        )
    )


@_q(
    "k6_count_cosine_pairs",
    r"""WITH names AS (SELECT DISTINCT p_name AS name FROM part),
       tf AS (
         SELECT name, tok, count(*) AS tf
         FROM (SELECT name,
                      unnest(list_filter(regexp_split_to_array(trim(name), '\s+'), t -> t <> '')) AS tok
               FROM names)
         GROUP BY name, tok
       ),
       nrm AS (SELECT name, sqrt(sum(tf * tf * 1.0)) AS nrm FROM tf GROUP BY name),
       p AS (SELECT a.name AS left_name, b.name AS right_name
             FROM names a JOIN names b ON a.name < b.name),
       dot AS (
         SELECT p.left_name, p.right_name, sum(ta.tf * tb.tf * 1.0) AS dot
         FROM p
         JOIN tf ta ON ta.name = p.left_name
         JOIN tf tb ON tb.name = p.right_name AND tb.tok = ta.tok
         GROUP BY p.left_name, p.right_name
       )
       SELECT p.left_name, p.right_name,
              round(CASE WHEN na.nrm = 0 OR nb.nrm = 0 THEN 0.0
                         ELSE coalesce(d.dot, 0.0) / (na.nrm * nb.nrm) END, 6) AS cosine
       FROM p
       LEFT JOIN dot d ON d.left_name = p.left_name AND d.right_name = p.right_name
       JOIN nrm na ON na.name = p.left_name
       JOIN nrm nb ON nb.name = p.right_name""",
)
def k6_count_cosine_pairs(spark, sf_dir):
    """K6: whitespace-token count-vector cosine
    (token_based_func.py:174-222; CountVectorizer lowercase=False,
    token_pattern=\\S+ reduces to the pairwise formula) over distinct
    part-name pairs; oracle = token-count dot/norm arithmetic."""
    from .functions.spark_udfs import cosine_count_udf

    names = _t(spark, sf_dir, "part").select(F.col("p_name").alias("name")).distinct()
    a = names.select(F.col("name").alias("left_name"))
    b = names.select(F.col("name").alias("right_name"))
    return (
        a.crossJoin(b)
        .filter(F.col("left_name") < F.col("right_name"))
        .select(
            "left_name",
            "right_name",
            _r6(cosine_count_udf(F.col("left_name"), F.col("right_name"))).alias(
                "cosine"
            ),
        )
    )


@_q(
    "k5_jaccard_pairs",
    """WITH toks AS (
         SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\\s+')) AS t
         FROM documents WHERE length(trim(text)) > 0
       )
       SELECT a.doc_id AS left_id, b.doc_id AS right_id,
              round(len(list_intersect(a.t, b.t)) * 1.0 /
                    len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
       FROM toks a JOIN toks b ON a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 10""",
)
def k5_jaccard_pairs(spark, sf_dir):
    """K5: token-set jaccard (token_based_func.py:150-172, whitespace
    tokens) over a banded document self-join (id distance <= 10 keeps the
    pair count linear)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = docs.select(
        "doc_id", F.array_distinct(whitespace_tokens(F.col("text"))).alias("t")
    )
    a = toks.select(F.col("doc_id").alias("left_id"), F.col("t").alias("ta"))
    b = toks.select(F.col("doc_id").alias("right_id"), F.col("t").alias("tb"))
    joined = a.crossJoin(b).filter(
        (F.col("left_id") < F.col("right_id"))
        & (F.col("right_id") - F.col("left_id") <= 10)
    )
    inter = F.size(F.array_intersect("ta", "tb"))
    union = F.size(F.array_union("ta", "tb"))
    return joined.select(
        "left_id", "right_id", _r6(inter / union).alias("jaccard")
    )


@_q(
    "k16_haversine",
    """SELECT event_id,
              round(2 * 6371000.0 * atan2(sqrt(a), sqrt(1 - a)), 6) AS dist_m
       FROM (
         SELECT event_id,
                pow(sin(radians(lat2 - lat1) / 2), 2)
                + cos(radians(lat1)) * cos(radians(lat2))
                  * pow(sin(radians(lon2 - lon1) / 2), 2) AS a
         FROM (
           SELECT event_id,
                  value % 80 AS lat1, user_id % 170 AS lon1,
                  (value + 1.5) % 80 AS lat2, (user_id + 2) % 170 AS lon2
           FROM events
         )
       )""",
)
def k16_haversine(spark, sf_dir):
    """K16: haversine meters, R=6371 km (mpu semantics,
    label_data.py:105-128), native trig expression over deterministic
    pseudo-coordinates derived from the events table."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        (F.col("value") % 80).alias("lat1"),
        (F.col("user_id") % 170).cast("double").alias("lon1"),
        ((F.col("value") + 1.5) % 80).alias("lat2"),
        ((F.col("user_id") + 2) % 170).cast("double").alias("lon2"),
    )
    return ev.select(
        "event_id",
        _r6(
            haversine_meters(
                F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")
            )
        ).alias("dist_m"),
    )


@_q(
    "k17_token_features",
    """SELECT doc_id,
              len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS tlen,
              n_chars
       FROM documents""",
)
def k17_token_features(spark, sf_dir):
    """K17: token-count features (ml_similarity_metrics.py:413-431)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(whitespace_tokens(F.col("text"))).alias("tlen"),
        "n_chars",
    )


@_q(
    "k20_classify",
    """SELECT CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS pred, count(*) AS n
       FROM events GROUP BY 1""",
)
def k20_classify(spark, sf_dir):
    """K20: threshold classification (evaluation_metrics.py:11-34)."""
    return (
        _t(spark, sf_dir, "events")
        .select((F.col("value") >= 50.0).cast("int").alias("pred"))
        .groupBy("pred")
        .agg(F.count("*").alias("n"))
    )


# =====================================================================
# Training-data operators: dedup family / text stats / ANN
# =====================================================================


@_q(
    "dedup_exact",
    """SELECT md5(text) AS content_key, min(doc_id) AS doc_id, count(*) AS dup_count
       FROM documents GROUP BY md5(text)""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (SURVEY training-data ops)."""
    out = dedup.exact_dedup(_t(spark, sf_dir, "documents"))
    return out.select("content_key", "doc_id", "dup_count")


def _minhash_oracle_sql() -> str:
    """DuckDB replica of the ENTIRE portable MinHash-LSH pipeline —
    shingles → 64 affine double-hashes → 16 band keys → bucket join →
    exact-Jaccard verify. Bit-identical to the Spark side because the
    portable hash family is pure modular arithmetic both engines
    evaluate exactly (functions/portable_hash.py)."""
    from .functions import portable_hash as _ph

    h1 = _ph.sql_poly_hash("sh", _ph.B1, _ph.M1)
    h2 = _ph.sql_poly_hash("sh", _ph.B2, _ph.M2)
    return f"""
WITH docs AS (
  SELECT doc_id, toks FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
    FROM documents
  ) WHERE len(toks) >= 3
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles
  FROM docs
),
shh AS (
  SELECT doc_id, {h1} AS h1, {h2} AS h2
  FROM (SELECT doc_id, unnest(shingles) AS sh FROM sh)
),
mh AS (
  SELECT doc_id, j, min({_ph.sql_affine('h1', 'h2', 'j')}) AS mh
  FROM shh CROSS JOIN range(64) t(j) GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, 'b' || (j // 4) || ':' || string_agg(mh, ':' ORDER BY j) AS bucket
  FROM mh GROUP BY doc_id, (j // 4)
),
cand AS (
  SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id
  FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT left_id, right_id, round(jacc, 6) AS jaccard FROM (
  SELECT c.left_id, c.right_id,
         len(list_intersect(x.shingles, y.shingles)) * 1.0 /
         len(list_distinct(list_concat(x.shingles, y.shingles))) AS jacc
  FROM cand c
  JOIN sh x ON x.doc_id = c.left_id
  JOIN sh y ON y.doc_id = c.right_id
) WHERE jacc >= 0.5"""


@_q("dedup_minhash_lsh", _minhash_oracle_sql())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-dup with the full banding pipeline replicated in
    the DuckDB oracle via ``hash_family='portable'`` (64 hashes / 16
    bands of 4 / exact verify). Salting off at this scale so banding
    semantics are exact; docs with <3 tokens excluded on both sides
    (mirrors dedup_ngram_jaccard's contract)."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.minhash_lsh_pairs(
        docs, threshold=0.5, hash_family="portable", max_bucket_size=0,
        min_tokens=3,
    )
    return out.select("left_id", "right_id", _r6(F.col("jaccard")).alias("jaccard"))


def _simhash_oracle_sql() -> str:
    """Brute-force DuckDB recomputation of the portable 60-bit SimHash:
    all doc pairs within hamming<=3. The Spark side generates candidates
    by the Manku pigeonhole join, which is EXHAUSTIVE when unsalted —
    equality against brute force therefore also proves the pigeonhole
    recall guarantee on this data."""
    from .functions import portable_hash as _ph

    h1 = _ph.sql_poly_hash("tok", _ph.B1, _ph.M1)
    h2 = _ph.sql_poly_hash("tok", _ph.B2, _ph.M2)
    bit = f"{_ph.sql_affine('h1', 'h2', 'j')} >= {_ph.HALF}"
    return f"""
WITH docs AS (
  SELECT doc_id, toks FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
    FROM documents
  ) WHERE len(toks) > 0
),
tokh AS (
  SELECT doc_id, tok, count(*) AS cnt, {h1} AS h1, {h2} AS h2
  FROM (SELECT doc_id, unnest(toks) AS tok FROM docs) GROUP BY doc_id, tok
),
votes AS (
  SELECT doc_id, j, sum(CASE WHEN {bit} THEN cnt ELSE -cnt END) AS v
  FROM tokh CROSS JOIN range(60) t(j) GROUP BY doc_id, j
),
fp AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << j::INT) ELSE 0 END)::BIGINT AS fp
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS left_id, b.doc_id AS right_id,
       bit_count(xor(a.fp, b.fp))::INT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 3"""


@_q("dedup_simhash", _simhash_oracle_sql())
def dedup_simhash(spark, sf_dir):
    """Portable 60-bit SimHash near-dup; unsalted pigeonhole candidates
    == DuckDB brute force (the oracle proves both the fingerprint math
    and the candidate-generation recall)."""
    out = dedup.simhash_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, hash_family="portable"
    )
    return out.select(
        "left_id", "right_id", F.col("hamming").cast("int").alias("hamming")
    )


@_q(
    "dedup_ngram_jaccard",
    """WITH sh AS (
         SELECT doc_id,
                list_distinct(list_transform(range(1, len(toks) - 1),
                    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS shingles,
                toks[1] || ' ' || coalesce(toks[2], '') AS bkey
         FROM (
           SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
           FROM documents WHERE length(trim(text)) > 0
         ) WHERE len(toks) >= 3
       )
       SELECT a.doc_id AS left_id, b.doc_id AS right_id,
              round(len(list_intersect(a.shingles, b.shingles)) * 1.0 /
                    len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard
       FROM sh a JOIN sh b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
       WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0 /
             len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Word-3-gram jaccard near-dup pairs, blocked on the 2-token prefix.
    Docs with <3 tokens are excluded on both sides (no full shingle)."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.ngram_jaccard_pairs(
        docs, threshold=0.2, n=3, band_tokens=2, min_tokens=3
    )
    return out.select("left_id", "right_id", _r6(F.col("jaccard")).alias("jaccard"))


@_q(
    "dedup_embedding_cosine",
    """SELECT a.vec_id AS left_id, b.vec_id AS right_id,
              round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
       FROM embeddings a JOIN embeddings b
         ON a.label = b.label AND b.vec_id - a.vec_id BETWEEN 1 AND 25
       WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.2""",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup over a banded same-label self-join
    (band keeps the comparison count linear; the unbanded scale path is
    dedup.embedding_near_dup's LSH buckets, exercised rows-only)."""
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("left_id"),
        F.col("label").alias("la"),
        F.col("embedding").alias("ea"),
    )
    b = emb.select(
        F.col("vec_id").alias("right_id"),
        F.col("label").alias("lb"),
        F.col("embedding").alias("eb"),
    )
    joined = a.join(
        b,
        (F.col("la") == F.col("lb"))
        & (F.col("right_id") - F.col("left_id") >= 1)
        & (F.col("right_id") - F.col("left_id") <= 25),
    )
    cos = cosine_array(
        F.col("ea").cast("array<double>"), F.col("eb").cast("array<double>")
    )
    return (
        joined.withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.2)
        .select("left_id", "right_id", _r6(F.col("cosine")).alias("cosine"))
    )


def _embedding_lsh_oracle_sql() -> str:
    """DuckDB replica of the portable hyperplane-LSH pipeline: 8 tables
    × 8 planes of affine-PRNG coefficients, sequential-fold dot products
    (same IEEE association order as Spark's F.aggregate → identical
    signs), bucket join, exact-cosine verify."""
    from .functions import portable_hash as _ph

    dot = _ph.sql_plane_dot("v", "t", "p")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
signs AS (
  SELECT vec_id, t, p, CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END AS s
  FROM e CROSS JOIN range(8) tt(t) CROSS JOIN range(8) pp(p)
),
keys AS (
  SELECT vec_id, 'e' || t || ':' || string_agg(s, '' ORDER BY p) AS bucket
  FROM signs GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT a.vec_id AS left_id, b.vec_id AS right_id
  FROM keys a JOIN keys b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT left_id, right_id, round(cos, 6) AS cosine FROM (
  SELECT c.left_id, c.right_id, list_cosine_similarity(x.v, y.v) AS cos
  FROM cand c JOIN e x ON x.vec_id = c.left_id JOIN e y ON y.vec_id = c.right_id
) WHERE cos >= 0.3"""


@_q("dedup_embedding_lsh", _embedding_lsh_oracle_sql())
def dedup_embedding_lsh(spark, sf_dir):
    """Hyperplane-LSH near-dup (8 tables × 8 planes OR-construction)
    with ``hash_family='portable'`` so the DuckDB oracle re-derives the
    buckets exactly. Threshold 0.3 on this data so the check is
    non-vacuous (the testdata embeddings have no ground-truth pairs
    above 0.9 — verified by brute force); recall vs brute force is
    additionally pinned by tests/test_dedup_textstats_ann.py on a
    planted near-dup fixture."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return dedup.embedding_near_dup(
        emb, threshold=0.3, hash_family="portable", max_bucket_size=0
    ).select("left_id", "right_id", _r6(F.col("cosine")).alias("cosine"))


def text_token_counts(spark, sf_dir):
    """Token counting, both flavors in one scan: whitespace token count
    (K17-style) and the BPE-ish subword count (letter/digit runs charged
    ceil(len/4), punctuation one each). NOT registered as a driver
    oracle row since round 5: its token math duplicates
    ``text_quality_score``'s oracled expressions, and the 50-query
    budget slot went to ``ann_kmeans_topk`` (the one computed operator
    that had no DuckDB row). Still pinned by
    tests/test_oracle_parity.py::test_text_token_counts_oracle with the
    identical DuckDB SQL."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        textstats.token_count(F.col("text")).alias("n_tokens"),
        textstats.bpe_ish_token_count(F.col("text")).alias("n_bpe"),
    )


@_q(
    "text_fingerprint",
    """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       FROM documents""",
)
def text_fingerprint(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", textstats.fingerprint(F.col("text")).alias("fp")
    )


def _lang_id_oracle_sql() -> str:
    """Generated from the SAME marker dict as the Spark expression so the
    two can never drift; argmax tie-break = (score DESC, lang DESC),
    matching Spark's array_max over (s, lg) structs."""
    score_cols = ",\n              ".join(
        "len(list_filter(t, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in words)
        + f"], x))) AS {lang}"
        for lang, words in textstats._LANG_MARKERS.items()
    )
    langs = ", ".join(textstats._LANG_MARKERS)
    return f"""WITH toks AS (
         SELECT doc_id, regexp_split_to_array(lower(text), '[^a-zà-ÿäöüß]+') AS t
         FROM documents
       ),
       wide AS (
         SELECT doc_id,
              {score_cols}
         FROM toks
       ),
       long AS (
         SELECT doc_id, lang, score FROM wide
         UNPIVOT (score FOR lang IN ({langs}))
       ),
       best AS (
         SELECT doc_id, lang, score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, lang DESC) AS rk
         FROM long
       )
       SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang
       FROM best WHERE rk = 1"""


@_q(
    "text_quality_score",
    """WITH f AS (
         SELECT doc_id,
                length(text) AS n_chars,
                len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
                CASE WHEN length(text) > 0
                     THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text)
                     ELSE 0.0 END AS alpha_ratio,
                CASE WHEN length(text) > 0
                     THEN length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\r\\f\\v]', '', 'g')) * 1.0 / length(text)
                     ELSE 0.0 END AS punct_ratio,
                len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                    w -> list_contains(['the','and','of','to','is','in','that','it','was','for'], w))) AS stop_hits
         FROM documents
       ),
       r AS (
         SELECT doc_id, n_tokens, alpha_ratio, punct_ratio,
                CASE WHEN n_tokens > 0 THEN stop_hits * 1.0 / n_tokens ELSE 0.0 END AS stopword_ratio,
                CASE WHEN n_tokens > 0 THEN n_chars * 1.0 / n_tokens ELSE 0.0 END AS mean_word_len
         FROM f
       )
       SELECT doc_id,
              round(alpha_ratio, 6) AS alpha_ratio,
              round(punct_ratio, 6) AS punct_ratio,
              round(stopword_ratio, 6) AS stopword_ratio,
              round(mean_word_len, 6) AS mean_word_len,
              round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE
                    least(n_tokens / 20.0, 1.0) * 0.3
                    + alpha_ratio * 0.3
                    + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.2
                    + least(stopword_ratio * 4.0, 1.0) * 0.2 END, 6) AS quality_score
       FROM r""",
)
def text_quality_score(spark, sf_dir):
    """Full quality-feature surface: alpha/punct ratios (absorbed from
    the former text_quality row so the registry stays within the
    driver's query budget), stopword ratio, mean word length, and the
    composite [0,1] quality score (the en-marker list in the oracle is
    the same frozen _LANG_MARKERS['en'])."""
    q = textstats.quality_features(_t(spark, sf_dir, "documents"))
    return q.select(
        "doc_id",
        _r6(F.col("alpha_ratio")).alias("alpha_ratio"),
        _r6(F.col("punct_ratio")).alias("punct_ratio"),
        _r6(F.col("stopword_ratio")).alias("stopword_ratio"),
        _r6(F.col("mean_word_len")).alias("mean_word_len"),
        _r6(F.col("quality_score")).alias("quality_score"),
    )


@_q("text_lang_id", _lang_id_oracle_sql())
def text_lang_id(spark, sf_dir):
    return _t(spark, sf_dir, "documents").select(
        "doc_id", textstats.lang_id(F.col("text")).alias("lang")
    )


@_q(
    "ann_brute_topk",
    """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 3),
       scored AS (
         SELECT q.query_id, c.vec_id,
                list_cosine_similarity(c.embedding::DOUBLE[], q.qv) AS cos_raw
         FROM embeddings c, q
       ),
       ranked AS (
         SELECT query_id, vec_id, round(cos_raw, 6) AS cosine,
                row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
         FROM scored
       )
       SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5""",
)
def ann_brute_topk(spark, sf_dir):
    """Brute-force cosine top-k (queries = first 3 vectors)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ann.brute_force_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", _r6(F.col("cosine")).alias("cosine"), "rank"
    )


def _ann_ivf_oracle_sql() -> str:
    """DuckDB replica of the portable LSH-IVF search: 4-plane sign
    bucket per point, probes = own bucket + first single-bit flip
    (multiprobe=1), candidates ranked by raw cosine with vec_id
    tie-break (same ordering as ann._ranked_topk / ann_brute_topk)."""
    from .functions import portable_hash as _ph
    from .operators.ann import ANN_PLANE_FAMILY

    bits = " || ".join(
        f"(CASE WHEN ({_ph.sql_plane_dot('v', str(ANN_PLANE_FAMILY), str(p))}) >= 0"
        " THEN '1' ELSE '0' END)"
        for p in range(4)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
ck AS (SELECT vec_id, v, {bits} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM ck WHERE vec_id < 3),
probes AS (
  SELECT query_id, qv, bucket FROM q
  UNION ALL
  SELECT query_id, qv,
         (CASE WHEN substr(bucket, 1, 1) = '1' THEN '0' ELSE '1' END) ||
         substr(bucket, 2) AS bucket
  FROM q
),
cand AS (
  SELECT DISTINCT p.query_id, c.vec_id, p.qv, c.v
  FROM ck c JOIN probes p ON c.bucket = p.bucket
),
ranked AS (
  SELECT query_id, vec_id, round(cos_raw, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
  FROM (SELECT query_id, vec_id, list_cosine_similarity(v, qv) AS cos_raw FROM cand)
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5"""


@_q("ann_ivf_topk", _ann_ivf_oracle_sql())
def ann_ivf_topk(spark, sf_dir):
    """LSH-IVF top-k with ``hash_family='portable'`` — the oracle
    replicates bucket assignment, multiprobe flips, and ranking exactly
    (not just a recall bound)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ann.ivf_topk(
        emb, queries, k=5, planes=4, multiprobe=1, hash_family="portable"
    )
    return out.select(
        "query_id", "vec_id", _r6(F.col("cosine")).alias("cosine"), "rank"
    )


def _sql_sq_dist(a: str, b: str) -> str:
    """Sequential left fold of Σ (a[d]-b[d])² — the same association
    order as ann._cell_dists' F.aggregate, so the IEEE distance (and
    therefore the argmin cell choice) is bit-identical across engines
    (same pattern as portable_hash.sql_plane_dot)."""
    term = f"(({a})[d+1] - ({b})[d+1]) * (({a})[d+1] - ({b})[d+1])"
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(range(len({a})), d -> {term})), "
        "(acc, x) -> acc + x)"
    )


def _ann_kmeans_oracle_sql() -> str:
    """DuckDB replica of the IVF centroid search (ann.ivf_centroid_topk,
    the search path of the spark.ml k-means ANN) under a deterministic
    coarse quantizer: centroids = the first 8 corpus embeddings.
    Assignment = argmin squared euclidean (tie-break lowest cell),
    probes = 2 nearest cells per query, candidates ranked by raw cosine
    with vec_id tie-break — bucket choice, probe choice, and ranking all
    replicated exactly, not just a recall bound."""
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT CAST(vec_id AS INT) AS cell, v AS cv FROM e WHERE vec_id < 8),
ad AS (
  SELECT e.vec_id, e.v, c.cell, {_sql_sq_dist('e.v', 'c.cv')} AS dist
  FROM e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT vec_id, v, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cell ASC) AS rn
    FROM ad
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 3),
qd AS (
  SELECT q.query_id, q.qv, c.cell, {_sql_sq_dist('q.qv', 'c.cv')} AS dist
  FROM q CROSS JOIN cent c
),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT query_id, qv, cell,
           row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, cell ASC) AS rn
    FROM qd
  ) WHERE rn <= 2
),
cand AS (
  SELECT p.query_id, a.vec_id, p.qv, a.v
  FROM assigned a JOIN probes p ON a.cell = p.cell
),
ranked AS (
  SELECT query_id, vec_id, round(cos_raw, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_raw DESC, vec_id ASC) AS rank
  FROM (SELECT query_id, vec_id, list_cosine_similarity(v, qv) AS cos_raw FROM cand)
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5"""


@_q("ann_kmeans_topk", _ann_kmeans_oracle_sql())
def ann_kmeans_topk(spark, sf_dir):
    """IVF search path of the k-means ANN (ann.ivf_kmeans_topk) under a
    deterministic coarse quantizer: centroids = the first 8 corpus
    embeddings (a 0-iteration k-means with deterministic seeding), so
    the oracle re-derives cell assignment, probe choice, and ranking
    exactly. The spark.ml-fitted quantizer feeds the SAME search
    (ann.ivf_centroid_topk); fitted-vs-explicit parity and recall vs
    brute force are pinned by tests/test_dedup_textstats_ann.py."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    centers = [
        list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    ]
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = ann.ivf_centroid_topk(emb, queries, centers, k=5, n_probe=2)
    return out.select(
        "query_id", "vec_id", _r6(F.col("cosine")).alias("cosine"), "rank"
    )


# =====================================================================
# Pipeline stages over a transcripts view derived from documents
# (deterministic in both engines: conv_id = doc_id // 10,
#  turn_idx = doc_id % 10)
# =====================================================================


def _doc_transcripts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        (F.col("doc_id") / 10).cast("long").cast("string").alias("conv_id"),
        (F.col("doc_id") % 10).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )


@_q(
    "sig_signatures_stage",
    """SELECT CAST(doc_id // 10 AS VARCHAR) AS conv_id,
              string_agg(text, ' ' ORDER BY doc_id % 10) AS sig_text,
              count(*) AS n_turns
       FROM documents GROUP BY doc_id // 10""",
)
def sig_signatures_stage(spark, sf_dir):
    """Signature build (stable turn ordering) over a transcripts view
    derived from documents; oracle = ordered string_agg."""
    sig = build_signatures(_doc_transcripts(spark, sf_dir), with_tokens=False)
    return sig.select("conv_id", "sig_text", F.col("n_turns").cast("long").alias("n_turns"))


@_q(
    "block_first_token_pairs",
    """WITH k AS (
         SELECT CAST(doc_id // 10 AS VARCHAR) AS conv_id,
                split_part(string_agg(text, ' ' ORDER BY doc_id % 10), ' ', 1) AS key
         FROM documents GROUP BY doc_id // 10
       )
       SELECT a.conv_id AS left_id, b.conv_id AS right_id
       FROM k a JOIN k b ON a.key = b.key AND a.conv_id < b.conv_id""",
)
def block_first_token_pairs(spark, sf_dir):
    """First-token blocking self-join → deduped ordered pairs (the J1
    blocking pattern with a token key instead of a spatial cell)."""
    sig = build_signatures(_doc_transcripts(spark, sf_dir), with_tokens=False)
    keyed = sig.select(
        "conv_id", F.element_at(whitespace_tokens(F.col("sig_text")), 1).alias("key")
    )
    a = keyed.select(F.col("conv_id").alias("left_id"), "key")
    b = keyed.select(F.col("conv_id").alias("right_id"), "key")
    return (
        a.join(b, "key")
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
        .dropDuplicates(["left_id", "right_id"])
    )


@_q(
    "score_block_pairs_lev",
    """WITH sig AS (
         SELECT CAST(doc_id // 10 AS VARCHAR) AS conv_id,
                string_agg(text, ' ' ORDER BY doc_id % 10) AS sig_text
         FROM documents GROUP BY doc_id // 10
       ), k AS (
         SELECT conv_id, sig_text, split_part(sig_text, ' ', 1) AS key FROM sig
       )
       SELECT a.conv_id AS left_id, b.conv_id AS right_id,
              round(1.0 - levenshtein(substr(a.sig_text, 1, 80), substr(b.sig_text, 1, 80)) * 1.0 /
                    greatest(length(substr(a.sig_text, 1, 80)), length(substr(b.sig_text, 1, 80))), 6) AS lev_sim
       FROM k a JOIN k b ON a.key = b.key AND a.conv_id < b.conv_id""",
)
def score_block_pairs_lev(spark, sf_dir):
    """Blocking + native levenshtein scoring end-to-end (prefix-80 texts
    keep the O(n·m) DP bounded identically in both engines)."""
    sig = build_signatures(_doc_transcripts(spark, sf_dir), with_tokens=False)
    keyed = sig.select(
        "conv_id",
        F.col("sig_text"),
        F.element_at(whitespace_tokens(F.col("sig_text")), 1).alias("key"),
    )
    a = keyed.select(
        F.col("conv_id").alias("left_id"), F.col("sig_text").alias("la"), "key"
    )
    b = keyed.select(
        F.col("conv_id").alias("right_id"), F.col("sig_text").alias("lb"), "key"
    )
    la80 = F.substring(F.col("la"), 1, 80)
    lb80 = F.substring(F.col("lb"), 1, 80)
    return (
        a.join(b, "key")
        .filter(F.col("left_id") < F.col("right_id"))
        .select(
            "left_id",
            "right_id",
            _r6(levenshtein_sim(la80, lb80)).alias("lev_sim"),
        )
    )


@_q(
    "er_components",
    """WITH RECURSIVE k AS (
         SELECT CAST(doc_id // 10 AS VARCHAR) AS conv_id,
                split_part(string_agg(text, ' ' ORDER BY doc_id % 10), ' ', 1) AS key
         FROM documents GROUP BY doc_id // 10
       ),
       e AS (
         SELECT a.conv_id AS src, b.conv_id AS dst
         FROM k a JOIN k b ON a.key = b.key AND a.conv_id <> b.conv_id
       ),
       walk(node, reach) AS (
         SELECT conv_id, conv_id FROM k
         UNION
         SELECT w.node, e.dst FROM walk w JOIN e ON w.reach = e.src
       )
       SELECT node AS conv_id, min(reach) AS component_id
       FROM walk GROUP BY node""",
)
def er_components(spark, sf_dir):
    """Connected components (alternating star contraction) over
    first-token blocking edges of the derived transcripts. Oracle:
    reachability closure via WITH RECURSIVE + min-label per node —
    component_id = lexicographic min conv_id in the component on BOTH
    engines (string ordering)."""
    from .operators.clustering import components

    pairs = block_first_token_pairs(spark, sf_dir)
    edges = pairs.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
    sig = build_signatures(_doc_transcripts(spark, sf_dir), with_tokens=False)
    return components(sig.select(F.col("conv_id")), edges)


# =====================================================================
# Additional §2 coverage: audit scans (A9), soft-TFIDF family (K7/K8),
# reversed coordinate split (O2/K19)
# =====================================================================


@_q(
    "a9_fpfn_audit",
    """SELECT 'fp' AS kind, event_id, value FROM events
       WHERE value < 50 AND event_id % 2 = 0
       UNION ALL
       SELECT 'fn' AS kind, event_id, value FROM events
       WHERE value >= 50 AND event_id % 2 = 1""",
)
def a9_fpfn_audit(spark, sf_dir):
    """A9: false-positive + false-negative audit scans (baseline.py:
    66-82) in one query tagged by ``kind`` — label-0 rows whose
    prediction cleared the threshold ('fp') and label-1 rows below it
    ('fn'), deterministic labeling as in a7_confusion_matrix. (Merged
    from the former a9_fp_audit/a9_fn_audit pair so the registry stays
    within the driver's query budget.)"""
    ev = _t(spark, sf_dir, "events")
    fp = ev.filter((F.col("value") < 50) & (F.col("event_id") % 2 == 0)).select(
        F.lit("fp").alias("kind"), "event_id", "value"
    )
    fn = ev.filter((F.col("value") >= 50) & (F.col("event_id") % 2 == 1)).select(
        F.lit("fn").alias("kind"), "event_id", "value"
    )
    return fp.unionByName(fn)


@_q(
    "o2_reversed_split",
    """SELECT event_id,
              CAST(split_part(pt, '/', 2) AS DOUBLE) AS latitude,
              CAST(split_part(pt, '/', 1) AS DOUBLE) AS longitude
       FROM (SELECT event_id,
                    CAST(user_id % 170 AS VARCHAR) || '/' || CAST(event_id % 80 AS VARCHAR) AS pt
             FROM events)""",
)
def o2_reversed_split(spark, sf_dir):
    """O2/K19: reversed '/'-split of a location string into lat/lon
    (load_osm.py:77-83 reverses the split order)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(
            (F.col("user_id") % 170).cast("string"),
            F.lit("/"),
            (F.col("event_id") % 80).cast("string"),
        ).alias("pt"),
    )
    parts = F.split(F.col("pt"), "/")
    return ev.select(
        "event_id",
        F.element_at(parts, 2).cast("double").alias("latitude"),
        F.element_at(parts, 1).cast("double").alias("longitude"),
    )


# shared CTE fragments for the soft-TFIDF oracles: tokenization must be
# byte-identical to whitespace_tokens(lower(trim(name))) on the Spark
# side. The identical-1-char CASE preserves the NLTK quirk the kernels
# implement (match bound max//2-1 = -1 → jaro("7","7") = 0, jw = 0.1)
# where DuckDB's jaro_similarity returns 1.0 — without it the oracle
# would diverge on any corpus with shared single-char tokens (initials,
# digits).
_JW_SQL = """
  SELECT tx, ty, j + pl * 0.1 * (1.0 - j) AS score
  FROM (
    SELECT tx, ty,
           CASE WHEN tx = ty AND length(tx) = 1 THEN 0.0
                ELSE jaro_similarity(tx, ty) END AS j,
           CASE WHEN substr(tx,1,4) = substr(ty,1,4) THEN 4
                WHEN substr(tx,1,3) = substr(ty,1,3) THEN 3
                WHEN substr(tx,1,2) = substr(ty,1,2) THEN 2
                WHEN substr(tx,1,1) = substr(ty,1,1) THEN 1
                ELSE 0 END AS pl
    FROM term_pairs
  )
  WHERE j + pl * 0.1 * (1.0 - j) >= 0.7
"""


@_q(
    "k8_softtfidf_pairs",
    r"""WITH names AS (
         SELECT DISTINCT p_name AS name,
                list_filter(regexp_split_to_array(lower(trim(p_name)), '\s+'), t -> t <> '') AS toks
         FROM part
       ),
       n AS (SELECT count(*) AS cs FROM names),
       df AS (
         SELECT token, count(*) AS df FROM (
           SELECT DISTINCT name, unnest(toks) AS token FROM names
         ) GROUP BY token
       ),
       p AS (
         SELECT a.name AS left_name, b.name AS right_name, a.toks AS lt, b.toks AS rt
         FROM names a JOIN names b ON a.name < b.name
       ),
       xt AS (
         SELECT left_name, right_name, tx, count(*) AS tfx
         FROM (SELECT left_name, right_name, unnest(lt) AS tx FROM p)
         GROUP BY left_name, right_name, tx
       ),
       yt AS (
         SELECT left_name, right_name, ty, count(*) AS tfy, min(pos) AS pos
         FROM (SELECT left_name, right_name, unnest(rt) AS ty,
                      unnest(range(1, len(rt)+1)) AS pos FROM p)
         GROUP BY left_name, right_name, ty
       ),
       term_pairs AS (SELECT DISTINCT xt.tx, yt.ty FROM xt JOIN yt USING (left_name, right_name)),
       scored_tp AS (%(jw)s),
       winner AS (
         SELECT left_name, right_name, tx, tfx, ty, tfy, score
         FROM (
           SELECT xt.left_name, xt.right_name, xt.tx, xt.tfx, yt.ty, yt.tfy, s.score,
                  row_number() OVER (PARTITION BY xt.left_name, xt.right_name, xt.tx
                                     ORDER BY s.score DESC, yt.pos ASC) AS rn
           FROM xt JOIN yt USING (left_name, right_name)
           JOIN scored_tp s ON s.tx = xt.tx AND s.ty = yt.ty
         ) WHERE rn = 1
       ),
       num AS (
         SELECT w.left_name, w.right_name,
                sum((n.cs * 1.0 / dx.df) * w.tfx
                    * (n.cs * 1.0 / coalesce(dy.df, 1)) * w.tfy * w.score) AS numerator
         FROM winner w
         JOIN df dx ON dx.token = w.tx
         LEFT JOIN df dy ON dy.token = w.ty
         CROSS JOIN n
         GROUP BY w.left_name, w.right_name
       ),
       union_terms AS (
         SELECT coalesce(x.left_name, y.left_name) AS left_name,
                coalesce(x.right_name, y.right_name) AS right_name,
                coalesce(x.tx, y.ty) AS token,
                coalesce(x.tfx, 0) AS tf_x, coalesce(y.tfy, 0) AS tf_y
         FROM xt x FULL JOIN yt y
           ON x.left_name = y.left_name AND x.right_name = y.right_name AND x.tx = y.ty
       ),
       den AS (
         SELECT u.left_name, u.right_name,
                sum(pow(n.cs * 1.0 / d.df * u.tf_x, 2)) AS den_x,
                sum(pow(n.cs * 1.0 / d.df * u.tf_y, 2)) AS den_y
         FROM union_terms u JOIN df d ON d.token = u.token CROSS JOIN n
         GROUP BY u.left_name, u.right_name
       ),
       tnum AS (
         SELECT u.left_name, u.right_name,
                sum((ln(n.cs * 1.0 / d.df) * CASE WHEN u.tf_x > 0 THEN ln(u.tf_x + 1.0) ELSE 0.0 END)
                  * (ln(n.cs * 1.0 / d.df) * CASE WHEN u.tf_y > 0 THEN ln(u.tf_y + 1.0) ELSE 0.0 END)) AS t_num,
                sum(pow(ln(n.cs * 1.0 / d.df) * CASE WHEN u.tf_x > 0 THEN ln(u.tf_x + 1.0) ELSE 0.0 END, 2)) AS t_den_x,
                sum(pow(ln(n.cs * 1.0 / d.df) * CASE WHEN u.tf_y > 0 THEN ln(u.tf_y + 1.0) ELSE 0.0 END, 2)) AS t_den_y
         FROM union_terms u JOIN df d ON d.token = u.token CROSS JOIN n
         GROUP BY u.left_name, u.right_name
       )
       SELECT p.left_name, p.right_name,
              round(CASE WHEN p.lt = p.rt THEN 1.0
                         WHEN len(p.lt) = 0 OR len(p.rt) = 0 THEN 0.0
                         WHEN coalesce(t.t_num, 0.0) = 0.0 THEN 0.0
                         ELSE t.t_num / (sqrt(t.t_den_x) * sqrt(t.t_den_y)) END, 6) AS tfidf,
              round(CASE WHEN p.lt = p.rt THEN 1.0
                         WHEN len(p.lt) = 0 OR len(p.rt) = 0 THEN 0.0
                         WHEN coalesce(d.den_x, 0.0) = 0.0 OR coalesce(d.den_y, 0.0) = 0.0
                           THEN coalesce(nm.numerator, 0.0)
                         ELSE coalesce(nm.numerator, 0.0) / (sqrt(d.den_x) * sqrt(d.den_y)) END, 6) AS softtfidf
       FROM p
       LEFT JOIN num nm USING (left_name, right_name)
       LEFT JOIN den d USING (left_name, right_name)
       LEFT JOIN tnum t USING (left_name, right_name)"""
    % {"jw": _JW_SQL},
)
def k8_softtfidf_pairs(spark, sf_dir):
    """K7/K8: tf-idf + soft-TFIDF (jw secondary @ 0.7) over all distinct
    part-name pairs with the part-name corpus df map. The oracle is the
    full relational decomposition of the reference loop
    (test_hybrid_func.py:53-131,161-206): distinct term pairs scored with
    composed jaro+prefix-boost, strictly-improving winner = (max score,
    earliest y-position), raw-idf numerator with df=1 fallback for the
    winner term_y, squared-idf denominators over the df-present union.
    Tokenizer here is lower+whitespace (SQL-expressible on both engines);
    the canonical stemmer path is pytest-covered (test_tokenize)."""
    from .functions.embedding import HashEmbedder
    from .functions.kernels import build_document_frequency
    from .functions.spark_udfs import make_sim_scores_udf

    names = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("toks", whitespace_tokens(F.lower(F.trim(F.col("name")))))
    )
    # CONTRACT-HARNESS ONLY: collect() mirrors the oracle's driver-side
    # df-map over this 64-name corpus so both engines weight identically.
    # The production path NEVER does this — it builds the map with
    # scoring.broadcast_df_map (min_df/max_vocab caps) or keeps df as a
    # relation (operators/softtfidf_join.py); do not copy this shape
    # into a pipeline.
    rows = names.collect()
    corpus = {r["name"]: list(r["toks"]) for r in rows}
    df_map = build_document_frequency(list(corpus.values()))
    sc = spark.sparkContext
    suite = make_sim_scores_udf(
        sc.broadcast(df_map),
        sc.broadcast(len(corpus)),
        HashEmbedder(),
        softtfidf_threshold=0.7,
        fields=["tfidf", "softtfidf"],
    )
    a = names.select(F.col("name").alias("left_name"), F.col("toks").alias("lt"))
    b = names.select(F.col("name").alias("right_name"), F.col("toks").alias("rt"))
    pairs = a.crossJoin(b).filter(F.col("left_name") < F.col("right_name"))
    scored = pairs.withColumn(
        "_s",
        suite(F.col("left_name"), F.col("right_name"), F.col("lt"), F.col("rt")),
    )
    return scored.select(
        "left_name",
        "right_name",
        _r6(F.col("_s.tfidf")).alias("tfidf"),
        _r6(F.col("_s.softtfidf")).alias("softtfidf"),
    )


@_q(
    "a8_threshold_sweep",
    """WITH labeled AS (
         SELECT CASE WHEN value >= 50 THEN 1 ELSE 0 END AS match,
                value / 100.0 AS score
         FROM events
       ), thr AS (SELECT unnest([0.2, 0.35, 0.5, 0.65, 0.8]::DOUBLE[]) AS threshold),
       counts AS (
         SELECT threshold,
                CAST(sum(CASE WHEN match = 1 AND score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                CAST(sum(CASE WHEN match = 0 AND score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                CAST(sum(CASE WHEN match = 1 AND score < threshold THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                CAST(sum(CASE WHEN match = 0 AND score < threshold THEN 1 ELSE 0 END) AS BIGINT) AS tn
         FROM labeled, thr GROUP BY threshold
       ),
       pr AS (
         SELECT threshold, tp, fp, fn, tn,
                CASE WHEN tp + fp > 0 THEN tp * 1.0 / (tp + fp) ELSE 0.0 END AS p,
                CASE WHEN tp + fn > 0 THEN tp * 1.0 / (tp + fn) ELSE 0.0 END AS r,
                sqrt((tp + fp) * 1.0 * (tp + fn) * (tn + fp) * (tn + fn)) AS md
         FROM counts
       )
       SELECT threshold, tp, fp, fn, tn,
              round(p, 6) AS precision,
              round(r, 6) AS recall,
              round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END, 6) AS f1,
              round(CASE WHEN md > 0 THEN (tp * 1.0 * tn - fp * 1.0 * fn) / md ELSE 0.0 END, 6) AS mcc
       FROM pr""",
)
def a8_threshold_sweep(spark, sf_dir):
    """A8: one-pass P/R/F1 threshold sweep (evaluation_metrics.py:36-63
    looped over thresholds at baseline.py:31-89 — here a broadcast join +
    single grouped aggregate) over a deterministic labeling of events."""
    from .operators.evaluation import threshold_sweep

    labeled = _t(spark, sf_dir, "events").select(
        F.when(F.col("value") >= 50, 1).otherwise(0).alias("match"),
        (F.col("value") / 100.0).alias("score"),
    )
    out = threshold_sweep(labeled, [0.2, 0.35, 0.5, 0.65, 0.8])
    return out.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        "tn",
        _r6(F.col("precision")).alias("precision"),
        _r6(F.col("recall")).alias("recall"),
        _r6(F.col("f1")).alias("f1"),
        _r6(F.col("mcc")).alias("mcc"),
    )


@_q(
    "k9_restricted_softtfidf_pairs",
    r"""WITH names AS (
         SELECT name, row_number() OVER (ORDER BY name) AS rn,
                list_filter(regexp_split_to_array(lower(trim(name)), '\s+'), t -> t <> '') AS toks
         FROM (SELECT DISTINCT p_name AS name FROM part)
       ),
       p AS (
         SELECT a.name AS left_name, b.name AS right_name, a.toks AS lt, b.toks AS rt
         FROM names a JOIN names b ON b.rn - a.rn BETWEEN 1 AND 5
       ),
       share_left AS (
         SELECT left_name AS k, left_name AS name FROM p
         UNION SELECT left_name, right_name FROM p
       ),
       share_right AS (
         SELECT right_name AS k, left_name AS name FROM p
         UNION SELECT right_name, right_name FROM p
       ),
       corpus AS (
         SELECT DISTINCT pr.left_name, pr.right_name, s.name
         FROM p pr JOIN share_left s ON s.k = pr.left_name
         UNION
         SELECT DISTINCT pr.left_name, pr.right_name, s.name
         FROM p pr JOIN share_right s ON s.k = pr.right_name
       ),
       cs AS (SELECT left_name, right_name, count(*) AS cs FROM corpus GROUP BY 1, 2),
       pair_df AS (
         SELECT c.left_name, c.right_name, t.token, count(*) AS df
         FROM corpus c
         JOIN (SELECT name, unnest(list_distinct(toks)) AS token FROM names) t
           ON t.name = c.name
         GROUP BY 1, 2, 3
       ),
       xt AS (
         SELECT left_name, right_name, tx, count(*) AS tfx
         FROM (SELECT left_name, right_name, unnest(lt) AS tx FROM p)
         GROUP BY 1, 2, 3
       ),
       yt AS (
         SELECT left_name, right_name, ty, count(*) AS tfy, min(pos) AS pos
         FROM (SELECT left_name, right_name, unnest(rt) AS ty,
                      unnest(range(1, len(rt)+1)) AS pos FROM p)
         GROUP BY 1, 2, 3
       ),
       term_pairs AS (SELECT DISTINCT xt.tx, yt.ty FROM xt JOIN yt USING (left_name, right_name)),
       scored_tp AS (%(jw)s),
       winner AS (
         SELECT left_name, right_name, tx, tfx, ty, tfy, score
         FROM (
           SELECT xt.left_name, xt.right_name, xt.tx, xt.tfx, yt.ty, yt.tfy, s.score,
                  row_number() OVER (PARTITION BY xt.left_name, xt.right_name, xt.tx
                                     ORDER BY s.score DESC, yt.pos ASC) AS rn
           FROM xt JOIN yt USING (left_name, right_name)
           JOIN scored_tp s ON s.tx = xt.tx AND s.ty = yt.ty
         ) WHERE rn = 1
       ),
       num AS (
         SELECT w.left_name, w.right_name,
                sum((c.cs * 1.0 / dx.df) * w.tfx
                    * (c.cs * 1.0 / coalesce(dy.df, 1)) * w.tfy * w.score) AS numerator
         FROM winner w
         JOIN cs c USING (left_name, right_name)
         JOIN pair_df dx ON dx.left_name = w.left_name AND dx.right_name = w.right_name AND dx.token = w.tx
         LEFT JOIN pair_df dy ON dy.left_name = w.left_name AND dy.right_name = w.right_name AND dy.token = w.ty
         GROUP BY 1, 2
       ),
       union_terms AS (
         SELECT coalesce(x.left_name, y.left_name) AS left_name,
                coalesce(x.right_name, y.right_name) AS right_name,
                coalesce(x.tx, y.ty) AS token,
                coalesce(x.tfx, 0) AS tf_x, coalesce(y.tfy, 0) AS tf_y
         FROM xt x FULL JOIN yt y
           ON x.left_name = y.left_name AND x.right_name = y.right_name AND x.tx = y.ty
       ),
       den AS (
         SELECT u.left_name, u.right_name,
                sum(pow(c.cs * 1.0 / d.df * u.tf_x, 2)) AS den_x,
                sum(pow(c.cs * 1.0 / d.df * u.tf_y, 2)) AS den_y
         FROM union_terms u
         JOIN cs c USING (left_name, right_name)
         JOIN pair_df d ON d.left_name = u.left_name AND d.right_name = u.right_name AND d.token = u.token
         GROUP BY 1, 2
       )
       SELECT p.left_name, p.right_name,
              round(CASE WHEN p.lt = p.rt THEN 1.0
                         WHEN len(p.lt) = 0 OR len(p.rt) = 0 THEN 0.0
                         WHEN coalesce(d.den_x, 0.0) = 0.0 OR coalesce(d.den_y, 0.0) = 0.0
                           THEN coalesce(nm.numerator, 0.0)
                         ELSE coalesce(nm.numerator, 0.0) / (sqrt(d.den_x) * sqrt(d.den_y)) END, 6)
                AS restricted_softtfidf
       FROM p
       LEFT JOIN num nm USING (left_name, right_name)
       LEFT JOIN den d USING (left_name, right_name)"""
    % {"jw": _JW_SQL},
)
def k9_restricted_softtfidf_pairs(spark, sf_dir):
    """K9: restricted soft-TFIDF (J3 corpus gather + per-pair local df
    map) over a banded part-name pair set — the band keeps per-pair
    restricted corpora genuinely different from the global corpus. The
    oracle reproduces the corpus-gather relationally (left-share ∪
    right-share per restricted_softtfidf.py:27-46) and the per-pair
    df/corpus-size soft-TFIDF. Tokenizer: lower+whitespace on both
    engines; canonical-normalizer path covered in test_restricted."""
    from pyspark.sql.window import Window

    from .operators.restricted import score_restricted

    names = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("rn", F.row_number().over(Window.orderBy("name")))
    )
    a = names.select(F.col("name").alias("left_name"), F.col("rn").alias("arn"))
    b = names.select(F.col("name").alias("right_name"), F.col("rn").alias("brn"))
    pairs = (
        a.crossJoin(b)
        .filter((F.col("brn") - F.col("arn") >= 1) & (F.col("brn") - F.col("arn") <= 5))
        .select("left_name", "right_name")
    )
    tok = lambda s: [t for t in s.lower().strip().split() if t]  # noqa: E731
    out = score_restricted(pairs, secondary_threshold=0.7, tokenizer=tok)
    return out.select(
        "left_name",
        "right_name",
        _r6(F.col("restricted_softtfidf")).alias("restricted_softtfidf"),
    )


def _k10_oracle_sql() -> str:
    """Semantic soft-TFIDF oracle: the k8 relational decomposition with
    a term-pair score of max(jaro-winkler, char-count-vector cosine) and
    the reference's OR acceptance gate (semantic_soft_tfidf.py:55-153).
    The a-z count vectors are integer-valued, so the float64 cosine is
    bit-identical between numpy and DuckDB (exact dot/norm sums)."""
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def cnt(col: str, c: str) -> str:
        return f"(length({col}) - length(replace({col}, '{c}', '')))"

    dot = " + ".join(f"{cnt('tx', c)} * {cnt('ty', c)}" for c in alpha)
    nx = " + ".join(f"{cnt('tx', c)} * {cnt('tx', c)}" for c in alpha)
    ny = " + ".join(f"{cnt('ty', c)} * {cnt('ty', c)}" for c in alpha)
    scored_tp = f"""
  SELECT tx, ty, greatest(jw, sem) AS score
  FROM (
    SELECT tx, ty, j + pl * 0.1 * (1.0 - j) AS jw,
           CASE WHEN ({nx}) = 0 OR ({ny}) = 0 THEN 0.0
                ELSE ({dot}) * 1.0 / (sqrt({nx}) * sqrt({ny})) END AS sem
    FROM (
      SELECT tx, ty,
             CASE WHEN tx = ty AND length(tx) = 1 THEN 0.0
                  ELSE jaro_similarity(tx, ty) END AS j,
             CASE WHEN substr(tx,1,4) = substr(ty,1,4) THEN 4
                  WHEN substr(tx,1,3) = substr(ty,1,3) THEN 3
                  WHEN substr(tx,1,2) = substr(ty,1,2) THEN 2
                  WHEN substr(tx,1,1) = substr(ty,1,1) THEN 1
                  ELSE 0 END AS pl
      FROM term_pairs
    )
  )
  WHERE jw >= 0.85 OR sem >= 0.6
"""
    return r"""WITH names AS (
         SELECT DISTINCT p_name AS name,
                list_filter(regexp_split_to_array(lower(trim(p_name)), '\s+'), t -> t <> '') AS toks
         FROM part
       ),
       n AS (SELECT count(*) AS cs FROM names),
       df AS (
         SELECT token, count(*) AS df FROM (
           SELECT DISTINCT name, unnest(toks) AS token FROM names
         ) GROUP BY token
       ),
       p AS (
         SELECT a.name AS left_name, b.name AS right_name, a.toks AS lt, b.toks AS rt
         FROM names a JOIN names b ON a.name < b.name
       ),
       xt AS (
         SELECT left_name, right_name, tx, count(*) AS tfx
         FROM (SELECT left_name, right_name, unnest(lt) AS tx FROM p)
         GROUP BY left_name, right_name, tx
       ),
       yt AS (
         SELECT left_name, right_name, ty, count(*) AS tfy, min(pos) AS pos
         FROM (SELECT left_name, right_name, unnest(rt) AS ty,
                      unnest(range(1, len(rt)+1)) AS pos FROM p)
         GROUP BY left_name, right_name, ty
       ),
       term_pairs AS (SELECT DISTINCT xt.tx, yt.ty FROM xt JOIN yt USING (left_name, right_name)),
       scored_tp AS (%(tp)s),
       winner AS (
         SELECT left_name, right_name, tx, tfx, ty, tfy, score
         FROM (
           SELECT xt.left_name, xt.right_name, xt.tx, xt.tfx, yt.ty, yt.tfy, s.score,
                  row_number() OVER (PARTITION BY xt.left_name, xt.right_name, xt.tx
                                     ORDER BY s.score DESC, yt.pos ASC) AS rn
           FROM xt JOIN yt USING (left_name, right_name)
           JOIN scored_tp s ON s.tx = xt.tx AND s.ty = yt.ty
         ) WHERE rn = 1
       ),
       num AS (
         SELECT w.left_name, w.right_name,
                sum((n.cs * 1.0 / dx.df) * w.tfx
                    * (n.cs * 1.0 / coalesce(dy.df, 1)) * w.tfy * w.score) AS numerator
         FROM winner w
         JOIN df dx ON dx.token = w.tx
         LEFT JOIN df dy ON dy.token = w.ty
         CROSS JOIN n
         GROUP BY w.left_name, w.right_name
       ),
       union_terms AS (
         SELECT coalesce(x.left_name, y.left_name) AS left_name,
                coalesce(x.right_name, y.right_name) AS right_name,
                coalesce(x.tx, y.ty) AS token,
                coalesce(x.tfx, 0) AS tf_x, coalesce(y.tfy, 0) AS tf_y
         FROM xt x FULL JOIN yt y
           ON x.left_name = y.left_name AND x.right_name = y.right_name AND x.tx = y.ty
       ),
       den AS (
         SELECT u.left_name, u.right_name,
                sum(pow(n.cs * 1.0 / d.df * u.tf_x, 2)) AS den_x,
                sum(pow(n.cs * 1.0 / d.df * u.tf_y, 2)) AS den_y
         FROM union_terms u JOIN df d ON d.token = u.token CROSS JOIN n
         GROUP BY u.left_name, u.right_name
       )
       SELECT p.left_name, p.right_name,
              round(CASE WHEN p.lt = p.rt THEN 1.0
                         WHEN len(p.lt) = 0 OR len(p.rt) = 0 THEN 0.0
                         WHEN coalesce(d.den_x, 0.0) = 0.0 OR coalesce(d.den_y, 0.0) = 0.0
                           THEN coalesce(nm.numerator, 0.0)
                         ELSE coalesce(nm.numerator, 0.0) / (sqrt(d.den_x) * sqrt(d.den_y)) END, 6)
                AS semantic_softtfidf
       FROM p
       LEFT JOIN num nm USING (left_name, right_name)
       LEFT JOIN den d USING (left_name, right_name)""" % {"tp": scored_tp}


@_q("k10_semantic_softtfidf_pairs", _k10_oracle_sql())
def k10_semantic_softtfidf_pairs(spark, sf_dir):
    """K10: semantic soft-TFIDF — term pairs accepted when
    jaro-winkler >= 0.85 OR embedding cosine >= 0.6, contribution
    max(char, semantic) (semantic_soft_tfidf.py:55-153) — over distinct
    part-name pairs. The query embedder is the a-z char-count vector
    (integer-exact cosine ⇒ the whole kernel is oracle-verifiable); the
    hash-projection embedder path stays pytest-pinned
    (test_kernels::TestSemanticSoftTfIdf)."""
    from .functions.embedding import CharCountEmbedder
    from .functions.kernels import build_document_frequency
    from .functions.spark_udfs import make_sim_scores_udf

    names = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("toks", whitespace_tokens(F.lower(F.trim(F.col("name")))))
    )
    # CONTRACT-HARNESS ONLY: collect() mirrors the oracle's driver-side
    # df-map over this 64-name corpus so both engines weight identically.
    # The production path NEVER does this — it builds the map with
    # scoring.broadcast_df_map (min_df/max_vocab caps) or keeps df as a
    # relation (operators/softtfidf_join.py); do not copy this shape
    # into a pipeline.
    rows = names.collect()
    corpus = {r["name"]: list(r["toks"]) for r in rows}
    sc = spark.sparkContext
    suite = make_sim_scores_udf(
        sc.broadcast(build_document_frequency(list(corpus.values()))),
        sc.broadcast(len(corpus)),
        CharCountEmbedder(),
        semantic_char_threshold=0.85,
        semantic_threshold=0.6,
        fields=["semantic_softtfidf"],
    )
    a = names.select(F.col("name").alias("left_name"), F.col("toks").alias("lt"))
    b = names.select(F.col("name").alias("right_name"), F.col("toks").alias("rt"))
    pairs = a.crossJoin(b).filter(F.col("left_name") < F.col("right_name"))
    scored = pairs.withColumn(
        "_s", suite(F.col("left_name"), F.col("right_name"), F.col("lt"), F.col("rt"))
    )
    return scored.select(
        "left_name",
        "right_name",
        _r6(F.col("_s.semantic_softtfidf")).alias("semantic_softtfidf"),
    )


def _k18_oracle_sql() -> str:
    """K18 delta features oracle: signatures from the derived
    transcripts, lower/whitespace tokens, the a-z char-count-mean
    embedder (integer sums / integer counts ⇒ IEEE-exact doubles in
    both engines — the k10 trick), first-token-blocked pairs, then the
    reference feature surface: token counts, max/min ratio, and the
    per-dimension embedding delta (right − left)."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    chars = ", ".join(f"'{c}'" for c in alpha)
    return rf"""WITH sig AS (
         SELECT CAST(doc_id // 10 AS VARCHAR) AS conv_id,
                string_agg(text, ' ' ORDER BY doc_id % 10) AS sig_text
         FROM documents GROUP BY doc_id // 10
       ),
       tok AS (
         SELECT conv_id,
                list_filter(regexp_split_to_array(lower(trim(sig_text)), '\s+'), t -> t <> '') AS toks,
                split_part(sig_text, ' ', 1) AS key
         FROM sig
       ),
       emb AS (
         SELECT conv_id, toks, key,
                list_transform([{chars}],
                  c -> CASE WHEN len(toks) = 0 THEN 0.0
                       ELSE list_sum(list_transform(toks,
                              t -> length(t) - length(replace(t, c, '')))) * 1.0
                            / len(toks) END) AS e
         FROM tok
       ),
       p AS (
         SELECT a.conv_id AS left_id, b.conv_id AS right_id,
                len(a.toks) AS tlen_l, len(b.toks) AS tlen_r,
                a.e AS el, b.e AS er
         FROM emb a JOIN emb b ON a.key = b.key AND a.conv_id < b.conv_id
       )
       SELECT left_id, right_id, tlen_l, tlen_r,
              round(CASE WHEN least(tlen_l, tlen_r) > 0
                    THEN greatest(tlen_l, tlen_r) * 1.0 / least(tlen_l, tlen_r)
                    ELSE 0.0 END, 6) AS tlen_ratio,
              d.i - 1 AS dim,
              round(er[d.i] - el[d.i], 6) AS delta
       FROM p CROSS JOIN (SELECT unnest(generate_series(1, 26)) AS i) d"""


@_q("k18_delta_features", _k18_oracle_sql())
def k18_delta_features(spark, sf_dir):
    """K18: embedding delta features through operators/ml.py
    assemble_features (reference feature matrix,
    ml_similarity_metrics.py:413-478) — token counts + max/min ratio +
    the per-dimension emb_delta vector, posexploded so every dimension
    is hash-verified. The signature embedding is the a-z char-count
    MEAN vector computed natively (integer sum / integer count ⇒ exact
    float64 both engines); the UDF embedder path stays pytest-pinned."""
    from pyspark.ml.functions import vector_to_array

    from .operators.ml import assemble_features

    sig = build_signatures(_doc_transcripts(spark, sf_dir), with_tokens=False)
    toks = F.filter(
        whitespace_tokens(F.lower(F.trim(F.col("sig_text")))), lambda t: t != ""
    )
    sig = sig.select("conv_id", toks.alias("tokens"))
    alphabet = "abcdefghijklmnopqrstuvwxyz"

    def dim_mean(c: str) -> F.Column:
        total = F.aggregate(
            F.col("tokens"),
            F.lit(0).cast("long"),
            lambda a, t: a
            + (F.length(t) - F.length(F.replace(t, F.lit(c), F.lit("")))).cast("long"),
        )
        return (
            F.when(F.size("tokens") > 0, total.cast("double") / F.size("tokens"))
            .otherwise(F.lit(0.0))
        )

    sig = sig.withColumn("emb", F.array(*[dim_mean(c) for c in alphabet]))
    pairs = block_first_token_pairs(spark, sf_dir)
    out, _feats = assemble_features(pairs, sig)
    return out.select(
        "left_id",
        "right_id",
        "tlen_l",
        "tlen_r",
        _r6(F.col("tlen_ratio")).alias("tlen_ratio"),
        F.posexplode(vector_to_array(F.col("emb_delta"))).alias("dim", "delta"),
    ).select(
        "left_id",
        "right_id",
        "tlen_l",
        "tlen_r",
        "tlen_ratio",
        F.col("dim").cast("long").alias("dim"),
        _r6(F.col("delta")).alias("delta"),
    )


@_q(
    "text_winnowing",
    r"""WITH t AS (
         SELECT doc_id, regexp_replace(lower(text), '\s+', ' ', 'g') AS s
         FROM documents
       ),
       g AS (
         SELECT doc_id, s, greatest(length(s) - 7, 0) AS ng FROM t
       ),
       grams AS (
         SELECT doc_id, ng,
                list_transform(generate_series(1, greatest(ng, 1)),
                  i -> list_reduce(
                         list_prepend(CAST(0 AS BIGINT),
                           list_transform(generate_series(0, 7),
                             j -> CAST(unicode(substr(s, CAST(i + j AS INT), 1)) AS BIGINT))),
                         (h, c) -> (h * 131 + c) % 2147483647)) AS gh
         FROM g WHERE ng > 0
       ),
       wins AS (
         SELECT doc_id,
                list_distinct(list_transform(generate_series(1, greatest(ng - 3, 1)),
                  i -> list_min(gh[i:i+3]))) AS fps
         FROM grams
       )
       SELECT doc_id, unnest(fps) AS fp FROM wins""",
)
def text_winnowing(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al., SIGMOD'03) over the
    documents table, k=8 / window=4, portable hash family so the full
    k-gram → windowed-min → distinct pipeline is oracle-verified
    (operators/textstats.py winnow_fingerprints; the xxhash64 production
    family keeps its pytest pin). Exploded to (doc_id, fp) rows —
    documents shorter than k contribute no rows on either side."""
    docs = _t(spark, sf_dir, "documents")
    fps = textstats.winnow_fingerprints(F.col("text"), hash_family="portable")
    return docs.select("doc_id", F.explode(fps).alias("fp"))


@_q(
    "multimodal_features",
    """WITH m AS (
         SELECT doc_id AS media_id,
                CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                     WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                octet_length(encode(text)) AS n_bytes,
                sha256(text) AS h
         FROM documents
       )
       SELECT media_id, kind, n_bytes,
              d.i - 1 AS dim,
              round(CAST(CAST(CAST((strpos('0123456789abcdef', substr(h, 2*d.i-1, 1)) - 1) * 16
                    + (strpos('0123456789abcdef', substr(h, 2*d.i, 1)) - 1) AS DOUBLE)
                    / 255.0 AS REAL) AS DOUBLE), 6) AS fval
       FROM m CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS i) d""",
)
def multimodal_features(spark, sf_dir):
    """Multimodal feature extraction (operators/multimodal.py
    extract_features, mapInPandas over binary payloads): media rows are
    derived deterministically from documents (payload = UTF-8 text
    bytes, kind cycles image/audio/video), the stub decode is
    sha256-digest floats, so DuckDB rebuilds every feature dimension
    from its own sha256. byte/255 is double-rounding-safe for all 256
    byte values (verified exhaustively), so the oracle's
    double-divide-then-REAL-cast equals numpy's float32 divide; the
    REAL is widened back to DOUBLE before round() so both engines
    round (and hash) the same float64 value — round(REAL) would return
    a float32 whose widened repr differs from Spark's double."""
    from .operators.multimodal import extract_features

    docs = _t(spark, sf_dir, "documents")
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(kinds, (F.col("doc_id") % 3).cast("int") + 1).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    feats = extract_features(media, feature_dim=32)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.posexplode(F.col("feature")).alias("dim", "fval"),
    ).select(
        "media_id",
        "kind",
        "n_bytes",
        F.col("dim").cast("long").alias("dim"),
        _r6(F.col("fval").cast("double")).alias("fval"),
    )


# =====================================================================
# registry order: the driver evaluates queries in registration order
# with a bounded budget (50 in round 2 — k9/k10, registered last, were
# the two rows missing from CORRECTNESS_r02). Keep the soft-TFIDF
# family contiguous right after k8 so the heavyweight oracle queries
# always land inside the budget.
# =====================================================================


#: the round driver evaluates AT MOST this many queries, in registry
#: order — anything past the cap silently gets no correctness row
_DRIVER_QUERY_CAP = 50


def _reorder_registry() -> None:
    """Keep the soft-TFIDF family adjacent (k8 → k9 → k10) so all three
    land inside the driver's evaluation cap regardless of where their
    definitions sit in this file. Tolerant of renames: if the anchor is
    ever renamed the family simply stays in definition order."""
    family = ["k9_restricted_softtfidf_pairs", "k10_semantic_softtfidf_pairs"]
    present = [n for n in family if n in QUERIES]
    order = [n for n in QUERIES if n not in present]
    if "k8_softtfidf_pairs" in order and present:
        anchor = order.index("k8_softtfidf_pairs") + 1
        order[anchor:anchor] = present
    else:
        order += present
    for d in (QUERIES, ORACLE):
        reordered = {n: d[n] for n in order if n in d}
        d.clear()
        d.update(reordered)
    if len(QUERIES) > _DRIVER_QUERY_CAP:
        raise RuntimeError(
            f"{len(QUERIES)} queries registered but the correctness "
            f"driver evaluates only the first {_DRIVER_QUERY_CAP} — "
            "merge or remove a query instead of silently dropping "
            f"{list(QUERIES)[_DRIVER_QUERY_CAP:]} from the sweep"
        )


_reorder_registry()
