"""Approximate nearest neighbour over an embedding column.

Two strategies, same output schema (query_id, vec_id, cosine, rank):

* ``brute_force_topk`` — broadcast the (small) query set, native cosine
  per (row × query), window top-k. Exact; the correctness baseline.
* ``ivf_topk`` — coarse inverted-file: k-means-free deterministic
  centroid assignment via sign-sketch buckets (same machinery as
  ``dedup.embedding_near_dup``); candidates searched only inside the
  query's bucket ± probe buckets. The 100 TB path: scan prunes to
  ~1/2^planes of the corpus per query.

At 1000-executor scale the corpus side stays partitioned (never
collected); only queries and centroids are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spark_udfs import cosine_array


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast-nested-loop of corpus × queries
    (queries must be small — that's the contract of a top-k probe), then
    a per-query window. One shuffle (the window)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    scored = c.crossJoin(F.broadcast(q)).withColumn(
        "cosine", cosine_array(F.col("v"), F.col("qv"))
    )
    return _ranked_topk(scored, k)


#: plane-family id for the ANN sign sketch under the portable hash
#: (distinct from embedding_near_dup's table families 0..tables-1)
ANN_PLANE_FAMILY = 16


def _sign_bucket(vec_col: str, planes: int, seed: int, hash_family: str = "fast"):
    """hash_family='portable' uses the fixed ANN_PLANE_FAMILY and
    intentionally IGNORES ``seed`` — the SQL oracle must be able to
    re-derive the planes without seed plumbing. Use the fast family
    (default) when distinct-seed sketches are needed."""
    dim_idx = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    if hash_family == "portable":
        from ..functions.portable_hash import plane_coeff_col

        def _coeff(p: int, d):
            return plane_coeff_col(ANN_PLANE_FAMILY, p, d)

    else:
        from ..functions.spark_udfs import hyperplane_coeff

        def _coeff(p: int, d):
            return hyperplane_coeff(d, seed, p)

    def plane_sign(p: int):
        coeffs = F.transform(dim_idx, lambda d: _coeff(p, d))
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), coeffs, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[plane_sign(p) for p in range(planes)])


#: one-time flag for the round-3 multiprobe semantics-change warning
_MULTIPROBE_CHANGE_WARNED = False


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    multiprobe: int = 1,
    hash_family: str = "fast",
) -> DataFrame:
    """LSH-bucketed ANN: corpus rows hashed once into 2^planes sign
    buckets; each query probes its own bucket plus its ``multiprobe``
    nearest neighbouring buckets — the single-bit flips of positions
    0..multiprobe-1, capped at ``planes`` (the recall knob: each extra
    flip adds one probed bucket; recall is monotone in it, pinned by
    test). Equi-join on bucket replaces the cross join — candidate set
    shrinks ~2^planes/(1+multiprobe)-fold.

    COMPATIBILITY: before round 3, any ``multiprobe >= 1`` probed ALL
    ``planes`` single-bit flips; it is now exactly the number of extra
    buckets probed. Callers that relied on the old all-flips behaviour
    must pass ``multiprobe=planes`` to keep their candidate set. A
    one-time warning flags the default combination the change shrinks."""
    global _MULTIPROBE_CHANGE_WARNED
    if multiprobe == 1 and planes > 1 and not _MULTIPROBE_CHANGE_WARNED:
        _MULTIPROBE_CHANGE_WARNED = True
        import warnings

        warnings.warn(
            "ivf_topk multiprobe semantics changed: multiprobe=1 now "
            f"probes exactly 1 extra bucket (formerly all {planes} "
            "single-bit flips). Pass multiprobe=planes to keep the old "
            "candidate set; this warning is emitted once per process.",
            stacklevel=2,
        )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
    ).withColumn("bucket", _sign_bucket("v", planes, seed, hash_family))

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    ).withColumn("bucket", _sign_bucket("qv", planes, seed, hash_family))

    if multiprobe > 0:
        # probe buckets: exact bucket + the first `multiprobe` single-bit
        # flips (multiprobe IS the number of extra buckets probed;
        # formerly any multiprobe>=1 probed all flips — a misleading knob)
        flips = [q.select("query_id", "qv", F.col("bucket"))]
        for p in range(min(multiprobe, planes)):
            flipped = F.concat(
                F.substring("bucket", 1, p),
                F.when(F.substring("bucket", p + 1, 1) == "1", "0").otherwise("1"),
                F.substring("bucket", p + 2, planes - p - 1),
            )
            flips.append(q.select("query_id", "qv", flipped.alias("bucket")))
        probes = flips[0]
        for f in flips[1:]:
            probes = probes.unionByName(f)
    else:
        probes = q

    scored = c.join(F.broadcast(probes), "bucket").withColumn(
        "cosine", cosine_array(F.col("v"), F.col("qv"))
    )
    return _ranked_topk(scored.dropDuplicates(["query_id", "vec_id"]), k)


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 2,
    seed: int = 42,
    max_iter: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """True inverted-file ANN: spark.ml KMeans coarse quantizer.

    Build: fit KMeans(seed) on the corpus embeddings (distributed,
    Lloyd's over partitioned data) and tag every corpus row with its
    centroid id — at 100 TB this is the one-off index build; the
    assignment column would be persisted/partitioned-by in practice.

    Search: each query scores the (tiny, broadcast) centroid table,
    keeps its ``n_probe`` nearest cells, and the candidate join touches
    only those cells' rows — scan shrinks ~n_clusters/n_probe-fold.
    Exact cosine re-ranks candidates; recall vs brute force rises with
    n_probe (the standard IVF knob).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).withColumn("_fv", array_to_vector(F.col("v").cast("array<double>")))
    km = KMeans(k=n_clusters, seed=seed, maxIter=max_iter, featuresCol="_fv",
                predictionCol="cell")
    model = km.fit(c)
    centers = [list(map(float, v)) for v in model.clusterCenters()]
    return ivf_centroid_topk(
        corpus,
        queries,
        centers,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    )


def _cell_dists(vec_col: str, centers: list[list[float]]):
    """array<struct<dist,cell>> of exact squared euclidean distances to
    every centroid — a per-row narrow expression (whole-stage codegen,
    centroids inlined as literals: the "broadcast tiny centroid table"
    of a real IVF index). Left-fold sum in array order so the IEEE
    result is reproducible across engines (see sql_plane_dot)."""
    exprs = []
    for i, center in enumerate(centers):
        carr = F.array(*[F.lit(float(x)) for x in center])
        d = F.aggregate(
            F.zip_with(F.col(vec_col), carr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        exprs.append(F.struct(d.alias("dist"), F.lit(i).alias("cell")))
    return F.array(*exprs)


def ivf_centroid_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centers: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF search given an explicit centroid list — the shared search
    path of ``ivf_kmeans_topk`` (which fits the centroids with spark.ml
    KMeans) and of the SQL-oracled ``ann_kmeans_topk`` driver query
    (which passes deterministic data-derived centroids).

    Assignment is a per-row argmin over the inlined centroid literals
    (struct ordering (dist, cell): nearest cell, lowest id on ties —
    KMeans.transform semantics) — NO shuffle, no UDF; the corpus is
    touched by exactly one narrow projection, so at 100 TB the index
    build is a single scan. Each query keeps its ``n_probe`` nearest
    cells and the candidate equi-join on ``cell`` touches only those
    cells' rows. A corpus row lives in exactly one cell and probe cells
    are distinct per query, so (query, vec) candidates are already
    unique — no dedup shuffle needed before ranking."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    assigned = c.withColumn("cell", F.array_min(_cell_dists("v", centers))["cell"])

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("qv"),
    )
    probe_cells = F.transform(
        F.slice(F.array_sort(_cell_dists("qv", centers)), 1, n_probe),
        lambda s: s["cell"],
    )
    probes = q.select(
        "query_id", "qv", F.explode(probe_cells).alias("cell")
    )

    scored = assigned.join(F.broadcast(probes), "cell").withColumn(
        "cosine", cosine_array(F.col("v"), F.col("qv"))
    )
    return _ranked_topk(scored, k)
