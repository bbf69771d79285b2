"""Source readers — the reference's ingest surface re-expressed as Spark
scans (SURVEY.md §2.1).

Each reader returns a columnar DataFrame with pushdown-friendly plans:
filters and projections passed here land in the scan (`PushedFilters` /
`ReadSchema` in explain output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """S1-analog: the primary entity source. Iceberg in production
    (``spark.read.table``); parquet path in-sandbox. Column-pruned to the
    transcript schema so extra columns never leave the scan."""
    df = (
        spark.read.table(path)
        if "/" not in path and "." in path
        else spark.read.parquet(path)
    )
    return df.select(*[c for c in TRANSCRIPT_COLUMNS if c in df.columns])


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def read_json_entities(
    spark: SparkSession,
    path: str,
    drop_columns: list[str] | None = None,
    state_filter: str | None = None,
) -> DataFrame:
    """S2: JSON-lines entity scan (reference ``load_yelp.py:4-13``):
    read → drop attribute columns → optional equality filter, all
    expressed declaratively so Catalyst prunes/pushes."""
    df = spark.read.json(path)
    if drop_columns:
        df = df.drop(*drop_columns)
    if state_filter is not None:
        df = df.filter(F.col("state") == state_filter)
    return df


def read_csv_entities(
    spark: SparkSession,
    path: str,
    sep: str = ";",
    point_column: str | None = "geo_point_2d",
) -> DataFrame:
    """S3: delimited CSV scan (reference ``load_gov_NC.py:8-24``); if
    ``point_column`` is present it is split into latitude/longitude
    doubles (K19 coordinate split: `', '`-separated "lat, lon")."""
    df = spark.read.csv(path, sep=sep, header=True)
    if point_column and point_column in df.columns:
        parts = F.split(F.col(point_column), ", ")
        df = df.withColumn("latitude", parts.getItem(0).cast("double")).withColumn(
            "longitude", parts.getItem(1).cast("double")
        )
    return df


def read_nested_json_entities(
    spark: SparkSession, path: str, coords_field: str = "fields.geom.coordinates"
) -> DataFrame:
    """S4: nested-JSON scan (reference ``load_vancouver_data.py:6-88``):
    coordinates array is [lon, lat] — note the reversed order, mirrored
    from the reference's ``coordinates[0/1]`` access."""
    df = spark.read.json(path)
    coords = F.col(coords_field)
    return df.withColumn("longitude", coords.getItem(0).cast("double")).withColumn(
        "latitude", coords.getItem(1).cast("double")
    )


def read_osm_named_nodes(spark: SparkSession, path: str) -> DataFrame:
    """S1 literal: scan OpenStreetMap ``.osm`` XML for name-tagged nodes
    — the reference streams the file through an osmium handler
    (``load_osm.py:29-67``, ``tag_inventory2``: keep nodes with a
    ``name`` tag; emit type/name/location/len_tags/tags, then split the
    location into latitude/longitude at ``:77-83``).

    Spark-first, no XML package: ``spark.read.text`` with
    ``lineSep="<node "`` makes each record one node element (attribute
    head + children up to the next node), scanning in parallel by file
    split; everything else is native regexp/array expressions inside
    WholeStageCodegen. A tagged node's body ends at ``</node>``; a
    self-closing node's at its own ``/>`` — taken before any trailing
    non-node elements, so way/relation content in the final record's
    tail is never parsed as node tags (the reference handler likewise
    ignores ways/relations).

    Returns (type='node', name, len_tags, tags array<struct<k,v>>,
    latitude, longitude) for nodes with a nonempty name tag.
    """
    raw = spark.read.text(path, lineSep="<node ")
    v = F.col("value")
    # records before the first node (XML header, bounds) carry no id=
    head = F.substring_index(v, ">", 1)
    body = F.when(
        v.contains("</node>"), F.substring_index(v, "</node>", 1)
    ).otherwise(F.substring_index(v, "/>", 1))
    ks = F.regexp_extract_all(body, F.lit('<tag k="([^"]*)"'), 1)
    vs = F.regexp_extract_all(body, F.lit('v="([^"]*)"'), 1)
    unescape = lambda c: F.regexp_replace(  # noqa: E731
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(c, "&lt;", "<"), "&gt;", ">"
                ),
                "&quot;", '"',
            ),
            "&apos;", "'",
        ),
        "&amp;", "&",
    )
    nodes = raw.select(
        F.regexp_extract(head, 'id="([0-9]+)"', 1).alias("osm_id"),
        F.regexp_extract(head, 'lat="(-?[0-9.]+)"', 1).alias("lat_s"),
        F.regexp_extract(head, 'lon="(-?[0-9.]+)"', 1).alias("lon_s"),
        F.zip_with(
            ks, vs, lambda k, vv: F.struct(k.alias("k"), unescape(vv).alias("v"))
        ).alias("tags"),
    ).filter(F.col("osm_id") != "")
    # F.get, not element_at: null-safe on empty arrays under ANSI mode
    name = F.get(F.filter(F.col("tags"), lambda t: t["k"] == "name"), 0)["v"]
    return (
        nodes.withColumn("name", name)
        .filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .select(
            F.lit("node").alias("type"),
            "name",
            F.size("tags").alias("len_tags"),
            "tags",
            F.col("lat_s").cast("double").alias("latitude"),
            F.col("lon_s").cast("double").alias("longitude"),
        )
    )
