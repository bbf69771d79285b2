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
