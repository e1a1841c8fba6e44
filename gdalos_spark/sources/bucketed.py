"""Bucketed-table layout helpers — the co-located join surface.

The tiled layout (sources/tiled.py) removes the raster shuffle; this
module removes the FACT-JOIN shuffle: writing both sides of a repeated
join bucketed (and sorted) by the join key lets Spark plan the join with
ZERO exchanges — bucket-to-bucket, sort-merge without a sort. At 100 TB
you pay the bucketing shuffle once at ingest and every downstream
orderkey/custkey join runs exchange-free (tests/test_bucketed.py proves
the property on the executed plan; merge_upsert_plan cites it as the
layout that makes the MERGE target side shuffle-free).

The helpers are thin by design: the VALUE is the layout contract
(bucket count, key, sort) living in one place instead of being re-typed
per pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 8


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    key: str,
    buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize `df` as a bucketed+sorted table on `key`. Spark only
    records bucketing metadata through the table catalog, so this is a
    saveAsTable with an explicit path — the parquet layout is plain
    files plus the bucket spec."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    spark.read.parquet of the path would drop it and re-shuffle)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
