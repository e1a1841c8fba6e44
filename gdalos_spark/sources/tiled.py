"""Tile-partitioned parquet raster layout (SURVEY §3's 100-TB layout).

A production raster table is parquet partitioned by (tile_y, tile_x)
with pixels sorted within tiles: extent crops then prune whole
partitions at the scan, and raster-algebra joins co-locate by tile.
gdalos gets the same effect single-node from GDAL block access +
`partitions.py` job splitting; this module is the distributed
equivalent, and tests/test_tiled.py asserts the pruning actually shows
up in the physical plan (PartitionFilters + PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TILE = 16  # pixels per tile edge


def write_tiled(df: DataFrame, path: str, tile: int = TILE) -> None:
    """Materialize a pixel grid (px, py, bands...) as tile-partitioned
    parquet, pixels sorted within each tile file."""
    (
        df.withColumn("tile_x", (F.col("px") / tile).cast("int"))
        .withColumn("tile_y", (F.col("py") / tile).cast("int"))
        .repartition("tile_y", "tile_x")
        .sortWithinPartitions("py", "px")
        .write.partitionBy("tile_y", "tile_x")
        .mode("overwrite")
        .parquet(path)
    )


def read_tiled(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def crop_tiled(df: DataFrame, min_x: int, max_x: int, min_y: int, max_y: int,
               tile: int = TILE) -> DataFrame:
    """Crop with BOTH tile predicates (partition pruning — whole
    directories skipped at planning time) and pixel predicates (row-group
    pushdown inside surviving tiles)."""
    return df.filter(
        (F.col("tile_x") >= min_x // tile) & (F.col("tile_x") <= max_x // tile)
        & (F.col("tile_y") >= min_y // tile) & (F.col("tile_y") <= max_y // tile)
        & (F.col("px") >= min_x) & (F.col("px") <= max_x)
        & (F.col("py") >= min_y) & (F.col("py") <= max_y)
    )
