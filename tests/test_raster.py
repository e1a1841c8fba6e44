"""Oracle-parity tests for the raster core (SURVEY §2 #1-18)."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

RASTER_KEYS = [
    "rasterize_points",
    "raster_crop",
    "raster_overview",
    "raster_overview_mode",
    "raster_calc_expr",
    "raster_combine_count",
    "raster_combine_max",
    "raster_combine_unique",
    "raster_scale",
    "raster_color_relief",
    "raster_to_xyz",
    "pixel_lookup",
    "raster_mosaic",
    "raster_info",
    "raster_histogram",
    "raster_warp_affine",
    "raster_partition_stats",
    "extent_selector",
]


@pytest.mark.parametrize("key", RASTER_KEYS)
def test_raster_matches_oracle(spark, ducks, key):
    q = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    assert_matches_oracle(spark, ducks, q, sql)


def test_raster_hillshade_matches_oracle(spark, ducks):
    import __spark_entry__ as entrymod
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["raster_hillshade"],
        entrymod.oracle_sql()["raster_hillshade"],
    )


@pytest.mark.parametrize(
    "key",
    [
        "raster_slope_percent",
        "raster_aspect_sector",
        "raster_terrain_ruggedness",
        "raster_discrete_updown",
        "raster_overview_pyramid",
        "raster_cutline",
        "transform_resolution",
        "overview_level_select",
        "empty_raster_generate",
        "raster_nodata_rewrite",
    ],
)
def test_gdaldem_family_matches_oracle(spark, ducks, key):
    q = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    assert_matches_oracle(spark, ducks, q, sql)


@pytest.mark.parametrize(
    "key", ["raster_to_czml", "raster_to_json", "viewshed_sector", "extent_intersection"]
)
def test_export_and_sector_match_oracle(spark, ducks, key):
    q = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    assert_matches_oracle(spark, ducks, q, sql)


def test_cutline_nodata_semantics(spark):
    """Outside-polygon cells carry dstNodata (-32768), inside cells carry
    elevation; the concave cutline must leave both kinds inside the bbox."""
    from pyspark.sql import functions as F

    df = entrymod.queries()["raster_cutline"](spark, SF_DIR).cache()
    n_in = df.filter("inside = 1").count()
    n_out = df.filter("inside = 0").count()
    assert n_in > 0 and n_out > 0
    assert df.filter("(inside = 0) != (val = -32768.0)").count() == 0
    df.unpersist()


def test_raster_zorder_index_matches_oracle(spark, ducks):
    import __spark_entry__ as entrymod
    assert_matches_oracle(
        spark, ducks,
        entrymod.queries()["raster_zorder_index"],
        entrymod.oracle_sql()["raster_zorder_index"],
    )


def test_raster_zorder_tiles_are_aligned_blocks(spark):
    """Every Morton tile is an axis-aligned 16x16 block: bounds span at
    most 16 cells per axis and the bbox area equals the cell count when
    the tile is full — the locality property the layout exists for."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["raster_zorder_index"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.max_px - r.min_px <= 15
        assert r.max_py - r.min_py <= 15
        assert (r.min_px // 16) == (r.max_px // 16)
        assert (r.min_py // 16) == (r.max_py // 16)
        assert r.n_cells <= 256


def test_raster_proximity_matches_oracle(spark, ducks):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark, ducks,
        E.queries()["raster_proximity"],
        E.oracle_sql()["raster_proximity"],
    )


def test_raster_proximity_semantics(spark):
    """Targets are distance 0 from themselves; non-targets with a target
    in the window report a positive d2 bounded by the window diagonal."""
    import __spark_entry__ as E
    from gdalos_spark.operators.raster import PROX_RADIUS
    from tests.conftest import SF_DIR

    rows = E.queries()["raster_proximity"](spark, SF_DIR).collect()
    assert rows
    lim = 2 * PROX_RADIUS * PROX_RADIUS
    for r in rows:
        if r.is_target:
            assert r.nearest_d2 == 0
        else:
            assert r.nearest_d2 == -1 or 0 < r.nearest_d2 <= lim


def test_raster_sieve_matches_oracle(spark, ducks):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark, ducks,
        E.queries()["raster_sieve"],
        E.oracle_sql()["raster_sieve"],
    )


def test_raster_sieve_regions_are_consistent(spark):
    """Region ids partition the grid; every member of a region shares its
    class, and region_size equals the member count."""
    import collections

    import __spark_entry__ as E
    from tests.conftest import SF_DIR

    rows = E.queries()["raster_sieve"](spark, SF_DIR).collect()
    by_region = collections.defaultdict(list)
    for r in rows:
        by_region[r.region_id].append(r)
    for members in by_region.values():
        assert len({m.cls for m in members}) == 1
        assert all(m.region_size == len(members) for m in members)


def test_raster_flow_direction_matches_oracle(spark, ducks):
    import __spark_entry__ as E
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark, ducks,
        E.queries()["raster_flow_direction"],
        E.oracle_sql()["raster_flow_direction"],
    )


def test_raster_flow_direction_codes_valid(spark):
    import __spark_entry__ as E
    from tests.conftest import SF_DIR

    valid = {0, 1, 2, 4, 8, 16, 32, 64, 128}
    for r in E.queries()["raster_flow_direction"](spark, SF_DIR).collect():
        assert r.flow_dir in valid
        if r.flow_dir == 0:
            assert r.scaled_drop <= 0
        else:
            assert r.scaled_drop > 0


def test_vrt_overview_mosaic(spark, ducks):
    """gdalos_vrt.py:99 composition: finer member wins inside its
    extent, the full-extent member fills the rest, every value the
    exact block average at the member's own selected level."""
    from gdalos_spark.operators.raster import (
        VRT_B_EXTENT_PX,
        VRT_OUT_RES,
        VRT_B_RES,
        vrt_overview_mosaic,
    )
    import __spark_entry__ as entrymod
    from tests.conftest import assert_matches_oracle

    assert_matches_oracle(
        spark, ducks, vrt_overview_mosaic,
        entrymod.oracle_sql()["vrt_overview_mosaic"],
    )
    rows = {(r.qx, r.qy): r for r in vrt_overview_mosaic(spark, SF_DIR).collect()}
    b_cells = VRT_B_EXTENT_PX // (VRT_OUT_RES // VRT_B_RES)
    # inside B's extent the finer member must win wherever it has data
    assert any(r.source == "B" for r in rows.values())
    for (qx, qy), r in rows.items():
        if r.source == "B":
            assert qx < b_cells and qy < b_cells
