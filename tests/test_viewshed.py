"""Oracle-parity + semantic tests for viewshed/geo (SURVEY §2 #19-22)."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

VIEWSHED_KEYS = [
    "viewshed_los",
    "viewshed_observer_count",
    "free_space_loss",
    "utm_zone_convergence",
    "viewshed_los_refraction",
    "viewshed_sector",
    "coord_precision_report",
    "viewshed_los_range",
    "azimuth_normalize",
    "proj_string_parse",
    "radio_path_report",
]


@pytest.mark.parametrize("key", VIEWSHED_KEYS)
def test_viewshed_matches_oracle(spark, ducks, key):
    q = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    assert_matches_oracle(spark, ducks, q, sql)


def test_los_first_cell_on_ray_visible(spark):
    """The closest cell on every ray has nothing to occlude it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = entrymod.queries()["viewshed_los"](spark, SF_DIR)
    w = Window.partitionBy("ray").orderBy("dist", "px", "py")
    first = df.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    assert first.filter(F.col("visible") == 0).count() == 0


def test_observer_count_bounds(spark):
    from pyspark.sql import functions as F

    df = entrymod.queries()["viewshed_observer_count"](spark, SF_DIR)
    bad = df.filter((F.col("n_visible") < 0) | (F.col("n_visible") > F.col("n_obs")))
    assert bad.count() == 0
