"""functions.ranking equivalence: the histogram-offset decomposition must
be BIT-IDENTICAL to the single-partition window functions it replaces,
on adversarial data (heavy ties, skew, tiny bucket counts)."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gdalos_spark.functions.ranking import (
    exact_global_cumsum,
    exact_global_rank,
    ntile_from_rank,
)


def _fixture(spark):
    # 999 rows, heavily tied values (v in 0..30), unique id tiebreak,
    # deliberately NOT coprime with the bucket count
    return spark.range(999).select(
        F.col("id"),
        ((F.col("id") * 37) % 31).alias("v"),
    )


def test_rank_and_ntile_match_window_functions(spark):
    df = _fixture(spark)
    w = Window.orderBy("v", "id")
    expected = df.select(
        "id",
        F.row_number().over(w).alias("rn_ref"),
        *[F.ntile(k).over(w).alias(f"nt{k}_ref") for k in (2, 5, 7, 10)],
    )
    got = exact_global_rank(df, F.col("v") * 8 / 31, ["v", "id"])
    got = got.select(
        "id",
        "rn",
        *[ntile_from_rank(F.col("rn"), F.col("n"), k).alias(f"nt{k}") for k in (2, 5, 7, 10)],
    )
    j = expected.join(got, "id")
    assert j.filter(F.col("rn_ref") != F.col("rn")).count() == 0
    for k in (2, 5, 7, 10):
        assert j.filter(F.col(f"nt{k}_ref") != F.col(f"nt{k}")).count() == 0


def test_cumsum_matches_window_function(spark):
    df = _fixture(spark).withColumn("val", (F.col("id") * 13) % 101)
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expected = df.select("id", F.sum("val").over(w).alias("cum_ref"))
    got = exact_global_cumsum(df, F.col("v") * 8 / 31, ["v", "id"], "val")
    j = expected.join(got.select("id", "cum"), "id")
    assert j.filter(F.col("cum_ref") != F.col("cum")).count() == 0


def test_descending_order_with_inverted_bucket(spark):
    """Descending rankings bucket on (max - value): the id must still
    ascend along the ordering for the decomposition to hold."""
    df = _fixture(spark)
    w = Window.orderBy(F.desc("v"), "id")
    expected = df.select("id", F.row_number().over(w).alias("rn_ref"))
    got = exact_global_rank(
        df, (F.lit(30) - F.col("v")) * 8 / 31, [F.desc("v"), "id"]
    )
    j = expected.join(got.select("id", "rn"), "id")
    assert j.filter(F.col("rn_ref") != F.col("rn")).count() == 0
