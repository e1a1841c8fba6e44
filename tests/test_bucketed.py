"""Bucketed-table layout: the co-located join story for SURVEY §6.

Writing both fact tables bucketed by the join key lets Spark plan the
join with ZERO exchanges — the join runs bucket-to-bucket. This is the
mechanism that removes the dominant shuffle from repeated big-fact joins
at 100 TB (bucket once at ingest, join shuffle-free forever after).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    from gdalos_spark.datamodel import load

    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    from gdalos_spark.sources.bucketed import write_bucketed

    write_bucketed(li, f"{wh}/li_b", "li_b", "l_orderkey")
    write_bucketed(orders, f"{wh}/ord_b", "ord_b", "o_orderkey")
    try:
        j = spark.table("li_b").join(
            spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("o_orderdate").agg(F.count(F.lit(1)).alias("n"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself must be exchange-free: the only exchange allowed
        # in the whole plan is the one for the final groupBy
        assert "SortMergeJoin" in plan
        join_part = plan[plan.index("SortMergeJoin"):]
        assert "Exchange" not in join_part, "bucketed join still shuffles"
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
