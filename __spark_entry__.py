"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps every SURVEY.md §2 inventory key to a callable
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` maps the same keys to
ANSI SQL DuckDB runs on the same parquet tables. Column names/aliases match
between the two on every query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gdalos_spark.operators import relational

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {
    "pricing_summary": relational.pricing_summary,
    "top_orders": relational.top_orders,
    "region_volume": relational.region_volume,
    "events_sessionize": relational.events_sessionize,
    "events_windowed_agg": relational.events_windowed_agg,
}

_ORACLES: dict[str, str] = {
    "pricing_summary": relational.PRICING_SUMMARY_SQL,
    "top_orders": relational.TOP_ORDERS_SQL,
    "region_volume": relational.REGION_VOLUME_SQL,
    "events_sessionize": relational.EVENTS_SESSIONIZE_SQL,
    "events_windowed_agg": relational.EVENTS_WINDOWED_AGG_SQL,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
