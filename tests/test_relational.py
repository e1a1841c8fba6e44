"""Oracle-parity tests for the relational core (SURVEY §2 #23-27)."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_matches_oracle

RELATIONAL_KEYS = [
    "pricing_summary",
    "top_orders",
    "region_volume",
    "events_sessionize",
    "events_windowed_agg",
    "skewed_agg_salted",
    "order_priority_counts",
    "customer_order_distribution",
    "promo_revenue",
    "large_orders",
    "running_totals",
    "events_json_extract",
    "pricing_rollup",
    "events_type_pivot",
    "job_schedule_order",
]


@pytest.mark.parametrize("key", RELATIONAL_KEYS)
def test_relational_matches_oracle(spark, ducks, key):
    q = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    assert_matches_oracle(spark, ducks, q, sql)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_skewed_agg_salted_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["skewed_agg_salted"],
        entrymod.oracle_sql()["skewed_agg_salted"],
    )
