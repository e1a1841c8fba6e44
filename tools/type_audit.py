"""Oracle type audit: compare the Spark result schema of every queries()
entry against the DuckDB column types of its oracle_sql() twin. The
DuckDB side only plans (DESCRIBE); the Spark side reads .schema, which
is lazy for plan-only operators — but driver-side-eager entries
(streaming keys stage files and run real queries; the stored dedup
builds its signature store) DO execute while being audited, so run this
against a small SF (the sf0.001 default), not an upscale.

The driver's correctness hash is type-sensitive, so a DuckDB HUGEINT
(SUM over BIGINT) vs a Spark BIGINT is a hash-red even when every value
matches — the exact class that burned sequence_packing in round 5 and
15 decimal-SUM rows in round 1. This sweep catches it statically.

Usage:
    python tools/type_audit.py [key ...]    # default: all oracle-gated keys
"""
from __future__ import annotations

import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

# DuckDB type -> acceptable Spark simpleString prefixes.  Anything not in
# this table (HUGEINT, DECIMAL, UTINYINT...) is flagged.  The driver's
# value hash normalizes integer WIDTHS (an int32 Spark column hash-matches
# a BIGINT oracle column — proven by the green r3/r5 rows for
# customer_rfm_scores, running_totals, raster_histogram, ...), so every
# integer width accepts every other; only int-vs-float / unmapped types
# (HUGEINT, DECIMAL) are real findings.
_INTS = {"bigint", "int", "smallint", "tinyint"}
DUCK_TO_SPARK = {
    "BIGINT": _INTS,
    "INTEGER": _INTS,
    "SMALLINT": _INTS,
    "TINYINT": _INTS,
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BLOB": {"binary"},
}


def duck_types(con, sql: str) -> dict[str, str]:
    cur = con.execute(f"DESCRIBE {sql}")
    return {r[0].lower(): r[1] for r in cur.fetchall()}


def main() -> int:
    only = set(sys.argv[1:])
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    oracles = E.oracle_sql()
    n_bad = 0
    for k, fn in E.queries().items():
        if only and k not in only:
            continue
        if k not in oracles:
            continue
        try:
            sschema = {f.name.lower(): f.dataType.simpleString() for f in fn(spark, sf).schema.fields}
        except Exception as e:  # noqa: BLE001
            print(f"{k}: SPARK ERROR {type(e).__name__}: {str(e)[:160]}")
            n_bad += 1
            continue
        try:
            dtypes = duck_types(con, oracles[k])
        except Exception as e:  # noqa: BLE001
            print(f"{k}: ORACLE ERROR {type(e).__name__}: {str(e)[:160]}")
            n_bad += 1
            continue
        if set(sschema) != set(dtypes):
            print(f"{k}: COLUMN SET spark={sorted(sschema)} duck={sorted(dtypes)}")
            n_bad += 1
            continue
        for c, dt in dtypes.items():
            st = sschema[c]
            ok = DUCK_TO_SPARK.get(dt)
            if ok is None:
                print(f"{k}: col `{c}` duck type {dt} (unmapped — likely hash-red) vs spark {st}")
                n_bad += 1
            elif st.split("(")[0] not in ok:
                print(f"{k}: col `{c}` duck {dt} vs spark {st}")
                n_bad += 1
    print("ALL TYPES ALIGNED" if not n_bad else f"TYPE FINDINGS: {n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
