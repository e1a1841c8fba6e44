"""Time the DuckDB oracles (32 threads, min-of-N) at an arbitrary sf dir —
the single-node comparison column for BASELINE.md's upscale tables.

Usage: python tools/duck_times.py KEY [KEY ...]
       SPARK_GRAFT_SF_DIR=/tmp/gdalos_sf1/sf1 python tools/duck_times.py ...
"""
from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> int:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/gdalos_sf1/sf1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    import __spark_entry__ as E

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for p in glob.glob(f"{sf}/*.parquet"):
        con.execute(
            f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM read_parquet('{p}')"
        )
    oracles = E.oracle_sql()
    for k in sys.argv[1:]:
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            con.execute(oracles[k]).fetchall()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{k}: {best:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
