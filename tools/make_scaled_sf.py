"""Generate a key-shifted K-times upscale of a testdata scale factor.

Usage:  python tools/make_scaled_sf.py [K] [SRC_DIR] [DST_DIR] [--only=t1,t2]
        (defaults: 10  /root/testdata/sf0.1  /tmp/gdalos_sf1/sf1;
         --only restricts to the named tables — e.g. --only=documents
         for the dedup CC-gate A/Bs, which read nothing else)

Purpose: the driver's largest testdata is sf0.1 (~17 MB), where every
Spark query is dominated by fixed DAG/task-launch overhead (see
BASELINE.md). This produces a data-path-dominated bench input: each
scaled table is K replicas with join keys shifted by replica stride, so
FK joins resolve within a replica and per-key cardinalities match the
original. Document texts get a per-replica suffix (replicas become
near-duplicates, not exact ones — the realistic load for minhash/simhash
candidate generation). Events replicate with shifted event_ids and a
per-replica 37 ms time jitter — user_ids are KEPT, so the same
one-month window densifies K-fold (the realistic scale shape for
sessionization, windows, and watermark state: more events per user per
unit time, not a longer history). Dimension tables (region, nation)
are copied as-is.

This data is for THROUGHPUT measurement only — correctness gates always
run on the driver's own testdata.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SCALED = {
    # table: (key columns to shift by replica * (max(first_key)+1 of the
    # named stride table), text column or None)
    "customer": {"keys": {"c_custkey": "customer.c_custkey"}},
    "supplier": {"keys": {"s_suppkey": "supplier.s_suppkey"}},
    "part": {"keys": {"p_partkey": "part.p_partkey"}},
    "orders": {"keys": {"o_orderkey": "orders.o_orderkey", "o_custkey": "customer.c_custkey"}},
    "lineitem": {
        "keys": {
            "l_orderkey": "orders.o_orderkey",
            "l_partkey": "part.p_partkey",
            "l_suppkey": "supplier.s_suppkey",
        }
    },
    "documents": {"keys": {"doc_id": "documents.doc_id"}, "suffix": "text"},
    "embeddings": {"keys": {"vec_id": "embeddings.vec_id"}},
    "events": {"keys": {"event_id": "events.event_id"}, "jitter_ts": True},
}
COPIED = ("region", "nation")


def main() -> None:
    only = None
    argv = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    k = int(argv[0]) if len(argv) > 0 else 10
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    dst = argv[2] if len(argv) > 2 else "/tmp/gdalos_sf1/sf1"
    os.makedirs(dst, exist_ok=True)

    con = duckdb.connect()
    strides: dict[str, int] = {}
    for spec in SCALED.values():
        for ref in spec["keys"].values():
            table, col = ref.split(".")
            if ref not in strides:
                strides[ref] = (
                    con.execute(
                        f"SELECT MAX({col}) + 1 FROM read_parquet('{src}/{table}.parquet')"
                    ).fetchone()[0]
                )

    for t in COPIED:
        if only is not None and t not in only:
            continue
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"copied  {t}")

    for t, spec in SCALED.items():
        if only is not None and t not in only:
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        out = []
        for c in cols:
            if c in spec["keys"]:
                out.append(f"{c} + r.i * {strides[spec['keys'][c]]} AS {c}")
            elif c == spec.get("suffix"):
                out.append(f"CASE WHEN r.i = 0 THEN {c} ELSE {c} || ' r' || r.i END AS {c}")
            elif c == "ts" and spec.get("jitter_ts"):
                out.append("ts + r.i * INTERVAL 37 MILLISECOND AS ts")
            elif c == "n_chars" and spec.get("suffix"):
                out.append(
                    f"CASE WHEN r.i = 0 THEN n_chars ELSE n_chars + 2 + length(CAST(r.i AS VARCHAR)) END AS n_chars"
                )
            else:
                out.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(out)} "
            f"FROM read_parquet('{src}/{t}.parquet') CROSS JOIN (SELECT range AS i FROM range({k})) r) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"scaled  {t}: {n} rows")


if __name__ == "__main__":
    main()
