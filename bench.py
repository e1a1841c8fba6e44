"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

`python bench.py --smoke` is the pre-flight: load() every table under a
VANILLA session (no tuned configs — the driver's environment) and run one
count each, so a loader/schema regression fails loudly in seconds instead
of silently zeroing a round's bench signal (the round-3 failure mode:
events.parquet changed physical timestamp type and the whole bench
crashed in warmup). Exits non-zero on any failure.

Each query is forced end-to-end with the `noop` sink (full computation,
no driver-side collect). Headline set = the most expensive representative
plan shapes: full-scan agg, multi-join, window/sessionize, raster join,
dedup LSH, ANN — the ones whose plans must survive a 100x scale-up.
See BASELINE.md for the single-node comparison numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_orders",
    "region_volume",
    "events_sessionize",
    "events_windowed_agg",
    "rasterize_points",
    "raster_calc_expr",
    "raster_mosaic",
    "raster_info",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality_score",
    "doc_fingerprint",
    "raster_hillshade",
    "corpus_filter",
    "viewshed_observer_count",
    "dedup_clusters",
    "text_pii_flag",
    "corpus_sample_stratified",
]


def smoke() -> int:
    """Vanilla-session pre-flight: every table must load() and count()."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gdalos_spark-smoke")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from gdalos_spark.datamodel import TABLES, load

    failures: dict[str, str] = {}
    counts: dict[str, int] = {}
    for t in TABLES:
        try:
            counts[t] = load(spark, sf_dir, t).count()
        except Exception as e:  # noqa: BLE001
            failures[t] = f"{type(e).__name__}: {e}"[:300]
    print(json.dumps({"metric": "smoke", "counts": counts, "failures": failures}))
    return 1 if failures else 0


def bench_conf(cpus: str) -> dict[str, str]:
    """Session configuration for the bench (shared with tools/dump_plans.py
    so committed plan artifacts show exactly what the bench times). Every
    entry is a production-sane default, not a local[32] tune:

    - AQE + partition coalescing: the guide's (and Spark's) baseline.
    - shuffle.partitions = max(cores, 32): scales with the session's
      cores; AQE coalesces below it when volumes are small.
    - maxPartitionBytes 16m: upscaled single-file parquet (600 MB+)
      otherwise gives only size/128MB scan tasks — far fewer than cores.
      16 MB splits keep every core scanning at sf>=1 and change nothing
      at sf0.1 (files there are < 16 MB already).
    - preferSortMergeJoin=false (round-12, guide §3.1/§9): lets the
      planner pick shuffled-hash join when its size conditions hold —
      the planner still requires the build side to fit per-partition,
      so this is NOT a forced hint; sort-merge remains the fallback for
      big-build joins. Plan-level effect (committed r12 artifacts): the
      headline query it changes is dedup_clusters, whose per-round CC
      joins go SMJ->SHJ (plans/r12: 10 SMJ -> 2, 4 SHJ appear; measured
      4.74->3.84s same-session). The other headline plans are unchanged
      (dims already broadcast; the full-outer mosaic edges keep SMJ at
      plan time because their stats estimates exceed the local-hash-map
      gate) — same-session deltas observed on them (raster_mosaic
      1.24->0.99s, region_volume 1.01->0.78s) sit inside the host band
      and are NOT attributed to this conf.
    - AQE initialPartitionNum derived from the DEM cell count (round-12,
      guide §2.2/§5 "fewer, larger reduce partitions ... let AQE
      coalesce" + spill bounds): the big-grid stencil/kernel shuffles
      are O(cells), so initial shuffle partitions hold a constant
      ~2^18 cells each (~85 MB of pass-2 kernel rows) and AQE coalesces
      everything smaller back down. shuffle.partitions itself must NOT
      be raised for this: split_for_cpu()'s explicit repartition(n, key)
      derives from it and is not AQE-coalescible. At the driver's 64x64
      dims the derived value never exceeds the base partitions, so the
      conf is omitted and the bench session is byte-identical to r11's.
      Measured at the 8192x8192-cell grid (interleaved same-session
      A/Bs): raster_resample_lanczos 221.4 -> 193.4s warm and the cold
      spill cliff (370.9s) gone; raster_sieve 151.1 -> 102.4s; 512/1024
      regress on the same data (quadratic block growth, guide §2.2) —
      constant cells-per-partition is the scale rule, not "more".
    """
    base_parts = max(int(cpus), 32)
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.shuffle.partitions": str(base_parts),
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    }
    grid_w = int(os.environ.get("SPARK_GRAFT_GRID_W", "64"))
    grid_h = int(os.environ.get("SPARK_GRAFT_GRID_H", str(grid_w)))
    init_parts = (grid_w * grid_h) >> 18
    if init_parts > base_parts:
        conf["spark.sql.adaptive.coalescePartitions.initialPartitionNum"] = str(
            min(init_parts, 4096)
        )
    return conf


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master(f"local[{cpus}]").appName(
        "gdalos_spark-bench"
    )
    for k, v in bench_conf(cpus).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # SPARK_GRAFT_BENCH_QUERIES: optional comma-separated subset for ad-hoc
    # runs at other scale factors (e.g. the sf1 upscale in BASELINE.md).
    # The default HEADLINE set is the recorded contract — never change it
    # without re-recording BASELINE.md totals in the same commit.
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    names = [s.strip() for s in subset.split(",") if s.strip()] if subset else HEADLINE

    # Untimed warmup: JVM/codegen/parquet-footer costs are session-scoped,
    # not per-query; steady-state latency is what scales to a real cluster.
    # Warmup failure is non-fatal: it only costs timing fidelity, never the
    # round's perf record (round 3 lost its entire bench to one schema
    # surprise in warmup — never again).
    from gdalos_spark.datamodel import load

    errors: dict[str, str] = {}
    # Untimed ingest step: stage the orderkey-bucketed orders/lineitem so
    # the default loader serves the exchange-free layout for every
    # fact-join query below — the "pay the bucketing shuffle once at
    # ingest" contract, exercised the way a real deployment would.
    # SPARK_GRAFT_SKIP_STAGE=1 skips the ingest staging — the A/B knob for
    # measuring the plain-parquet arm (pair it with a throwaway
    # GDALOS_BUCKETED_ROOT so attach() finds nothing). Compared against
    # the literal "1" so =0/false doesn't silently skip.
    if os.environ.get("SPARK_GRAFT_SKIP_STAGE") != "1":
        try:
            from gdalos_spark.sources.bucketed import stage_facts

            stage_facts(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            errors["stage_bucketed"] = f"{type(e).__name__}: {e}"[:300]
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            load(spark, sf_dir, t).count()
        except Exception as e:  # noqa: BLE001
            errors[f"warmup:{t}"] = f"{type(e).__name__}: {e}"[:300]
            # keep warming the remaining, independent tables

    # The host is shared: a neighbor's load spike can inflate a single
    # run 5-30x. Run each query REPS times and report the minimum — the
    # closest observation to the true cost of the plan.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        best = None
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001
            # One broken query must not zero the whole bench: record the
            # error, keep every other timing.
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            continue
        timings[name] = round(best, 3)

    # Same-session DuckDB arm: the recorded 18.6 s baseline is from a
    # host whose same-code walls span 12.7-24.5 s (BASELINE.md "session
    # bench band"), so absolute round-over-round walls are mostly host
    # noise. Timing the SAME 21 oracle queries with DuckDB at 32 threads
    # in the SAME session gives a denominator that moves with the host:
    # spark_vs_duckdb_ratio is the host-independent headline
    # (VERDICT r11 item 4). The wall stays for continuity.
    duck_timings: dict[str, float] = {}
    try:
        import glob as _glob

        import duckdb

        con = duckdb.connect()
        con.execute(f"SET threads TO {int(cpus)}")
        for p in _glob.glob(f"{sf_dir}/*.parquet"):
            con.execute(
                f"CREATE VIEW {os.path.basename(p)[:-8]} AS "
                f"SELECT * FROM read_parquet('{p}')"
            )
        oracles = entrymod.oracle_sql()
        for name in names:
            sql = oracles.get(name)
            if sql is None:
                continue
            best = None
            try:
                for _ in range(reps):
                    t0 = time.perf_counter()
                    con.execute(sql).fetchall()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as e:  # noqa: BLE001
                errors[f"duckdb:{name}"] = f"{type(e).__name__}: {e}"[:300]
                continue
            duck_timings[name] = round(best, 3)
    except Exception as e:  # noqa: BLE001
        errors["duckdb"] = f"{type(e).__name__}: {e}"[:300]

    spark_total = round(sum(timings.values()), 3)
    # ratio over the queries BOTH arms completed — a one-sided failure
    # must not skew the denominator
    shared = sorted(set(timings) & set(duck_timings))
    out = {
        "metric": "headline_query_wall_time",
        "value": spark_total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if duck_timings:
        s_shared = sum(timings[k] for k in shared)
        d_shared = sum(duck_timings[k] for k in shared)
        out["duckdb_queries"] = duck_timings
        out["duckdb_value"] = round(sum(duck_timings.values()), 3)
        if d_shared > 0:
            out["spark_vs_duckdb_ratio"] = round(s_shared / d_shared, 3)
            out["ratio_n_queries"] = len(shared)
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    if "--smoke" in sys.argv:
        raise SystemExit(smoke())
    main()
