"""Table loaders and the derived raster grid data model.

gdalos operates on GDAL rasters; the distributed equivalent is a **pixel
grid DataFrame** ``(band, px, py, value)`` partitioned by tile. The driver's
testdata has no raster files, so raster operators run on a deterministic
grid derived from `lineitem` with pure arithmetic (portable between Spark
and the DuckDB oracle — no engine hash functions):

    px    = l_orderkey mod W
    py    = (l_suppkey * 7 + l_linenumber) mod H
    band1 = sum(l_quantity)       (DECIMAL for bit-exact parity)
    band2 = sum(l_extendedprice)

At production scale the same schema comes straight off parquet partitioned
by (raster_id, tile_y, tile_x); every operator below only assumes the
schema, not the derivation.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Grid dimensions for the derived DEM. 64x64 at sf0.001 gives a dense grid;
# the derivation is scale-free (bigger SF -> denser cells, same extent).
# SPARK_GRAFT_GRID_W/H make CELL COUNT a scale axis (VERDICT r11 item 1:
# scale factor alone only grows the rows aggregated INTO each cell, never
# the cells — a 100-TB raster is 10^10+ cells, so the dem-family plans
# must be exercised at >=10^7 cells too; tools/grid_sweep.py). The driver
# and every correctness gate run the 64x64 default — hash gates are
# untouched. Both dims must be multiples of 64: that keeps the resample
# target grids (3/2 and 3/8 of the source axis) exact AND keeps the
# scene writers' row-major scene ids collision-free (SCENE=32 blocks;
# a dim that is a multiple of 8 but not of SCENE would alias scene ids,
# and a dim < SCENE would divide by zero in the scene encode).
GRID_W = int(os.environ.get("SPARK_GRAFT_GRID_W", "64"))
GRID_H = int(os.environ.get("SPARK_GRAFT_GRID_H", str(GRID_W)))
if any(g % 64 or g < 64 or g > 65536 for g in (GRID_W, GRID_H)):
    raise ValueError(
        f"SPARK_GRAFT_GRID_W/H must be multiples of 64 in [64, 65536], got {GRID_W}x{GRID_H}"
    )


_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_micros_sql(df: DataFrame, col: str = "ts") -> str:
    """SQL expression for the epoch-microseconds of an event-time column,
    branching on the ACTUAL scan schema rather than any session conf —
    parquet writers and Spark versions disagree on how the column arrives:

    * ``long``          — raw TIMESTAMP(NANOS) int64 (older Spark with
      ``spark.sql.legacy.parquet.nanosAsLong=true``). Integer ``div``, not
      ``/``: epoch-nanos (~1.7e18) exceed double's 2^53 exact range.
    * ``timestamp_ntz`` — Spark 4.1+ reads non-UTC-adjusted MICROS (and
      truncated NANOS) this way and IGNORES the legacy conf.
      ``timestampdiff`` against an NTZ epoch literal is pure wall-clock
      arithmetic, so the value is independent of the session time zone
      (a plain cast to ``timestamp`` is NOT — it shifts by the zone).
    * ``timestamp``     — already zone-adjusted; ``unix_micros`` is exact.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, LongType):
        return f"({col} div 1000)"
    if isinstance(dt, TimestampNTZType):
        return f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})"
    if isinstance(dt, TimestampType):
        return f"unix_micros({col})"
    raise TypeError(f"unsupported event-time type for column {col}: {dt}")


def epoch_micros(df: DataFrame, col: str = "ts") -> Column:
    return F.expr(epoch_micros_sql(df, col))


def source_fingerprint(path: str) -> str:
    """mtime+size cache key for staged copies of a source file — staging
    helpers restage when the driver regenerates testdata between rounds."""
    st = os.stat(path)
    return f"{st.st_mtime_ns}:{st.st_size}"


def footer_count(sf_dir: str, name: str) -> int:
    """Driver-side parquet-footer row count for a table — the same
    metadata a catalog or manifest would serve; no Spark job. Used to
    gate two-regime operators (collapse paths, exact-vs-sampled
    delegation) on actual data size."""
    import glob

    import pyarrow.parquet as pq

    p = f"{sf_dir}/{name}.parquet"
    files = [p] if os.path.isfile(p) else glob.glob(f"{p}/*.parquet")
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def publish_staged_dir(build, final_dir: str, fingerprint: str) -> str:
    """Fingerprint-gated staging with an ATOMIC publish: if `final_dir`
    already carries `fingerprint` in its `_STAGED` marker, return it
    untouched; otherwise `build(tmp_path)` populates a unique hidden
    sibling dir, the marker is stamped INTO it, and one `os.rename`
    swaps it into place. A concurrent session therefore only ever sees
    a complete store — never the rmtree/overwrite window of the naive
    check-then-rebuild (a marker written after an in-place rebuild
    leaves readers a missing or partially written store mid-build)."""
    import shutil
    import tempfile

    marker = os.path.join(final_dir, "_STAGED")
    try:
        with open(marker) as f:
            if f.read() == fingerprint:
                return final_dir
    except OSError:
        pass
    parent = os.path.dirname(final_dir) or "."
    os.makedirs(parent, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".{os.path.basename(final_dir)}.", dir=parent)
    data = os.path.join(tmp, "data")
    try:
        build(data)
        with open(os.path.join(data, "_STAGED"), "w") as f:
            f.write(fingerprint)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)  # never leak a partial build
        raise
    old = None
    try:
        if os.path.exists(final_dir):
            old = os.path.join(parent, f".old.{os.path.basename(tmp)}")
            os.rename(final_dir, old)
        os.rename(data, final_dir)
    except OSError:
        # Swallow ONLY the concurrent-publish race: the swap may fail
        # because another session installed a store between our check
        # and rename — legitimate iff the installed marker carries OUR
        # fingerprint. Any other failure restores the previous store
        # and re-raises instead of silently serving stale data.
        published = False
        try:
            with open(marker) as f:
                published = f.read() == fingerprint
        except OSError:
            pass
        if not published:
            if old is not None and not os.path.exists(final_dir):
                os.rename(old, final_dir)
                old = None
            shutil.rmtree(tmp, ignore_errors=True)
            raise
    shutil.rmtree(tmp, ignore_errors=True)
    if old:
        shutil.rmtree(old, ignore_errors=True)
    return final_dir


def read_plain(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """The plain parquet scan with load()'s value normalization but no
    layout substitution — what staging helpers read so their copies are
    value-identical to the un-staged path."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and not isinstance(df.schema["ts"].dataType, TimestampType):
        # normalize ts to a zone-adjusted TIMESTAMP whose internal micros
        # equal the stored epoch value, whatever type the scan produced
        df = df.withColumn("ts", F.timestamp_micros(epoch_micros(df)))
    return df


# Per-query persisted frames (same contract as dedup._COLLAPSE_CACHES):
# a query function's persists must outlive its RETURNED lazy plan, so they
# can't be unpersisted inside the function — instead each query registers
# them here and the NEXT registering query (or an explicit release) frees
# the previous batch, bounding a long session to one query's cached blocks
# instead of leaking a set per call (round-9 ADVICE: dedup_clusters
# sgroups, ann_ivfpq_residual_topk scored).
_QUERY_CACHES: list[DataFrame] = []


def release_query_caches() -> None:
    """Unpersist every frame registered by the most recent query."""
    while _QUERY_CACHES:
        try:
            _QUERY_CACHES.pop().unpersist()
        except Exception:  # noqa: BLE001 — session already stopped
            pass


def register_query_caches(*dfs: DataFrame) -> None:
    """Release the previous query's registered persists, then track
    ``dfs`` until the next query (or release_query_caches) frees them."""
    release_query_caches()
    _QUERY_CACHES.extend(dfs)


def append_query_caches(*dfs: DataFrame) -> None:
    """Track ``dfs`` WITHOUT releasing the current batch — for a
    composite operator whose own persists are built on top of a callee's
    registered caches (releasing those would force the composite's lazy
    plan to recompute the callee's shared subtree)."""
    _QUERY_CACHES.extend(dfs)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from gdalos_spark.sources import bucketed

    if name in bucketed.BUCKETED_FACTS:
        # serve the bucketed copy when one is staged for this exact
        # source fingerprint (sources/bucketed.py): the repeated
        # orders⋈lineitem edge then plans bucket-to-bucket and the
        # user_id window family reads pre-clustered, pre-sorted events —
        # zero exchanges, the layout contract that survives 100 TB
        bt = bucketed.attach(spark, sf_dir, name)
        if bt is not None:
            return bt
    return read_plain(spark, sf_dir, name)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def split_for_cpu(df: DataFrame, *keys: str) -> DataFrame:
    """Re-spread a split-starved scan across cores before a CPU-bound map.

    ``repartition(n, key)`` is ALWAYS a full hash exchange — never a no-op
    — so calling it unconditionally would shuffle the whole corpus before
    every per-row scoring stage at production scale. Gate it on actual
    scan parallelism instead: a tiny-but-row-heavy file (a 2.8 MB /
    500k-row documents.parquet arrives as ONE split no matter how small
    ``spark.sql.files.maxPartitionBytes`` is — byte-range splitting cannot
    subdivide a small single-row-group file) gets hash-spread across the
    session's parallelism, while any input whose scan already has at least
    half the shuffle partitions keeps its layout and pays NO exchange.
    At 100 TB the scan has thousands of splits, so this is statically a
    pass-through; only the degenerate local/bench layouts take the
    shuffle, and those are exactly the cases where it wins (measured
    10.9s -> ~1s for text_quality_score at the sf10 single-split upscale).
    """
    spark = df.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= max(2, n_part // 2):
        return df
    return df.repartition(n_part, *keys)


def dem_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived two-band DEM grid: (px, py, elev, price).

    elev / price are DECIMAL(18,2) sums => bit-exact vs the SQL oracle.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            (F.col("l_orderkey") % GRID_W).cast("int").alias("px"),
            ((F.col("l_suppkey") * 7 + F.col("l_linenumber")) % GRID_H).cast("int").alias("py"),
            F.col("l_quantity").cast("decimal(18,2)").alias("q"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
        )
        .groupBy("px", "py")
        .agg(F.sum("q").alias("elev"), F.sum("p").alias("price"))
    )


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic point cloud from events: deterministic pseudo-random
    coordinates in [0, 64) derived with pure integer arithmetic (portable
    to the SQL oracle), value kept as DECIMAL."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        ((F.col("event_id") * 7919 % 6400) / 100.0).alias("x"),
        ((F.col("event_id") * 104729 % 6400) / 100.0).alias("y"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )


EVENTS_POINTS_SQL = """
SELECT event_id, event_type,
  (event_id * 7919 % 6400) / 100.0 AS x,
  (event_id * 104729 % 6400) / 100.0 AS y,
  CAST(value AS DECIMAL(18,2)) AS v
FROM events
"""


def orders_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second raster for algebra/mosaic ops, derived from orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            (F.col("o_orderkey") % GRID_W).cast("int").alias("px"),
            ((F.col("o_custkey") * 11) % GRID_H).cast("int").alias("py"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("t"),
        )
        .groupBy("px", "py")
        .agg(F.sum("t").alias("val"))
    )


ORDERS_GRID_SQL = f"""
SELECT
  CAST(o_orderkey % {GRID_W} AS INTEGER) AS px,
  CAST((o_custkey * 11) % {GRID_H} AS INTEGER) AS py,
  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS val
FROM orders
GROUP BY 1, 2
"""


def customer_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample points for pixel lookup, derived from customer keys."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        ((F.col("c_custkey") * 17 % 6400) / 100.0).alias("cx"),
        ((F.col("c_custkey") * 23 % 6400) / 100.0).alias("cy"),
    )


CUSTOMER_POINTS_SQL = """
SELECT c_custkey,
  (c_custkey * 17 % 6400) / 100.0 AS cx,
  (c_custkey * 23 % 6400) / 100.0 AS cy
FROM customer
"""


# The same derivation as ANSI SQL, reusable inside oracle queries.
DEM_GRID_SQL = f"""
SELECT
  CAST(l_orderkey % {GRID_W} AS INTEGER) AS px,
  CAST((l_suppkey * 7 + l_linenumber) % {GRID_H} AS INTEGER) AS py,
  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS elev,
  SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS price
FROM lineitem
GROUP BY 1, 2
"""
