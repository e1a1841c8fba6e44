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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
GRID_W = 64
GRID_H = 64


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # set here too so driver-owned sessions (not built by our factory)
        # can read the TIMESTAMP(NANOS) column
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # TIMESTAMP(NANOS) arrives as long (see session.py); convert to
        # a proper timestamp column at microsecond precision.
        df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


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
