"""Composite pipeline operators (SURVEY §2 #49) — the end-to-end shapes
an LLM-training-data pipeline actually runs: quality scoring + dedup
keep-list + filtering + per-source reporting composed from the operator
library, in one lazy plan.

This is the point of building operators as DataFrame transformations:
composition is free (Catalyst fuses the stages), and the whole pipeline
stays declarative — one shuffle for the dedup keep-list, one broadcast
join to apply it, one agg for the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdalos_spark.operators.text import TEXT_QUALITY_SCORE_SQL, text_quality_score
from gdalos_spark.datamodel import load

QUALITY_MIN = 0.5
TOKENS_MIN = 20


def corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report after the standard keep pipeline:
    keep a doc iff (a) it is the canonical copy of its exact-dup group
    (min doc_id per content hash), (b) quality >= QUALITY_MIN, and
    (c) token count >= TOKENS_MIN. Reports per source: doc counts,
    keep counts/rate, kept token volume."""
    docs = load(spark, sf_dir, "documents")
    quality = text_quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    canonical = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc_id").alias("keep_id"))
    keep_ids = canonical.select(F.col("keep_id").alias("doc_id")).distinct()
    scored = (
        docs.select("doc_id", "source")
        .join(quality, "doc_id")
        .join(keep_ids.withColumn("is_canonical", F.lit(1)), "doc_id", "left")
    )
    keep = (
        (F.col("is_canonical") == 1)
        & (F.col("quality") >= QUALITY_MIN)
        & (F.col("n_tokens") >= TOKENS_MIN)
    ).cast("int")
    return (
        scored.withColumn("keep", keep)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_keep"),
            (F.sum("keep") / F.count(F.lit(1)).cast("double")).alias("keep_rate"),
            F.sum(F.when(F.col("keep") == 1, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


CORPUS_FILTER_SQL = f"""
WITH quality AS ({TEXT_QUALITY_SCORE_SQL}),
canonical AS (SELECT md5(text) AS h, MIN(doc_id) AS keep_id FROM documents GROUP BY 1),
scored AS (
  SELECT d.doc_id, d.source, q.n_tokens, q.quality,
         CASE WHEN k.keep_id IS NOT NULL THEN 1 ELSE NULL END AS is_canonical
  FROM documents d
  JOIN quality q ON d.doc_id = q.doc_id
  LEFT JOIN (SELECT DISTINCT keep_id FROM canonical) k ON d.doc_id = k.keep_id
),
flagged AS (
  SELECT *, CAST(is_canonical = 1 AND quality >= {QUALITY_MIN} AND n_tokens >= {TOKENS_MIN} AS INTEGER) AS keep
  FROM scored
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(keep) AS BIGINT) AS n_keep,
       SUM(keep) / CAST(COUNT(*) AS DOUBLE) AS keep_rate,
       CAST(SUM(CASE WHEN keep = 1 THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
FROM flagged GROUP BY source
"""


# ---------------------------------------------------------------------------
# 56. corpus_sample_stratified — deterministic per-source hash sampling
# ---------------------------------------------------------------------------

from gdalos_spark.functions.hashing import P31, hash_base, hash_base_sql


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified corpus sampling, the way a training-data pipeline mixes
    sources: each source gets a deterministic sampling rate in [10%, 50%]
    (derived from the portable md5 hash of the source name — in real use
    the rates come from a mixing config), and a doc is kept iff the md5
    hash of its id falls under the rate. Hash sampling is reproducible,
    join-free, and map-side only: the single shuffle is the tiny
    per-source report agg. At 100 TB the same plan streams the corpus
    once, no sort, no sample() nondeterminism."""
    docs = load(spark, sf_dir, "documents")
    rate = (F.lit(10) + hash_base(F.col("source")) % 41).alias("rate_pct")
    bucket = hash_base(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 100
    tagged = docs.select(
        "source",
        rate,
        (bucket < F.col("rate_pct")).cast("int").alias("kept"),
    )
    return (
        tagged.groupBy("source", "rate_pct")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").cast("bigint").alias("n_kept"),
        )
        .select(
            "source",
            F.col("rate_pct").cast("int").alias("rate_pct"),
            "n_total",
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_total").cast("double"), 6).alias("kept_frac"),
        )
    )


CORPUS_SAMPLE_STRATIFIED_SQL = f"""
WITH tagged AS (
  SELECT source,
         10 + {hash_base_sql("source")} % 41 AS rate_pct,
         CAST({hash_base_sql("'sample:' || CAST(doc_id AS VARCHAR)")} % 100
              < 10 + {hash_base_sql("source")} % 41 AS INTEGER) AS kept
  FROM documents
)
SELECT source, CAST(rate_pct AS INTEGER) AS rate_pct,
       COUNT(*) AS n_total, CAST(SUM(kept) AS BIGINT) AS n_kept,
       ROUND(SUM(kept) / CAST(COUNT(*) AS DOUBLE), 6) AS kept_frac
FROM tagged
GROUP BY 1, 2
"""
