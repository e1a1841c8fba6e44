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
