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
from pyspark.sql.window import Window

from gdalos_spark.functions import hashing
from gdalos_spark.operators.text import TEXT_QUALITY_SCORE_SQL, text_quality_score
from gdalos_spark.datamodel import load, split_for_cpu

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


# ---------------------------------------------------------------------------
# 91. benchmark_contamination — eval-set n-gram decontamination scan
# ---------------------------------------------------------------------------

CONTAM_NGRAM = 8  # overlapping word 8-grams, the common decontamination unit
CONTAM_EVAL_MOD = 101  # doc_id % 101 == 0 -> held-out "benchmark" docs
CONTAM_FLAG_FRAC = 0.05


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing word
    8-grams with a held-out benchmark set (here: every 101st doc stands
    in for the eval benchmark). Both sides explode to OVERLAPPING 8-grams
    hashed to 60-bit md5 ints, so the contamination check is one
    equi-join on the hash — long strings never shuffle, and the
    benchmark-side distinct gram table is orders of magnitude smaller
    than the corpus (broadcastable in practice; left as an equi-join so
    the plan also holds when the eval suite is huge). Docs shorter than
    8 words have no grams and report 0/0.
    """
    # parallelize the gram pipeline when the table arrives as one input
    # split (cheap redistribution; no-op at real scale)
    docs = split_for_cpu(load(spark, sf_dir, "documents"), "doc_id")
    # words staged as a column: split() inside the transform lambda would
    # re-split the document once per gram index (O(words^2) per doc)
    words = docs.select("doc_id", F.split(F.col("text"), " ").alias("words"))
    gram_expr = (
        "CASE WHEN size(words) >= {n} THEN "
        "transform(sequence(0, size(words) - {n}), "
        "i -> concat_ws(' ', slice(words, i + 1, {n}))) "
        "ELSE array() END"
    ).format(n=CONTAM_NGRAM)
    corpus = words.filter(F.col("doc_id") % CONTAM_EVAL_MOD != 0)
    evals = words.filter(F.col("doc_id") % CONTAM_EVAL_MOD == 0)
    corpus_grams = corpus.select(
        "doc_id", F.explode_outer(F.expr(gram_expr)).alias("gram")
    ).select("doc_id", hashing.md5_int60(F.col("gram")).alias("h"))
    eval_hashes = (
        evals.select(F.explode(F.expr(gram_expr)).alias("gram"))
        .select(hashing.md5_int60(F.col("gram")).alias("h"))
        .distinct()
    )
    hit = corpus_grams.join(
        eval_hashes.select(F.col("h").alias("eh")), corpus_grams.h == F.col("eh"), "left"
    ).select(
        "doc_id",
        F.col("h").isNotNull().cast("int").alias("is_gram"),
        F.col("eh").isNotNull().cast("int").alias("is_hit"),
    )
    frac = F.when(
        F.sum("is_gram") > 0, F.sum("is_hit") / F.sum("is_gram").cast("double")
    ).otherwise(F.lit(0.0))
    return hit.groupBy("doc_id").agg(
        F.sum("is_gram").cast("bigint").alias("n_grams"),
        F.sum("is_hit").cast("bigint").alias("n_contaminated"),
        F.round(frac, 6).alias("contam_frac"),
        (frac > CONTAM_FLAG_FRAC).cast("int").alias("contaminated"),
    )


def _contam_sql() -> str:
    gram = f"array_to_string(words[(i + 1):(i + {CONTAM_NGRAM})], ' ')"
    return f"""
WITH w AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents),
corpus_grams AS (
  SELECT doc_id, {hashing.md5_int60_sql(gram)} AS h
  FROM (
    SELECT doc_id, words,
           CAST(unnest(range(GREATEST(len(words) - {CONTAM_NGRAM} + 1, 0))) AS INTEGER) AS i
    FROM w WHERE doc_id % {CONTAM_EVAL_MOD} <> 0
  )
),
corpus_docs AS (SELECT doc_id FROM w WHERE doc_id % {CONTAM_EVAL_MOD} <> 0),
eval_hashes AS (
  SELECT DISTINCT {hashing.md5_int60_sql(gram)} AS h
  FROM (
    SELECT doc_id, words,
           CAST(unnest(range(GREATEST(len(words) - {CONTAM_NGRAM} + 1, 0))) AS INTEGER) AS i
    FROM w WHERE doc_id % {CONTAM_EVAL_MOD} = 0
  )
),
hits AS (
  SELECT g.doc_id, 1 AS is_gram,
         CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END AS is_hit
  FROM corpus_grams g LEFT JOIN eval_hashes e USING (h)
),
agg AS (
  SELECT d.doc_id,
         COALESCE(SUM(is_gram), 0) AS n_grams,
         COALESCE(SUM(is_hit), 0) AS n_contaminated
  FROM corpus_docs d LEFT JOIN hits USING (doc_id)
  GROUP BY d.doc_id
)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_contaminated AS BIGINT) AS n_contaminated,
       ROUND(CASE WHEN n_grams > 0
                  THEN n_contaminated / CAST(n_grams AS DOUBLE) ELSE 0.0 END, 6) AS contam_frac,
       CAST(CASE WHEN n_grams > 0
                 THEN n_contaminated / CAST(n_grams AS DOUBLE) ELSE 0.0 END
            > {CONTAM_FLAG_FRAC} AS INTEGER) AS contaminated
FROM agg
"""


BENCHMARK_CONTAMINATION_SQL = _contam_sql()


# ---------------------------------------------------------------------------
# 92. corpus_mix_sample — weighted source-mixture sampling to a target size
# ---------------------------------------------------------------------------

MIX_TARGET_DOCS = 3000


def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: sample each source at a rate that realizes a target
    mixture (relative weight 1 + src_num % 4 per source, the stand-in for
    a real mixing config) over a MIX_TARGET_DOCS budget. rate_s =
    min(1, (w_s / W) * target / n_s) is computed from one tiny per-source
    agg + a 1-row broadcast total; docs are then kept by deterministic
    md5-bucket < rate — reproducible, join-free on the corpus side,
    map-side sampling exactly like corpus_sample_stratified. The report
    emits planned rate vs achieved fraction per source."""
    docs = load(spark, sf_dir, "documents")
    src_w = (1 + F.substring(F.col("source"), 4, 10).cast("int") % 4).alias("w_rel")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
    ).select("source", src_w.cast("double").alias("w_rel"), "n_total")
    total = per_src.agg(F.sum("w_rel").alias("w_total"))
    rated = per_src.crossJoin(F.broadcast(total)).select(
        "source", "n_total",
        F.least(
            F.lit(1.0),
            (F.col("w_rel") / F.col("w_total")) * MIX_TARGET_DOCS / F.col("n_total").cast("double"),
        ).alias("rate"),
    )
    bucket = (
        hashing.hash_base(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1_000_000
    )
    kept = docs.select("source", bucket.alias("b")).join(
        F.broadcast(rated), "source"
    ).select(
        "source", "n_total", "rate",
        (F.col("b") < F.floor(F.col("rate") * 1_000_000)).cast("int").alias("kept"),
    )
    return (
        kept.groupBy("source", "n_total", "rate")
        .agg(F.sum("kept").cast("bigint").alias("n_kept"))
        .select(
            "source", "n_total",
            F.round("rate", 6).alias("rate"),
            "n_kept",
            F.round(F.col("n_kept") / F.col("n_total").cast("double"), 6).alias("achieved_frac"),
        )
    )


CORPUS_MIX_SAMPLE_SQL = f"""
WITH per_src AS (
  SELECT source,
         CAST(1 + CAST(substring(source, 4) AS INTEGER) % 4 AS DOUBLE) AS w_rel,
         COUNT(*) AS n_total
  FROM documents GROUP BY source
),
total AS (SELECT SUM(w_rel) AS w_total FROM per_src),
rated AS (
  SELECT source, n_total,
         LEAST(1.0, (w_rel / w_total) * {MIX_TARGET_DOCS} / CAST(n_total AS DOUBLE)) AS rate
  FROM per_src CROSS JOIN total
),
kept AS (
  SELECT d.source, r.n_total, r.rate,
         CAST({hashing.hash_base_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000
              < FLOOR(r.rate * 1000000) AS INTEGER) AS kept
  FROM documents d JOIN rated r USING (source)
)
SELECT source, n_total, ROUND(rate, 6) AS rate,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       ROUND(SUM(kept) / CAST(n_total AS DOUBLE), 6) AS achieved_frac
FROM kept GROUP BY source, n_total, rate
"""

# ---------------------------------------------------------------------------
# 100. sequence_packing — concat-and-chunk context-window packing
# ---------------------------------------------------------------------------

PACK_CTX = 128  # tokens per packed training sequence
PACK_SHARDS = 8  # independent packing streams per source


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style training-sequence packing: documents are concatenated in
    a deterministic order and chunked into fixed PACK_CTX-token
    sequences (documents may span a chunk boundary). Each (source,
    shard) pair is an independent packing stream — the shard is a
    portable hash of the doc id, so at 100 TB the prefix sum never
    serializes a whole source onto one task; each stream is one window
    partition, exactly how a per-worker packer behaves in production.

    Per document: its shard, token count, stream offset, the first/last
    sequence ids it lands in, and whether it straddles a boundary. All
    arithmetic is integer (cumulative BIGINT sums + integer division);
    one window shuffle on (source, shard), nothing else.
    """
    docs = load(spark, sf_dir, "documents")
    shard = hash_base(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))) % PACK_SHARDS
    d = docs.select(
        "doc_id",
        "source",
        shard.cast("int").alias("shard"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    out = cum.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        (F.col("cum_tokens") - F.col("n_tokens")).alias("offset"),
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / PACK_CTX).cast("bigint").alias("first_seq"),
        F.floor((F.col("cum_tokens") - 1) / PACK_CTX).cast("bigint").alias("last_seq"),
        (
            F.floor((F.col("cum_tokens") - 1) / PACK_CTX)
            - F.floor((F.col("cum_tokens") - F.col("n_tokens")) / PACK_CTX)
            > 0
        ).cast("int").alias("spans_boundary"),
    )
    return out.orderBy("source", "shard", "doc_id")


SEQUENCE_PACKING_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST({hash_base_sql("'pack:' || CAST(doc_id AS VARCHAR)")} % {PACK_SHARDS} AS INTEGER) AS shard,
         CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  SELECT *, SUM(n_tokens) OVER (
           PARTITION BY source, shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS cum_tokens
  FROM d
)
SELECT doc_id, source, shard, n_tokens,
       CAST(cum_tokens - n_tokens AS BIGINT) AS offset,
       CAST(FLOOR((cum_tokens - n_tokens) / {PACK_CTX}.0) AS BIGINT) AS first_seq,
       CAST(FLOOR((cum_tokens - 1) / {PACK_CTX}.0) AS BIGINT) AS last_seq,
       CAST(FLOOR((cum_tokens - 1) / {PACK_CTX}.0)
            - FLOOR((cum_tokens - n_tokens) / {PACK_CTX}.0) > 0 AS INTEGER) AS spans_boundary
FROM cum
ORDER BY source, shard, doc_id
"""


# ---------------------------------------------------------------------------
# 109. corpus_curation_report — the end-to-end keep/drop decision table
#     (what a training-data pipeline actually materializes before
#     tokenization: every per-doc curation signal joined into one row
#     with the final keep bit and the first drop reason by precedence)
# ---------------------------------------------------------------------------

PPL_MAX_BITS = 4.95  # unigram-surprise ceiling (mean -log2 p per token)


def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full curation decision per document, composed from the operator
    library in one lazy plan: exact dedup (corpus-wide md5 first-
    occurrence), benchmark membership + 8-gram contamination, SemDeDup
    semantic duplicates (embeddings keyed by doc_id), C4 line-filter
    page rule, and the unigram perplexity-proxy ceiling. keep=1 iff no
    signal fires; drop_reason is the FIRST firing signal by the standard
    pipeline precedence (benchmark > exact_dup > contaminated >
    semantic_dup > c4_fail > high_ppl). Every input is itself an
    oracle-gated operator, so this row is reproducible end to end; the
    joins are all equi-joins on doc_id and Catalyst fuses the shared
    document scans."""
    from gdalos_spark.operators.dedup import semantic_dedup
    from gdalos_spark.operators.text import text_c4_filters, text_unigram_logprob

    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    hashes = load(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("h")
    )
    firsts = hashes.groupBy("h").agg(F.min("doc_id").alias("first_id"))
    exact = hashes.join(firsts, "h").select(
        "doc_id", (F.col("doc_id") > F.col("first_id")).cast("int").alias("is_exact_dup")
    )
    c4 = text_c4_filters(spark, sf_dir).select(
        "doc_id", F.col("keep_doc").alias("c4_keep")
    )
    ppl = text_unigram_logprob(spark, sf_dir).select("doc_id", "mean_bits")
    ct = benchmark_contamination(spark, sf_dir).select("doc_id", "contaminated")
    sd = semantic_dedup(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("is_dup").alias("semantic_dup")
    )
    j = (
        docs.join(exact, "doc_id")
        .join(c4, "doc_id")
        .join(ppl, "doc_id")
        .join(ct, "doc_id", "left")
        .join(sd, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            (F.col("doc_id") % CONTAM_EVAL_MOD == 0).cast("int").alias("is_benchmark"),
            "is_exact_dup",
            F.coalesce(F.col("contaminated"), F.lit(0)).alias("contaminated"),
            F.coalesce(F.col("semantic_dup"), F.lit(0)).alias("semantic_dup"),
            "c4_keep",
            "mean_bits",
            (F.col("mean_bits") > PPL_MAX_BITS).cast("int").alias("high_ppl"),
        )
    )
    reason = (
        F.when(F.col("is_benchmark") == 1, "benchmark")
        .when(F.col("is_exact_dup") == 1, "exact_dup")
        .when(F.col("contaminated") == 1, "contaminated")
        .when(F.col("semantic_dup") == 1, "semantic_dup")
        .when(F.col("c4_keep") == 0, "c4_fail")
        .when(F.col("high_ppl") == 1, "high_ppl")
        .otherwise("kept")
    )
    return j.select(
        "doc_id", "source", "is_benchmark", "is_exact_dup", "contaminated",
        "semantic_dup", "c4_keep", "high_ppl", "mean_bits",
        reason.alias("drop_reason"),
        (reason == "kept").cast("int").alias("keep"),
    )


def _curation_sql() -> str:
    from gdalos_spark.operators.dedup import SEMANTIC_DEDUP_SQL
    from gdalos_spark.operators.text import TEXT_C4_FILTERS_SQL, TEXT_UNIGRAM_LOGPROB_SQL

    return f"""
WITH exact AS (
  SELECT doc_id,
         CASE WHEN doc_id > MIN(doc_id) OVER (PARTITION BY md5(text)) THEN 1 ELSE 0 END AS is_exact_dup
  FROM documents
),
c4 AS (SELECT doc_id, keep_doc AS c4_keep FROM ({TEXT_C4_FILTERS_SQL})),
ppl AS (SELECT doc_id, mean_bits FROM ({TEXT_UNIGRAM_LOGPROB_SQL})),
ct AS (SELECT doc_id, contaminated FROM ({BENCHMARK_CONTAMINATION_SQL})),
sd AS (SELECT vec_id AS doc_id, is_dup AS semantic_dup FROM ({SEMANTIC_DEDUP_SQL})),
j AS (
  SELECT d.doc_id, d.source,
         CAST(CASE WHEN d.doc_id % {CONTAM_EVAL_MOD} = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_benchmark,
         e.is_exact_dup,
         CAST(COALESCE(ct.contaminated, 0) AS INTEGER) AS contaminated,
         CAST(COALESCE(sd.semantic_dup, 0) AS INTEGER) AS semantic_dup,
         c4.c4_keep, ppl.mean_bits,
         CAST(CASE WHEN ppl.mean_bits > {PPL_MAX_BITS} THEN 1 ELSE 0 END AS INTEGER) AS high_ppl
  FROM documents d
  JOIN exact e ON d.doc_id = e.doc_id
  JOIN c4 ON d.doc_id = c4.doc_id
  JOIN ppl ON d.doc_id = ppl.doc_id
  LEFT JOIN ct ON d.doc_id = ct.doc_id
  LEFT JOIN sd ON d.doc_id = sd.doc_id
)
SELECT doc_id, source, is_benchmark, is_exact_dup, contaminated, semantic_dup,
       c4_keep, high_ppl, mean_bits,
       CASE WHEN is_benchmark = 1 THEN 'benchmark'
            WHEN is_exact_dup = 1 THEN 'exact_dup'
            WHEN contaminated = 1 THEN 'contaminated'
            WHEN semantic_dup = 1 THEN 'semantic_dup'
            WHEN c4_keep = 0 THEN 'c4_fail'
            WHEN high_ppl = 1 THEN 'high_ppl'
            ELSE 'kept' END AS drop_reason,
       CAST(CASE WHEN is_benchmark = 0 AND is_exact_dup = 0 AND contaminated = 0
                  AND semantic_dup = 0 AND c4_keep = 1 AND high_ppl = 0
            THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM j
"""


CORPUS_CURATION_REPORT_SQL = _curation_sql()


# ---------------------------------------------------------------------------
# 118. split_leakage_report — train/val split + near-dup leakage audit
#     (the step every training pipeline must run: a deterministic holdout
#     split is only valid if no near-duplicate pair straddles it — a
#     leaked twin inflates eval scores exactly like benchmark
#     contamination does)
# ---------------------------------------------------------------------------

SPLIT_VAL_BUCKETS = 2  # md5 bucket < 2 of 10 -> ~20% validation
SPLIT_MOD = 10
SPLIT_LEAK_JACCARD = 0.5  # near-dup threshold for a leaked pair


def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val split (md5(doc_id) bucket — reproducible
    across runs, the corpus_sample_stratified discipline) audited for
    near-duplicate leakage: every MinHash-LSH candidate pair with
    est_jaccard >= SPLIT_LEAK_JACCARD whose endpoints land in different
    splits is a leak. Output is one row per (split_a, split_b) pair
    class with doc/pair counts — the go/no-go summary a pipeline gates
    its eval on. Reuses the persisted signature table's band equi-join;
    the split assignment is a map-side hash, so the audit adds ONE
    small join on doc ids to the dedup pass it piggybacks on."""
    from gdalos_spark.functions import hashing
    from gdalos_spark.operators.dedup import dedup_minhash_lsh

    docs = load(spark, sf_dir, "documents")
    split = docs.select(
        "doc_id",
        F.when(
            hashing.md5_int60(F.col("doc_id").cast("string")) % SPLIT_MOD
            < SPLIT_VAL_BUCKETS,
            "val",
        ).otherwise("train").alias("split"),
    )
    pairs = dedup_minhash_lsh(spark, sf_dir).filter(
        F.col("est_jaccard") >= SPLIT_LEAK_JACCARD
    )
    labeled = (
        pairs.join(split.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("split", "split_a"), "doc_a")
        .join(split.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("split", "split_b"), "doc_b")
    )
    pair_counts = labeled.groupBy("split_a", "split_b").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    doc_counts = split.groupBy(F.col("split").alias("split_a")).agg(
        F.count(F.lit(1)).alias("n_docs_a")
    )
    return (
        pair_counts.join(doc_counts, "split_a", "left")
        .select(
            "split_a", "split_b",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.col("n_docs_a").cast("bigint").alias("n_docs_a"),
            (F.col("split_a") != F.col("split_b")).cast("int").alias("is_leak"),
        )
    )


def _split_leakage_sql() -> str:
    from gdalos_spark.functions import hashing
    from gdalos_spark.operators.dedup import DEDUP_MINHASH_LSH_SQL

    h = hashing.md5_int60_sql("CAST(doc_id AS VARCHAR)")
    return f"""
WITH split AS (
  SELECT doc_id,
         CASE WHEN {h} % {SPLIT_MOD} < {SPLIT_VAL_BUCKETS}
              THEN 'val' ELSE 'train' END AS split
  FROM documents
),
pairs AS (
  SELECT doc_a, doc_b FROM ({DEDUP_MINHASH_LSH_SQL})
  WHERE est_jaccard >= {SPLIT_LEAK_JACCARD}
),
labeled AS (
  SELECT sa.split AS split_a, sb.split AS split_b
  FROM pairs p
  JOIN split sa ON p.doc_a = sa.doc_id
  JOIN split sb ON p.doc_b = sb.doc_id
),
pair_counts AS (
  SELECT split_a, split_b, COUNT(*) AS n_pairs FROM labeled GROUP BY 1, 2
),
doc_counts AS (
  SELECT split AS split_a, COUNT(*) AS n_docs_a FROM split GROUP BY 1
)
SELECT p.split_a, p.split_b,
       CAST(p.n_pairs AS BIGINT) AS n_pairs,
       CAST(d.n_docs_a AS BIGINT) AS n_docs_a,
       CAST(CASE WHEN p.split_a <> p.split_b THEN 1 ELSE 0 END AS INTEGER) AS is_leak
FROM pair_counts p LEFT JOIN doc_counts d USING (split_a)
"""


SPLIT_LEAKAGE_REPORT_SQL = _split_leakage_sql()


# ---------------------------------------------------------------------------
# k_anonymity_report — privacy audit over quasi-identifier groups
# ---------------------------------------------------------------------------

K_ANON_LEVELS = (2, 5, 10, 20)


def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-identifier
    (mktsegment, nationkey, 1000-unit balance bucket): for each k level,
    how many equivalence classes and rows fall below k. A training-data
    release gate: rows in small classes are re-identifiable and must be
    generalized or suppressed before export. One groupBy over the
    quasi-identifier, then a 4x literal explode and a second tiny agg —
    the first shuffle is the only data-sized one. The bucket offset
    (+100000000 cents) keeps the dividend non-negative so Spark's
    truncating `div` and DuckDB's flooring `//` agree on negative
    balances."""
    c = load(spark, sf_dir, "customer")
    groups = (
        c.select(
            "c_mktsegment",
            "c_nationkey",
            F.expr(
                "(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 100000000) div 100000"
            ).alias("bal_bucket"),
        )
        .groupBy("c_mktsegment", "c_nationkey", "bal_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ks = ", ".join(str(k) for k in K_ANON_LEVELS)
    return (
        groups.select("cnt", F.explode(F.expr(f"array({ks})")).alias("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("cnt") < F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_groups_below"),
            F.sum(F.when(F.col("cnt") < F.col("k"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_rows_below"),
            (
                F.sum(F.when(F.col("cnt") < F.col("k"), F.col("cnt")).otherwise(0))
                .cast("double")
                / F.sum("cnt")
            ).alias("frac_rows_below"),
        )
    )


K_ANONYMITY_REPORT_SQL = f"""
WITH g AS (
  SELECT c_mktsegment, c_nationkey,
         (CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) + 100000000) // 100000 AS bal_bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM customer
  GROUP BY 1, 2, 3
),
x AS (SELECT cnt, unnest([{", ".join(str(k) for k in K_ANON_LEVELS)}]) AS k FROM g)
SELECT k, CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN cnt < k THEN 1 ELSE 0 END) AS BIGINT) AS n_groups_below,
       CAST(SUM(CASE WHEN cnt < k THEN cnt ELSE 0 END) AS BIGINT) AS n_rows_below,
       CAST(SUM(CASE WHEN cnt < k THEN cnt ELSE 0 END) AS DOUBLE) / SUM(cnt) AS frac_rows_below
FROM x
GROUP BY k
"""


# ---------------------------------------------------------------------------
# quality_ablation_report — token mass retained at each quality cut
# ---------------------------------------------------------------------------


def quality_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality-threshold ablation every corpus-curation decision
    reads: docs ranked by quality score into 10 exact rank-deciles
    (b = (rank-1)*10 div n — explicit integer floor, the
    minhash_calibration decile lesson), each bucket reporting its doc
    and token mass plus the token fraction RETAINED if every bucket at
    or below it were dropped. The exact global rank comes from the
    histogram-offset decomposition (functions.ranking.exact_global_rank
    — quality is a [0,1] double, so CAST(quality*1024) is a monotone
    bounded bucket id), NOT a single-partition sort: the deciles stay
    bit-identical to the oracle's global ROW_NUMBER while every bucket
    sorts in parallel at any scale."""
    from gdalos_spark.functions.ranking import exact_global_rank

    q = text_quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    ranked = exact_global_rank(
        q, (F.col("quality") * 1024), ["quality", "doc_id"]
    ).select("n_tokens", "quality", "rn", "n")
    b = ranked.select(
        F.expr("(CAST(rn - 1 AS BIGINT) * 10) div n").alias("bucket"),
        "n_tokens",
        "quality",
    )
    agg = b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
        F.min("quality").alias("min_q"),
        F.max("quality").alias("max_q"),
    )
    wb = Window.orderBy("bucket").rowsBetween(1, Window.unboundedFollowing)
    tot = Window.partitionBy()
    return agg.select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_docs",
        "tokens",
        "min_q",
        "max_q",
        F.coalesce(F.sum("tokens").over(wb), F.lit(0))
        .cast("bigint")
        .alias("retained_tokens"),
        (
            F.coalesce(F.sum("tokens").over(wb), F.lit(0)).cast("double")
            / F.sum("tokens").over(tot)
        ).alias("retained_frac"),
    )


QUALITY_ABLATION_REPORT_SQL = f"""
WITH q AS (
  SELECT doc_id, n_tokens, quality FROM ({TEXT_QUALITY_SCORE_SQL})
),
ranked AS (
  SELECT n_tokens, quality,
         ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS rn,
         COUNT(*) OVER () AS n
  FROM q
),
b AS (
  SELECT (CAST(rn - 1 AS BIGINT) * 10) // n AS bucket, n_tokens, quality
  FROM ranked
),
agg AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens,
         MIN(quality) AS min_q, MAX(quality) AS max_q
  FROM b GROUP BY bucket
)
SELECT CAST(bucket AS INTEGER) AS bucket, n_docs, tokens, min_q, max_q,
       CAST(COALESCE(SUM(tokens) OVER (ORDER BY bucket
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS BIGINT)
         AS retained_tokens,
       CAST(COALESCE(SUM(tokens) OVER (ORDER BY bucket
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS DOUBLE)
         / SUM(tokens) OVER () AS retained_frac
FROM agg
"""


# ---------------------------------------------------------------------------
# referential_integrity_report — FK orphan / null-key audit over the schema
# ---------------------------------------------------------------------------

_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nightly data-contract audit every lakehouse runs: for each
    declared FK edge, the child row count, null-key count, and orphan
    count (left-anti join against the parent's key set). Each edge is an
    independent anti-join — at 100 TB the small-parent edges broadcast
    and the fact-to-fact edge (lineitem→orders) shuffles on the key it
    is already bucketed by (sources/bucketed.py), so the whole report is
    one pass per child table. Rows arrive as one unioned report, the
    shape a data-quality dashboard ingests."""
    reports = []
    for child, fk, parent, pk in _FK_EDGES:
        c = load(spark, sf_dir, child)
        p = load(spark, sf_dir, parent).select(F.col(pk).alias("__pk")).distinct()
        nn = c.where(F.col(fk).isNotNull()).select(F.col(fk).alias("__fk"))
        orphans = nn.join(p, nn.__fk == p.__pk, "left_anti")
        reports.append(
            c.agg(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("fk_edge"),
                F.count(F.lit(1)).cast("bigint").alias("child_rows"),
                F.sum(F.when(F.col(fk).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("null_keys"),
            ).crossJoin(
                F.broadcast(
                    orphans.agg(F.count(F.lit(1)).cast("bigint").alias("orphans"))
                )
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def _ri_sql() -> str:
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        parts.append(f"""
SELECT '{child}.{fk}->{parent}.{pk}' AS fk_edge,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS child_rows,
       CAST((SELECT COUNT(*) FROM {child} WHERE {fk} IS NULL) AS BIGINT) AS null_keys,
       CAST((SELECT COUNT(*) FROM {child} c
             WHERE c.{fk} IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))
            AS BIGINT) AS orphans""")
    return " UNION ALL ".join(parts)


REFERENTIAL_INTEGRITY_REPORT_SQL = _ri_sql()


# ---------------------------------------------------------------------------
# corpus_split_assign — deterministic leakage-free train/val/test split
# ---------------------------------------------------------------------------
#
# Assign every document to a split by hashing ONLY its stable identity
# (never its content or source), so the assignment is reproducible across
# runs, machines, and engine versions, and re-crawled near-duplicates of
# a train doc can't drift into test by content change. Map-only — no
# shuffle at any scale. (split_leakage_report audits an INDEPENDENT
# unsalted two-way hash split — a deliberately different decision, per
# the salting rule below; the two are related patterns, not one
# mechanism.)

SPLIT_TRAIN_PCT = 90
SPLIT_VAL_PCT = 5  # test = 100 - train - val


def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level split assignment: bucket = md5-hash of "split:<doc_id>"
    mod 100, split = train (<90) / val (<95) / test. The salt string keeps
    this split independent of every other hash-derived decision in the
    pipeline (sampling, sharding) — hashing the same key with the same
    function for two different decisions correlates them."""
    docs = load(spark, sf_dir, "documents")
    bucket = (
        hashing.md5_int60(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
        % 100
    )
    return (
        docs.select(
            "doc_id",
            "source",
            bucket.cast("int").alias("bucket"),
        )
        .withColumn(
            "split",
            F.when(F.col("bucket") < SPLIT_TRAIN_PCT, "train")
            .when(F.col("bucket") < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
            .otherwise("test"),
        )
        .orderBy("doc_id")
    )


CORPUS_SPLIT_ASSIGN_SQL = f"""
WITH assigned AS (
  SELECT doc_id, source,
         CAST({hashing.md5_int60_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100
              AS INTEGER) AS bucket
  FROM documents
)
SELECT doc_id, source, bucket,
       CASE WHEN bucket < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN bucket < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM assigned
ORDER BY doc_id
"""
