"""Distinct-text build collapse (collapse_by_text): the per-doc
shingle+md5 pipelines (minhash signatures, simhash fingerprints,
doc_fingerprint sketches) are pure functions of the text, so on a
replica-heavy corpus they run once per DISTINCT text and fan back out.
The collapse must be RESULT-IDENTICAL to the direct plan — these tests
pin that on crafted corpora that include the awkward edges (NULL text,
empty text, sub-3-token shorties, all-distinct bail-out)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(tmp_path, rows, name="documents.parquet"):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["web"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1] or "") for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), name))
    return str(tmp_path)


def _replica_corpus():
    """40 distinct texts x 5 exact replicas + NULL/empty/short edges."""
    rows = []
    did = 0
    for i in range(40):
        base = f"text {i} alpha beta gamma delta epsilon zeta eta theta"
        for _ in range(5):
            rows.append((did, base))
            did += 1
    # edges: NULL text and '' text shingle identically but must keep
    # DIFFERENT content hashes (md5(NULL) is NULL, md5('') is not);
    # sub-3-token docs shingle to the whole text
    for t in (None, None, "", "", "one two", "one two"):
        rows.append((did, t))
        did += 1
    return rows


def test_signatures_collapse_matches_direct(spark, tmp_path):
    from gdalos_spark.operators import dedup as D

    d = _write_docs(tmp_path, _replica_corpus())
    direct = sorted(
        tuple(r) for r in D._signatures(spark, d, collapse=False).collect()
    )
    collapsed = sorted(
        tuple(r) for r in D._signatures(spark, d, collapse=True).collect()
    )
    assert len(direct) == len(_replica_corpus())  # one signature row per doc
    assert collapsed == direct


def test_doc_fingerprint_collapse_matches_direct(spark, tmp_path, monkeypatch):
    from gdalos_spark.operators import dedup as D
    from gdalos_spark.operators.text import doc_fingerprint

    d = _write_docs(tmp_path, _replica_corpus())
    direct = sorted(tuple(r) for r in doc_fingerprint(spark, d).collect())
    monkeypatch.setattr(D, "COLLAPSE_MIN_DOCS", 0)
    collapsed = sorted(tuple(r) for r in doc_fingerprint(spark, d).collect())
    assert collapsed == direct
    # the NULL-text edge: content_hash must stay NULL for NULL-text docs
    # (and NOT inherit md5('') from the empty-text group, or vice versa)
    by_id = {r[0]: r for r in collapsed}  # (doc_id, content_hash, fingerprint, ...)
    n = len(_replica_corpus())
    assert by_id[n - 6][1] is None  # NULL text -> NULL content hash
    assert by_id[n - 4][1] is not None  # '' text hashes
    assert by_id[n - 6][2] == by_id[n - 4][2]  # same shingles either way


def test_clusters_collapse_matches_direct(spark, tmp_path, monkeypatch):
    """dedup_clusters routes _signatures through the text collapse when
    the corpus is big enough; labels/sizes must not move."""
    from gdalos_spark.operators import dedup as D

    d = _write_docs(tmp_path, _replica_corpus())
    direct = sorted(tuple(r) for r in D.dedup_clusters(spark, d).collect())
    monkeypatch.setattr(D, "COLLAPSE_MIN_DOCS", 0)
    collapsed = sorted(tuple(r) for r in D.dedup_clusters(spark, d).collect())
    assert len(direct) > 0
    assert collapsed == direct


def test_collapse_bails_on_distinct_corpus(spark, tmp_path):
    """All-distinct corpus: the adaptive ratio gate must fall back to the
    direct plan (and stay result-identical while doing so)."""
    from gdalos_spark.operators import dedup as D

    rows = [
        (i, f"unique document {i} with words {i * 7} {i * 13} {i * 29}")
        for i in range(50)
    ]
    d = _write_docs(tmp_path, rows)
    # n_hint above the threshold forces the stats job; ratio >= 0.95 bails
    adaptive = sorted(
        tuple(r) for r in D._signatures(spark, d, n_hint=10**9).collect()
    )
    direct = sorted(
        tuple(r) for r in D._signatures(spark, d, collapse=False).collect()
    )
    assert adaptive == direct


def test_collapse_engages_on_empty_frame_without_error(spark):
    """ADVICE r8: an over-estimated n_hint on a filtered-empty subset
    must fall through to the direct plan (SUM over zero groups is NULL),
    not raise TypeError on float * None."""
    from pyspark.sql import functions as F

    from gdalos_spark.operators.dedup import COLLAPSE_MIN_DOCS, collapse_by_text

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = collapse_by_text(
        empty,
        lambda d: d.select("doc_id", F.md5("text").alias("h")),
        n_src=COLLAPSE_MIN_DOCS * 2,
    )
    assert out.count() == 0
