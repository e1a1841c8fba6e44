"""Smoke test for the reference-parity API facade."""

from gdalos_spark.api import GdalosSpark
from tests.conftest import SF_DIR


def test_facade_covers_reference_verbs(spark):
    eng = GdalosSpark(spark, SF_DIR)
    # lazy construction only — every verb must build a valid plan
    verbs = [
        eng.crop, eng.warp, eng.overviews, eng.overviews_discrete, eng.scale,
        eng.color_relief, eng.info, eng.histogram, eng.partition_stats,
        eng.calc, eng.combine_count, eng.combine_max, eng.combine_unique,
        eng.mosaic, eng.rasterize, eng.los, eng.viewshed, eng.free_space_loss,
        eng.utm_convergence, eng.to_xyz, eng.to_czml, eng.sample_points,
        eng.select_datasets, eng.dedup_exact, eng.dedup_minhash,
        eng.dedup_simhash, eng.dedup_jaccard, eng.dedup_embeddings,
        eng.centroids, eng.language_id, eng.quality, eng.token_stats,
        eng.fingerprints, eng.decode_media, eng.sample_frames, eng.sessionize,
    ]
    for verb in verbs:
        df = verb()
        assert df.columns  # plan resolved
    assert eng.los(refraction=True).columns
    for method in ("brute", "lsh", "ivf"):
        assert eng.ann(method=method).columns
    # one representative executes end-to-end
    assert eng.info().count() > 0


def test_round3_facade_verbs(spark):
    """Every round-3 facade verb returns a non-empty lazy DataFrame."""
    from gdalos_spark.api import GdalosSpark
    from tests.conftest import SF_DIR

    eng = GdalosSpark(spark, SF_DIR)
    for verb in (
        "geodesic_distance", "calc_multi", "polygonize", "contour_polygons",
        "resolve_jobs", "decontaminate", "mix_sample", "top_ngrams",
        "map_scales", "sector_rings", "los_links", "quantize_pq",
    ):
        assert getattr(eng, verb)().count() > 0, verb


def test_round4_facade_verbs(spark):
    """Every round-4 facade verb returns a non-empty DataFrame."""
    from gdalos_spark.api import GdalosSpark
    from tests.conftest import SF_DIR

    eng = GdalosSpark(spark, SF_DIR)
    for verb in (
        "c4_filters", "dedup_semantic", "ann_recall", "stream_attribution",
        "proximity", "perplexity", "curate",
    ):
        assert getattr(eng, verb)().count() > 0, verb
    assert eng.ann("ivfpq").count() > 0


def test_register_views_enables_plain_sql(spark):
    from gdalos_spark.api import GdalosSpark
    from tests.conftest import SF_DIR

    GdalosSpark(spark, SF_DIR).register_views()
    row = spark.sql(
        "SELECT COUNT(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0]
    assert row.n > 0
    # events view carries the normalized zone-stable timestamp
    assert spark.sql("SELECT MIN(ts) AS t FROM events").collect()[0].t is not None
