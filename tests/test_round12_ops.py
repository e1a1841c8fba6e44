"""Round-12-session tests: cubic-convolution resample, inverse UTM
(round-trip closure), and the multi-assignment IVF recall arm."""

import math

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle


# --- raster_resample_cubic --------------------------------------------------


def test_resample_cubic_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["raster_resample_cubic"],
        entrymod.oracle_sql()["raster_resample_cubic"],
    )


def test_cubic_weights_partition_of_unity():
    """The integerized Keys a=-0.5 kernel: the four /432 x-weights sum
    to exactly 432 at every sixth-fraction, and match the float kernel."""

    def near(u):
        return 3 * u**3 - 30 * u**2 + 432

    def far(u):
        return -(u**3) + 30 * u**2 - 288 * u + 864

    def keys(t, a=-0.5):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * (t**3 - 5 * t**2 + 8 * t - 4)
        return 0.0

    for f in range(6):
        ws = [far(f + 6), near(f), near(6 - f), far(12 - f)]
        assert sum(ws) == 432
        for w, t in zip(ws, [(f + 6) / 6, f / 6, (6 - f) / 6, (12 - f) / 6]):
            assert abs(w / 432 - keys(t)) < 1e-12


def test_cubic_tracks_float_kernel(spark):
    """Spot-check interior targets against a float Keys interpolation
    of the same DEM (tolerance = the /432 rationalization, exact)."""
    from gdalos_spark.datamodel import dem_grid

    dem = {
        (r.px, r.py): float(r.elev)
        for r in dem_grid(spark, SF_DIR).collect()
    }
    out = {
        (r.tx, r.ty): r.elev_cubic
        for r in entrymod.queries()["raster_resample_cubic"](spark, SF_DIR).collect()
    }

    def keys(t, a=-0.5):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * (t**3 - 5 * t**2 + 8 * t - 4)
        return 0.0

    checked = 0
    for tx, ty in [(10, 10), (31, 17), (50, 50), (77, 23)]:
        sx, sy = (4 * tx - 1) / 6.0, (4 * ty - 1) / 6.0
        x0, y0 = math.floor(sx), math.floor(sy)
        acc = 0.0
        for dx in (-1, 0, 1, 2):
            for dy in (-1, 0, 1, 2):
                cx = min(63, max(0, x0 + dx))
                cy = min(63, max(0, y0 + dy))
                v = round(dem.get((cx, cy), 0.0) * 100)
                acc += keys(sx - (x0 + dx)) * keys(sy - (y0 + dy)) * v
        if (tx, ty) in out:
            assert abs(out[(tx, ty)] - acc / 100.0) < 1e-6
            checked += 1
    assert checked >= 3


# --- crs_reproject_utm_inverse ----------------------------------------------


def test_utm_inverse_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["crs_reproject_utm_inverse"],
        entrymod.oracle_sql()["crs_reproject_utm_inverse"],
    )


def test_utm_roundtrip_closure_submillimeter(spark):
    """forward ∘ inverse ≡ identity within the series truncation:
    < 5e-9 deg (~0.5 mm) on every cell of the zone-36 extent."""
    rows = entrymod.queries()["crs_reproject_utm_inverse"](spark, SF_DIR).collect()
    assert len(rows) > 0
    assert max(abs(r.err_lat_deg) for r in rows) < 5e-9
    assert max(abs(r.err_lon_deg) for r in rows) < 5e-9


def test_utm_inverse_tracks_libm_snyder(spark):
    """The polynomial-trig inverse must agree with a libm Snyder
    inverse on the projected points to ~1e-9 deg."""
    from gdalos_spark.operators import raster as R

    a, e2, ep2, k0, fe = R._UTM_A, R._UTM_E2, R._UTM_EP2, R._UTM_K0, R._UTM_FE
    e1 = R._UTM_E1
    cm = R.utm_central_meridian(R._utm_extent_zone(R._UTM_LON_0))

    def snyder_inverse(E, N):
        m = N / k0
        mu = m / (a * R._UTM_A0)
        phi1 = (
            mu
            + R._UTM_J2 * math.sin(2 * mu)
            + R._UTM_J4 * math.sin(4 * mu)
            + R._UTM_J6 * math.sin(6 * mu)
            + R._UTM_J8 * math.sin(8 * mu)
        )
        sf, cf = math.sin(phi1), math.cos(phi1)
        t1, c1 = math.tan(phi1), ep2 * cf * cf
        w1 = 1 - e2 * sf * sf
        n1 = a / math.sqrt(w1)
        r1 = a * (1 - e2) / (w1 * math.sqrt(w1))
        d = (E - fe) / (n1 * k0)
        T1 = t1 * t1
        phi = phi1 - (n1 * t1 / r1) * (
            d * d / 2
            - (5 + 3 * T1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * d**4 / 24
            + (61 + 90 * T1 + 298 * c1 + 45 * T1 * T1 - 252 * ep2 - 3 * c1 * c1)
            * d**6 / 720
        )
        lam = (
            d
            - (1 + 2 * T1 + c1) * d**3 / 6
            + (5 - 2 * c1 + 28 * T1 - 3 * c1 * c1 + 8 * ep2 + 24 * T1 * T1)
            * d**5 / 120
        ) / cf
        return math.degrees(phi), cm + math.degrees(lam)

    rows = entrymod.queries()["crs_reproject_utm_inverse"](spark, SF_DIR).collect()
    for r in rows[::257]:
        lat_ref, lon_ref = snyder_inverse(r.easting, r.northing)
        assert abs(r.lat_rt - lat_ref) < 1e-9
        assert abs(r.lon_rt - lon_ref) < 1e-9


# --- ann_recall_report: multi-assignment IVF arm ----------------------------


def test_recall_report_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["ann_recall_report"],
        entrymod.oracle_sql()["ann_recall_report"],
    )


def test_ivf_multi_assignment_lifts_ceiling(spark):
    """2-way soft assignment must strictly lift mean recall over
    single-assignment IVF with the same nprobe (the exact-in-list
    ceiling was the binding constraint: 0.40 -> 0.72 at sf0.001)."""
    rows = entrymod.queries()["ann_recall_report"](spark, SF_DIR).collect()
    mean = {}
    for m in ("ivf", "ivf_ma"):
        rs = [r.recall for r in rows if r.method == m]
        assert rs, f"method {m} missing from the report"
        mean[m] = sum(rs) / len(rs)
    assert mean["ivf_ma"] > mean["ivf"] + 0.15
    assert mean["ivf_ma"] >= 0.6


# --- gpkg_write_manifest ----------------------------------------------------


def test_gpkg_manifest_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["gpkg_write_manifest"],
        entrymod.oracle_sql()["gpkg_write_manifest"],
    )


def test_gpkg_div_boundaries():
    """The adaptive divisor sits exactly at the u16-sentinel boundary:
    max_cents // div must stay < 65535, div is the smallest power-of-two
    multiple of 16 achieving it (found by the sf10 upscale overflow)."""
    from gdalos_spark.sources import gpkg as G

    assert G._gpkg_div_for(0) == 16
    assert G._gpkg_div_for(16 * 65534) == 16          # last value /16 holds
    assert G._gpkg_div_for(16 * 65535) == 32          # sentinel collision
    assert G._gpkg_div_for(32 * 65534) == 32
    assert G._gpkg_div_for(32 * 65535) == 64
    for m in (10**7, 10**9, 10**12):
        d = G._gpkg_div_for(m)
        assert m // d < G.GPKG_NODATA16
        assert d == 16 or m // (d // 2) >= G.GPKG_NODATA16  # minimal


def test_gpkg_files_are_real_geopackages(spark, tmp_path):
    """The written .gpkg is an SQLite db with the GPKG application_id,
    the required gpkg_* tables, decodable PNG tiles, and the skip
    protocol on rerun."""
    import sqlite3

    from gdalos_spark.sources import gpkg as G

    out = str(tmp_path / "gpkg_out")
    first = G.write_gpkg_scenes(spark, SF_DIR, out).collect()
    assert {r.action for r in first} == {"written"}
    second = G.write_gpkg_scenes(spark, SF_DIR, out).collect()
    assert {r.action for r in second} == {"skipped"}
    for r in first:
        con = sqlite3.connect(r.path)
        try:
            (app_id,) = con.execute("PRAGMA application_id").fetchone()
            assert app_id == G.GPKG_APP_ID
            tables = {
                t for (t,) in con.execute(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                ).fetchall()
            }
            assert {
                "gpkg_spatial_ref_sys", "gpkg_contents",
                "gpkg_tile_matrix_set", "gpkg_tile_matrix", "elev",
            } <= tables
            n_z1 = 0
            for zl, blob in con.execute(
                "SELECT zoom_level, tile_data FROM elev"
            ).fetchall():
                grid = G._png16_decode(bytes(blob))
                assert grid.shape == (G.GPKG_TILE, G.GPKG_TILE)
                n_z1 += zl == 1
            assert n_z1 == (G.SCENE // G.GPKG_TILE) ** 2
        finally:
            con.close()


# --- raster_resample_cubicspline / lanczos / xyz options --------------------


def test_resample_average_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["raster_resample_average"],
        entrymod.oracle_sql()["raster_resample_average"],
    )


def test_resample_average_against_python_box_filter(spark):
    """Independent reimplementation: a plain-Python overlap-weighted box
    filter over the collected (sparse) DEM must reproduce every output
    value — nodata-aware denominator included."""
    from gdalos_spark.datamodel import dem_grid
    from gdalos_spark.operators import raster as R

    cents = {
        (r.px, r.py): round(float(r.elev) * 100)
        for r in dem_grid(spark, SF_DIR).collect()
    }

    def axis_w(t):
        # weights in thirds over source cells floor(8t/3)..+3
        s0 = (8 * t) // 3
        return [
            (s0 + k,
             max(0, min(8 * t + 8, 3 * (s0 + k) + 3) - max(8 * t, 3 * (s0 + k))))
            for k in range(4)
        ]

    expected = {}
    for tx in range(R.AVG_T):
        for ty in range(R.AVG_T):
            num = den = 0
            for cx, wx in axis_w(tx):
                for cy, wy in axis_w(ty):
                    w = wx * wy
                    if w and (cx, cy) in cents:
                        num += w * cents[(cx, cy)]
                        den += w
            if den:
                expected[(tx, ty)] = num / den / 100.0
    out = {
        (r.tx, r.ty): r.elev_average
        for r in R.raster_resample_average(spark, SF_DIR).collect()
    }
    assert out.keys() == expected.keys()
    assert all(out[k] == expected[k] for k in expected)


def test_resample_average_weights_sum_to_64(spark):
    """Per-axis weight totals are the exact constant 8 thirds for every
    target — the exact-cover (24 * 8/3 = 64) no-clamp invariant."""
    from pyspark.sql import functions as F
    from gdalos_spark.operators import raster as R

    targets = spark.range(R.AVG_T).select(F.col("id").cast("int").alias("tx"))
    w = targets.selectExpr(
        "tx",
        "(8*tx) div 3 as sx0",
    ).selectExpr(
        "tx",
        "aggregate(transform(sequence(0, 3), k -> "
        "greatest(0, least(8*tx + 8, 3*(sx0 + k) + 3)"
        " - greatest(8*tx, 3*(sx0 + k)))), cast(0 as bigint), "
        "(a, x) -> a + x) as wsum",
    ).collect()
    assert all(r.wsum == 8 for r in w)


def test_resample_nearest_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["raster_resample_nearest"],
        entrymod.oracle_sql()["raster_resample_nearest"],
    )


def test_resample_nearest_is_projection(spark):
    """Every nearest output value exists verbatim in the source DEM at
    the containing-cell coordinate — zero value arithmetic."""
    from gdalos_spark.datamodel import dem_grid
    from gdalos_spark.operators import raster as R

    src = {
        (r.px, r.py): round(float(r.elev) * 100)
        for r in dem_grid(spark, SF_DIR).collect()
    }
    for r in R.raster_resample_nearest(spark, SF_DIR).collect():
        cx, cy = (8 * r.tx + 4) // 3, (8 * r.ty + 4) // 3
        assert round(r.elev_near * 100) == src[(cx, cy)]


def test_cubicspline_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["raster_resample_cubicspline"],
        entrymod.oracle_sql()["raster_resample_cubicspline"],
    )


def test_lanczos_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["raster_resample_lanczos"],
        entrymod.oracle_sql()["raster_resample_lanczos"],
    )


def test_xyz_options_matches_oracle(spark, ducks):
    assert_matches_oracle(
        spark,
        ducks,
        entrymod.queries()["raster_to_xyz_options"],
        entrymod.oracle_sql()["raster_to_xyz_options"],
    )


def test_bspline_weights_partition_of_unity():
    """B3 kernel: four /1296 x-weights sum to exactly 1296 at every
    sixth-fraction, match the float B-spline, and are non-negative."""

    def near(u):
        return 3 * u**3 - 36 * u**2 + 864

    def far(u):
        return (12 - u) ** 3

    def b3(t):
        t = abs(t)
        if t <= 1:
            return 0.5 * t**3 - t**2 + 2.0 / 3.0
        if t < 2:
            return (2 - t) ** 3 / 6.0
        return 0.0

    for f in range(6):
        ws = [far(f + 6), near(f), near(6 - f), far(12 - f)]
        assert sum(ws) == 1296
        assert all(w >= 0 for w in ws)
        for w, t in zip(ws, [(f + 6) / 6, f / 6, (6 - f) / 6, (12 - f) / 6]):
            assert abs(w / 1296 - b3(t)) < 1e-12


def test_lanczos_weight_table_shape():
    """36 fixed-point taps; exact interpolation at integer positions
    (f=0: only the center tap is nonzero); per-f sums are the exact
    normalization denominators."""
    from gdalos_spark.operators.raster import _LANCZOS_SCALE, _lanczos_tap_rows

    rows = _lanczos_tap_rows()
    assert len(rows) == 36
    byf = {}
    for f, d, w, dw in rows:
        byf.setdefault(f, []).append((d, w, dw))
    f0 = {d: w for d, w, _ in byf[0]}
    assert f0[0] == _LANCZOS_SCALE
    assert all(w == 0 for d, w in f0.items() if d != 0)
    for f, taps in byf.items():
        dws = {dw for _, _, dw in taps}
        assert len(dws) == 1
        assert sum(w for _, w, _ in taps) == dws.pop()
    # side lobes go negative for interior fractions
    assert any(r[2] < 0 for r in rows)
