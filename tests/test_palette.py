"""Palette parser + binning property tests (SURVEY §5c)."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from gdalos_spark.functions.palette import (
    DEFAULT_TALOS_PALETTE,
    bin_case_sql,
    bin_key_case_sql,
    pas_color_to_rgba,
    read_talos_palette,
)


def test_default_palette_parses():
    pal = read_talos_palette(DEFAULT_TALOS_PALETTE)
    assert len(pal) == 7
    assert [k for k, _ in pal] == [0.0, 100.0, 200.0, 300.0, 400.0, 500.0, 600.0]
    assert pal[0][1] == "CC7F0000"  # $CC00007F pascal BGR -> RGBA


def test_pas_color_swaps_bgr():
    assert pas_color_to_rgba("$CC00007F") == "CC7F0000"
    assert pas_color_to_rgba("$FF112233") == "FF332211"
    assert pas_color_to_rgba("$1") == "00010000"  # short forms pad left


def _mk_palette(min_value, count, multiplier, log_base=0):
    # same shape as the reference sample (gdalos_color.py:52): 9 header
    # fields then '|;$AARRGGBB;brush;x' per entry
    entries = "|;$CC000000;0;3;2" * count
    return f"{min_value};{count};6;0;{multiplier};0;1;1;{log_base};" + entries


@given(
    min_value=st.integers(-100, 100),
    count=st.integers(1, 12),
    multiplier=st.integers(1, 50),
)
@settings(max_examples=50, deadline=None)
def test_parser_roundtrip_keys(min_value, count, multiplier):
    pal = read_talos_palette(_mk_palette(min_value, count, multiplier))
    assert len(pal) == count
    for i, (k, _) in enumerate(pal):
        assert k == min_value + i * multiplier


@given(min_value=st.integers(0, 10), count=st.integers(2, 8), log_base=st.sampled_from([2.0, 10.0]))
@settings(max_examples=30, deadline=None)
def test_parser_log_keys(min_value, count, log_base):
    pal = read_talos_palette(_mk_palette(min_value, count, 1, log_base))
    for i, (k, _) in enumerate(pal):
        assert math.isclose(k, log_base ** (min_value + i))


@given(v=st.floats(-50, 800, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_binning_is_nearest_below(v):
    """DuckDB evaluation of the generated CASE == pure-python reference."""
    import duckdb

    pal = read_talos_palette(DEFAULT_TALOS_PALETTE)
    got_rgba, got_key = duckdb.sql(
        f"SELECT {bin_case_sql(pal, str(v))}, {bin_key_case_sql(pal, str(v))}"
    ).fetchone()
    keys = [k for k, _ in pal]
    idx = 0
    for i, k in enumerate(keys):
        if v >= k:
            idx = i
    assert got_key == keys[idx]
    assert got_rgba == pal[idx][1]
