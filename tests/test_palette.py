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
    assert pal[0][1] == "CC00007F"  # $CC00007F -> dark blue (R/B swaps cancel)


def test_pas_color_reads_digits_as_aarrggbb():
    assert pas_color_to_rgba("$CC00007F") == "CC00007F"
    assert pas_color_to_rgba("$FF112233") == "FF112233"
    assert pas_color_to_rgba("$1") == "00000001"  # short forms pad left


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


# --- real reference color files (VERDICT r8 item 7) --------------------

import os

import pytest

from gdalos_spark.functions.palette import (
    read_color_file,
    read_qgis_palette,
    render_color_file,
)

CF = "/root/reference/data/color_files"
needs_ref = pytest.mark.skipif(not os.path.isdir(CF), reason="reference tree absent")


@needs_ref
def test_reference_percent_color_file_parses():
    """percents.txt: the file talos_to_color_file writes from the
    reference's own sample talos palette — 7 percent stops + nv."""
    with open(f"{CF}/percents.txt") as f:
        pal, nv = read_color_file(f.read(), value_range=(0.0, 600.0))
    assert len(pal) == 7
    assert nv == "00000000"
    assert pal[0] == (0.0, "CC00007F")  # 0% -> 0 0 127 a=204
    assert pal[-1][1] == "CCFF00FF"     # 100% -> 255 0 255
    assert abs(pal[1][0] - 100.0) < 1e-9  # 16.666..% of [0, 600]
    # the percent file is the dual of the talos sample palette rescaled
    # to the same range: identical colors in identical order
    talos = read_talos_palette(DEFAULT_TALOS_PALETTE)
    assert [c for _, c in pal] == [c for _, c in talos]


@needs_ref
def test_reference_viewshed_color_files_parse():
    with open(f"{CF}/viewshed/comb.txt") as f:
        pal, nv = read_color_file(f.read())
    assert nv is None
    assert pal[0] == (0.0, "00FFFFFF")   # 0 255 255 255 0 (transparent)
    assert pal[1] == (1.0, "FF00008F")
    assert all(c == "FFFF0000" for k, c in pal if k >= 5)
    with open(f"{CF}/viewshed/min.txt") as f:
        pal_min, _ = read_color_file(f.read())
    assert pal_min[0] == (0.0, "00FFFFFF")
    assert pal_min[-1] == (5.0, "FF00FF00")


@needs_ref
def test_reference_gradient_color_file_parses():
    with open(f"{CF}/gradient/rainbow.txt") as f:
        pal, nv = read_color_file(f.read())
    assert [k for k, _ in pal] == [-300.0, 100.0, 500.0, 900.0, 1300.0]
    assert pal[0][1] == "FFD7191C"
    assert pal[-1][1] == "FF2B83BA"


@needs_ref
def test_reference_qgis_palettes_parse():
    """The .qml/.qlr XML styles the reference converts with
    xml_to_color_file: the gradient ramp must equal its .txt twin, and
    the paletted .qlr must equal comb.txt's leading entries."""
    with open(f"{CF}/gradient/rainbow.qml") as f:
        qml = read_qgis_palette(f.read())
    with open(f"{CF}/gradient/rainbow.txt") as f:
        txt, _ = read_color_file(f.read())
    assert qml == txt
    with open(f"{CF}/viewshed/comb.qlr") as f:
        qlr = read_qgis_palette(f.read())
    with open(f"{CF}/viewshed/comb.txt") as f:
        comb, _ = read_color_file(f.read())
    assert qlr[:6] == comb[:6]


@given(
    entries=st.lists(
        st.tuples(
            st.integers(-10000, 10000),
            st.integers(0, 255), st.integers(0, 255),
            st.integers(0, 255), st.integers(0, 255),
        ),
        min_size=1, max_size=12,
        unique_by=lambda t: t[0],
    ),
    with_nv=st.booleans(),
)
@settings(max_examples=50, deadline=None)
def test_color_file_round_trip(entries, with_nv):
    from gdalos_spark.functions.palette import _rgba_hex

    pal = sorted((float(k), _rgba_hex(r, g, b, a)) for k, r, g, b, a in entries)
    nv = "80102030" if with_nv else None
    back_pal, back_nv = read_color_file(render_color_file(pal, nv))
    assert back_pal == pal
    assert back_nv == nv
