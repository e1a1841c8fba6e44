"""Talos palette parsing + declarative color binning.

Mirrors the reference's palette pipeline (gdalos_color.py:11
`read_talos_palette`): a talos palette string is
``min;count;selected;lock;multiplier;special;interp;?;log_base;`` followed
by ``count`` entries of four ``;``-separated fields
(``name|``, ``$AARRGGBB`` pascal color, brush, reserved). Entry i's key is
``min + i*multiplier`` (or ``log_base**key`` when log_base != 0). Pascal
``$AABBGGRR`` TColor byte order is swapped to ``AARRGGBB`` (the swap the
reference delegates to osgeo_utils' ``pas_color_to_rgb``).

`bin_case` / `bin_case_sql` turn a parsed palette into the same CASE
binning expression for Spark and the DuckDB oracle: color = entry with
the greatest key <= value (values below the first key take the first
entry) — gdaldem color-relief "nearest below" semantics.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# the reference's own test palette (gdalos_color.py:52), rescaled from
# percent steps (multiplier 16.67) to elevation steps of 100
DEFAULT_TALOS_PALETTE = (
    "0;7;6;0;100;0;1;1;0;"
    "|;$CC00007F;0;3;2|;$CC0000FF;0;3;2|;$CC00FFFF;0;3;2|;$CC00FF00;0;3;2"
    "|;$CCFFFF00;0;3;2|;$CCFF0000;0;3;2|;$CCFF00FF;0;3;2"
)


def pas_color_to_rgba(color: str) -> str:
    """'$AARRGGBB'-digit pascal color -> 'AARRGGBB' hex string.

    The Delphi TColor byte order and the R/B swap the reference applies
    (osgeo_utils pas_color_to_rgb) CANCEL: the reference's own shipped
    percents.txt — written by its test from the sample talos palette —
    pins $CC0000FF to '0 0 255 204' (blue), so the hex digits read
    directly as AARRGGBB. An extra swap here double-converted and
    mirrored R/B (caught by parsing the real file; pinned in
    test_reference_percent_color_file_parses)."""
    return color.lstrip("$").rjust(8, "0").upper()


def read_talos_palette(s: str) -> list[tuple[float, str]]:
    """Parse a talos palette string into ascending (key, rgba) pairs."""
    x = s.split(";")
    min_value = float(x[0])
    count = int(x[1])
    multiplier = float(x[4])
    log_base = float(x[8])
    ln_log_base = math.log(log_base) if log_base else None
    pal: list[tuple[float, str]] = []
    j = 9  # first entry field (after the 9 header fields)
    for i in range(count):
        color = x[j + 1]
        key = min_value + i * multiplier
        if ln_log_base:
            key = math.exp(ln_log_base * key)
        pal.append((key, pas_color_to_rgba(color)))
        j += 4
    return pal


def _rgba_hex(r: int, g: int, b: int, a: int = 255) -> str:
    return f"{a:02X}{r:02X}{g:02X}{b:02X}"


def read_color_file(
    text: str, value_range: tuple[float, float] | None = None
) -> tuple[list[tuple[float, str]], str | None]:
    """Parse a GDAL color-relief text file — the format the reference
    writes via talos_to_color_file (gdalos_color.py:42) and ships under
    data/color_files: one ``value R G B [A]`` per line, where value may
    be a percent (``16.67%``, resolved against ``value_range``) or the
    literal ``nv`` (nodata color, returned separately). Returns
    (ascending (key, 'AARRGGBB') pairs, nv rgba or None)."""
    pal: list[tuple[float, str]] = []
    nv: str | None = None
    for line in text.splitlines():
        parts = line.replace(",", " ").split()
        if not parts or parts[0].startswith("#"):
            continue
        chans = [int(p) for p in parts[1:5]]
        rgba = _rgba_hex(*chans) if len(chans) >= 3 else None
        if rgba is None:
            raise ValueError(f"color line needs R G B [A]: {line!r}")
        tok = parts[0]
        if tok == "nv":
            nv = rgba
            continue
        if tok.endswith("%"):
            if value_range is None:
                raise ValueError("percent palette needs a value_range")
            lo, hi = value_range
            key = lo + (hi - lo) * float(tok[:-1]) / 100.0
        else:
            key = float(tok)
        pal.append((key, rgba))
    pal.sort(key=lambda kv: kv[0])
    return pal, nv


def read_qgis_palette(xml_text: str) -> list[tuple[float, str]]:
    """Parse a QGIS .qml/.qlr layer style into ascending (key,
    'AARRGGBB') pairs — the XML palettes the reference converts with
    xml_to_color_file (gdalos_color.py:62): ``paletteEntry`` elements
    (paletted rasters) or colorrampshader ``item`` elements (gradient
    ramps), each carrying value / ``#rrggbb`` color / alpha."""
    from xml.etree import ElementTree

    root = ElementTree.fromstring(xml_text)
    pal: list[tuple[float, str]] = []
    for el in root.iter():
        if el.tag not in ("paletteEntry", "item"):
            continue
        color = el.attrib["color"].lstrip("#")
        if len(color) == 8:  # QGIS may emit #AARRGGBB
            a, rgb = int(color[:2], 16), color[2:]
        else:
            a, rgb = int(el.attrib.get("alpha", "255")), color
        pal.append((float(el.attrib["value"]), f"{a:02X}{rgb.upper()}"))
    pal.sort(key=lambda kv: kv[0])
    return pal


def render_color_file(
    pal: list[tuple[float, str]], nv: str | None = None
) -> str:
    """Inverse of read_color_file: (key, 'AARRGGBB') pairs -> the GDAL
    color-relief text form (integer keys print as integers, matching
    the reference's files)."""
    def fmt(k: float) -> str:
        return repr(int(k)) if float(k).is_integer() else repr(k)

    lines = [
        f"{fmt(k)} {int(c[2:4], 16)} {int(c[4:6], 16)} "
        f"{int(c[6:8], 16)} {int(c[0:2], 16)}"
        for k, c in pal
    ]
    if nv is not None:
        lines.append(
            f"nv {int(nv[2:4], 16)} {int(nv[4:6], 16)} "
            f"{int(nv[6:8], 16)} {int(nv[0:2], 16)}"
        )
    return "\n".join(lines) + "\n"


def bin_case(pal: list[tuple[float, str]], value: Column) -> Column:
    """rgba of the palette entry with the greatest key <= value —
    descending WHENs in one CASE chain (below first key -> first entry)."""
    case = F.when(value >= F.lit(pal[-1][0]), pal[-1][1])
    for key, rgba in reversed(pal[1:-1]):
        case = case.when(value >= F.lit(key), rgba)
    return case.otherwise(pal[0][1])


def bin_key_case(pal: list[tuple[float, str]], value: Column) -> Column:
    """Lower-bound key of the matched palette entry (double)."""
    case = F.when(value >= F.lit(pal[-1][0]), F.lit(pal[-1][0]))
    for key, _ in reversed(pal[1:-1]):
        case = case.when(value >= F.lit(key), F.lit(key))
    return case.otherwise(F.lit(pal[0][0])).cast("double")


def bin_case_sql(pal: list[tuple[float, str]], value_expr: str) -> str:
    whens = " ".join(
        f"WHEN {value_expr} >= {key} THEN '{rgba}'" for key, rgba in reversed(pal[1:])
    )
    return f"CASE {whens} ELSE '{pal[0][1]}' END"


def bin_key_case_sql(pal: list[tuple[float, str]], value_expr: str) -> str:
    whens = " ".join(
        f"WHEN {value_expr} >= {key} THEN CAST({key} AS DOUBLE)" for key, _ in reversed(pal[1:])
    )
    return f"CASE {whens} ELSE CAST({pal[0][0]} AS DOUBLE) END"


def interp_channel_case_sql(
    pal: list[tuple[float, str]], chan_off: int, vc_expr: str, div_op: str
) -> str:
    """CASE expression linearly interpolating ONE rgba channel between
    palette stops, over an exact integer value-in-cents expression.

    ``chan_off`` is the hex offset into 'AARRGGBB' (0=A, 2=R, 4=G, 6=B).
    All arithmetic is BIGINT: for v in segment [k0, k1) the channel is
    ``(c0*(k1-k0) + (v-k0)*(c1-c0)) DIV (k1-k0)`` whose numerator is a
    linear function of v with non-negative endpoint values (c0*dk and
    c1*dk), hence non-negative everywhere in the segment — so Spark's
    truncating ``div`` and DuckDB's flooring ``//`` agree bit-for-bit.
    ``div_op`` selects the engine's integer-division token."""
    entries = [
        (int(round(k * 100)), int(rgba[chan_off : chan_off + 2], 16))
        for k, rgba in pal
    ]
    whens = [f"WHEN {vc_expr} <= {entries[0][0]} THEN {entries[0][1]}"]
    for (k0, c0), (k1, c1) in zip(entries, entries[1:]):
        dk, dc = k1 - k0, c1 - c0
        whens.append(
            f"WHEN {vc_expr} < {k1} THEN "
            f"(({c0} * {dk} + ({vc_expr} - {k0}) * ({dc})) {div_op} {dk})"
        )
    whens.append(f"ELSE {entries[-1][1]}")
    return "CASE " + " ".join(whens) + " END"


def bin_index_case_sql(pal: list[tuple[float, str]], value_expr: str) -> str:
    """0-based palette-entry INDEX of the matched bin — the pixel value
    a palette-band raster stores (the color-table lookup key
    -expand rgb resolves)."""
    whens = " ".join(
        f"WHEN {value_expr} >= {key} THEN {i}"
        for i, (key, _) in reversed(list(enumerate(pal))[1:])
    )
    return f"CAST(CASE {whens} ELSE 0 END AS INTEGER)"


def channel_case_sql(pal: list[tuple[float, str]], chan_off: int, value_expr: str) -> str:
    """One expanded 8-bit channel (chan_off: 0=A, 2=R, 4=G, 6=B in the
    AARRGGBB hex) of the matched bin — host-parsed to integer literals,
    so the expansion is one CASE chain per band, exact integers only."""
    whens = " ".join(
        f"WHEN {value_expr} >= {key} THEN {int(c[chan_off:chan_off + 2], 16)}"
        for key, c in reversed(pal[1:])
    )
    return f"CAST(CASE {whens} ELSE {int(pal[0][1][chan_off:chan_off + 2], 16)} END AS INTEGER)"
