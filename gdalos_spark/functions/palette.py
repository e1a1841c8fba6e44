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
    """'$AABBGGRR' pascal TColor -> 'AARRGGBB' hex string."""
    c = color.lstrip("$").rjust(8, "0").upper()
    aa, bb, gg, rr = c[0:2], c[2:4], c[4:6], c[6:8]
    return aa + rr + gg + bb


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
