"""Cross-engine-safe float literal spelling.

Both Spark and DuckDB lex a bare fractional literal
(`0.9933056200098587`) as DECIMAL. Spark's DECIMAL->DOUBLE coercion is
correctly rounded, but DuckDB's goes through scaled-integer division
and is ONE ULP OFF the correct string->binary64 parse for some
constants (measured: `CAST(0.9933056200098587 AS DOUBLE)` -> ...88;
wrapping in CAST doesn't help because the literal is already DECIMAL by
then). An exponent suffix makes both lexers produce DOUBLE directly
with correct rounding — so every float literal that participates in
gated value arithmetic must be spelled through `dbl_lit`.

`tools/literal_audit.py` sweeps every oracle for violations; the
regression test lives in tests/test_round11_ops.py.
"""

from __future__ import annotations

import math


def dbl_lit(x: float) -> str:
    """Spell a float so BOTH engines parse it as DOUBLE exactly.

    Non-finite inputs would otherwise emit invalid SQL (repr(inf) ->
    'infe0') that surfaces as a parse error far from the call site, so
    they fail loud here at expression-build time."""
    x = float(x)
    if not math.isfinite(x):
        raise ValueError(f"dbl_lit requires a finite float, got {x!r}")
    r = repr(x)
    return r if ("e" in r or "E" in r) else r + "e0"


def horner(var: str, coeffs: list[float]) -> str:
    """Left-nested Horner polynomial text over `var`, every coefficient
    exponent-spelled; identical expression text for both engines."""
    s = dbl_lit(coeffs[-1])
    for c in reversed(coeffs[:-1]):
        s = f"({dbl_lit(c)} + {var} * {s})"
    return s
