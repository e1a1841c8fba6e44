"""Dependency-leveled scalar expression chains shared between Spark and
DuckDB.

The cross-engine correctness gate hinges on both engines evaluating the
IDENTICAL IEEE expression text (see functions/literals.py and the
polynomial banks in operators/text.py / operators/viewshed.py). Long
scalar programs — the ITM radio model needs ~150 intermediate columns —
outgrow the hand-staged tuple pattern of _geo_stages, so this module
provides a tiny ordered-column "program" with:

- transcendental helpers (ln / exp(-x) / cbrt) built ONLY from +,*,/,
  sqrt, floor, integer bit-length and CASE — every one of which is
  correctly rounded or exact in both engines, so identical text means
  identical bits (the engine-libm ban, verify-skill gotcha #6);
- automatic dependency leveling, so the Spark side renders as a few
  wide `withColumns` batches and the DuckDB side as the same number of
  nested `SELECT *, ... FROM (...)` layers instead of one subquery per
  column.

Engine differences are confined to two spellings injected at build
time: integer division (Spark ``div``, DuckDB ``//``) and the power-of-
two shift (Spark ``shiftleft(CAST(1 AS BIGINT), e)``, DuckDB
``(CAST(1 AS BIGINT) << e)``). Build the chain once per engine; all
other generated text is byte-identical.
"""

from __future__ import annotations

import math
import re

from gdalos_spark.functions.literals import dbl_lit, horner

LN2 = 0.6931471805599453
LOG2E = 1.4426950408889634
# atanh-series log2 mantissa coefficients 1/(2k+1) — the proven bank
# from operators/text._log2_stages (7 terms, z <= 1/3 => err < 2e-8)
_ATANH_C = [1.0, 1.0 / 3, 1.0 / 5, 1.0 / 7, 1.0 / 9, 1.0 / 11, 1.0 / 13]
_LOG2_SCALE = "2.885390081777927"  # 2/ln(2), shared literal with text.py
# Maclaurin exp(-r) on r in [0, ln 2): 13 terms => truncation < 2e-12
_EXPM_C = [(-1.0) ** k / math.factorial(k) for k in range(13)]


def spark_spellings():
    return (" div ", lambda e: f"shiftleft(CAST(1 AS BIGINT), {e})")


def duckdb_spellings():
    return (" // ", lambda e: f"(CAST(1 AS BIGINT) << ({e}))")


class ScalarChain:
    """Ordered (name, expr) program; exprs may reference earlier names."""

    def __init__(self, intdiv: str, shift) -> None:
        self._intdiv = intdiv
        self._shift = shift
        self.items: list[tuple[str, str]] = []

    def add(self, name: str, expr: str) -> str:
        self.items.append((name, expr))
        return name

    # -- transcendentals ---------------------------------------------------

    def ln(self, y: str, out: str, scale: float = 1e9) -> str:
        """out = ln(y) for y > 0, via micro-unit integerization (exact
        floor(y*scale + 0.5), identical both engines) + the atanh-series
        log2 of operators/text. Inputs are clamped to >= 1 integer unit
        so degenerate rows stay finite (callers branch-gate with CASE);
        quantization error is scale-relative and engine-identical.

        The input is additionally clamped to <= 9.0e18/scale BEFORE the
        integerization: past that, floor(y*scale) exceeds BIGINT and the
        double->BIGINT cast diverges across engines (DuckDB throws Out of
        Range, Spark saturates). The clamp is the same SQL text on both
        sides, so degenerate rows (e.g. an underflowed diffraction-line
        slope pushing a fit distance to ~1e12) saturate at ln(cap)
        identically instead of crashing one engine and corrupting the
        other.

        Every stage is materialized as its own column ON PURPOSE: the
        total expression NODE count is what sizes DuckDB's per-thread
        executor state (one ~16 KB intermediate vector per node per
        thread), and an inlined variant that repeated the mantissa
        sub-expression ~24x per ln pushed a ~400-ln program past 100 GB
        of transient state at 32 threads. Small flat stages keep the
        node count minimal; depth is handled at render time (see
        _plan / the ITM render-mode notes)."""
        cap = 9.0e18 / scale
        yi = self.add(
            f"{out}_yi",
            f"greatest(CAST(1 AS BIGINT), CAST(floor(least({y}, {dbl_lit(cap)}) * {dbl_lit(scale)} + 0.5e0) AS BIGINT))",
        )
        bl = self.add(f"{out}_bl", f"(length(bin({yi})) - 1)")
        m = self.add(
            f"{out}_m",
            f"(CAST({yi} AS DOUBLE) / CAST({self._shift(bl)} AS DOUBLE))",
        )
        z = self.add(f"{out}_z", f"(({m} - 1.0e0) / ({m} + 1.0e0))")
        poly = self.add(f"{out}_p", horner(f"({z} * {z})", _ATANH_C))
        lg = self.add(
            f"{out}_lg",
            f"(CAST({bl} AS DOUBLE) + {_LOG2_SCALE}e0 * {z} * {poly})",
        )
        return self.add(
            out, f"({dbl_lit(LN2)} * {lg} - {dbl_lit(math.log(scale))})"
        )

    def exp_neg(self, x: str, out: str) -> str:
        """out = exp(-x): base-2 range reduction (nt = floor(x*log2 e),
        an exact shift) + Maclaurin exp(-r) on the residual r in
        [0, ln 2) — truncation < 2e-12 relative.

        The reduced exponent is clamped to [0, 62] so the BIGINT shift
        stays representable for ANY input: without it, x >= 63*ln2
        (~43.7, reachable from uncapped fit distances in the ITM chain)
        makes DuckDB throw Out of Range on 1<<63 while Spark's shiftleft
        wraps mod 64 and returns garbage. With the clamp both engines
        saturate identically at ~exp(-43) ~ 2e-19, and negative inputs
        (callers' responsibility, but cheap to make safe) floor at
        exp(0) scale rather than a negative shift.

        Stages are materialized, not inlined — see ln's docstring for
        why node count (DuckDB executor state) outranks depth here."""
        t = self.add(
            f"{out}_t",
            f"least(greatest(({x}) * {dbl_lit(LOG2E)}, 0.0e0), 62.0e0)",
        )
        nt = self.add(f"{out}_nt", f"CAST(floor({t}) AS INTEGER)")
        r = self.add(
            f"{out}_r", f"(({t} - CAST({nt} AS DOUBLE)) * {dbl_lit(LN2)})"
        )
        p = self.add(f"{out}_p", horner(r, _EXPM_C))
        return self.add(
            out, f"({p} / CAST({self._shift(nt)} AS DOUBLE))"
        )

    def cbrt(self, u: str, out: str, iters: int = 7) -> str:
        """out = cbrt(u) for u > 0: seed 2^(bl div 3) from the integer
        bit length of u in 1e-6 units (within 2x of the true root), then
        Newton y <- (2y + u/y^2)/3 — quadratic convergence reaches
        full double precision in 7 steps; every operation is IEEE
        +,*,/ so both engines walk the identical value sequence."""
        ui = self.add(
            f"{out}_ui",
            f"greatest(CAST(1 AS BIGINT), CAST(floor(({u}) * 1.0e6 + 0.5e0) AS BIGINT))",
        )
        ud = self.add(f"{out}_ud", f"CAST({ui} AS DOUBLE)")
        bl = self.add(f"{out}_bl", f"(length(bin({ui})) - 1)")
        e3 = self.add(f"{out}_e3", f"(({bl}){self._intdiv}3)")
        y = self.add(f"{out}_y0", f"CAST({self._shift(e3)} AS DOUBLE)")
        for k in range(1, iters + 1):
            y = self.add(
                f"{out}_y{k}", f"((2.0e0 * {y} + {ud} / ({y} * {y})) / 3.0e0)"
            )
        # cbrt(u) = cbrt(u * 1e6) / 100
        return self.add(out, f"({y} * 0.01e0)")

    # -- rendering ----------------------------------------------------------

    def levels(self) -> list[list[tuple[str, str]]]:
        """Greedy dependency leveling: a column referencing a name
        defined in the current batch starts a new batch."""
        out: list[list[tuple[str, str]]] = []
        cur: list[tuple[str, str]] = []
        cur_names: set[str] = set()
        for name, expr in self.items:
            toks = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr))
            if toks & cur_names:
                out.append(cur)
                cur, cur_names = [], set()
            cur.append((name, expr))
            cur_names.add(name)
        if cur:
            out.append(cur)
        return out

    def _plan(self, keep, inputs):
        """Liveness-pruned rendering plan: for each level, the
        pass-through columns still referenced downstream and the subset
        of the level's definitions worth emitting. Without pruning each
        level carries EVERY prior column (`SELECT *`), so a ~600-column
        / ~490-level program pushes ~900-wide vectors through ~490
        projection operators per thread — enough to OOM DuckDB outright
        and to bloat Spark's analysis the same way. With it, width per
        level is the live set (tens), independent of program length."""
        levels = self.levels()
        defined = {n for n, _ in self.items}
        known = defined | set(inputs)
        missing = set(keep) - known
        if missing:
            raise ValueError(f"keep names not defined anywhere: {sorted(missing)}")
        need = set(keep)
        plan = []
        for batch in reversed(levels):
            names_here = {n for n, _ in batch}
            emit = [(n, e) for n, e in batch if n in need]
            carry = sorted(need - names_here)
            refs: set[str] = set()
            for _, e in emit:
                refs |= {t for t in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", e) if t in known}
            need = (need - names_here) | refs
            plan.append((carry, emit))
        plan.reverse()
        return plan

    def apply_spark(self, df, keep=None, inputs=(), segment=None):
        """keep/inputs enable liveness pruning (see _plan): `keep` is
        the column set the caller reads off the result, `inputs` the
        source-frame columns the program may reference or pass through.

        `segment` caps the PLAN DEPTH a single Spark query tree carries:
        every `segment` emitted levels the frame is cut with a lazy
        localCheckpoint, so Catalyst's tree recursion and whole-stage
        codegen's consume() recursion each see at most `segment` stacked
        projections. Both recursions overflow the JVM stack somewhere
        past ~300 stacked projections (measured: 307 renders fine, 487
        overflows — analysis when wide, codegen when narrow), and the
        checkpointed intermediate is link-cardinality rows, so the cut
        is free at any scale."""
        from pyspark.sql import functions as F

        if keep is None:
            for batch in self.levels():
                df = df.withColumns({n: F.expr(e) for n, e in batch})
            return df
        emitted = 0
        for carry, emit in self._plan(keep, inputs):
            if not emit:
                continue  # fully-dead level: nothing defined here survives
            df = df.select(
                *carry, *[F.expr(e).alias(n) for n, e in emit]
            )
            emitted += 1
            if segment and emitted % segment == 0:
                df = df.localCheckpoint(eager=False)
        return df

    def wrap_sql(self, inner: str, keep=None, inputs=()) -> str:
        """Render as a FLAT WITH-chain (one CTE per level), not nested
        subqueries: the full lrprop program levels ~300 deep, and a
        300-deep `SELECT * FROM (...)` nest exhausts DuckDB's parser
        recursion; a 300-CTE chain is linear and parses fine (an inner
        query carrying its own WITH nests legally inside the first
        CTE's body). keep/inputs enable liveness pruning (see _plan).

        The pruned path renders the input CTE AS MATERIALIZED: DuckDB
        then feeds the chain from a materialized scan, and a sub-morsel
        input (the ITM link table is ~300 rows) runs the WHOLE chain on
        ONE thread. Without it every worker thread instantiates executor
        state for every level, and the >=128 KB per-level chunks each
        become an mmap — ~60k mappings at 32 threads for the ITM
        program, which overruns the kernel's default 65530
        vm.max_map_count and surfaces as a spurious out-of-memory."""
        parts = [f"__sc_in AS ({inner})"]
        prev = "__sc_in"
        if keep is None:
            for i, batch in enumerate(self.levels()):
                cols = ", ".join(f"{e} AS {n}" for n, e in batch)
                parts.append(f"__sc_{i} AS (SELECT *, {cols} FROM {prev})")
                prev = f"__sc_{i}"
            return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM {prev}"
        parts[0] = f"__sc_in AS MATERIALIZED ({inner})"
        for i, (carry, emit) in enumerate(self._plan(keep, inputs)):
            if not emit:
                continue  # fully-dead level: nothing defined here survives
            cols = ", ".join([*carry, *(f"{e} AS {n}" for n, e in emit)])
            parts.append(f"__sc_{i} AS (SELECT {cols} FROM {prev})")
            prev = f"__sc_{i}"
        return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM {prev}"
