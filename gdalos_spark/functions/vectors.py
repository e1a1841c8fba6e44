"""Portable embedding/vector math — bit-identical across Spark and DuckDB.

The only cross-engine-safe float reduction is an ORDERED fold: Spark
`F.aggregate` left-folds the array in index order, and DuckDB
`list_sum(list_transform(...))` reduces in the same order; both operate
on IEEE doubles, so sums match bit-for-bit (verified over the full
embeddings table). Never sum floats through a groupBy — grouped float
addition is unordered and nondeterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMB_DIM = 64


def emb_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def fold_sum(arr: Column) -> Column:
    """Ordered left-fold sum over a double array."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two double arrays (ordered fold)."""
    return fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def norm2(emb: Column) -> Column:
    """Squared L2 norm of a float-array column."""
    return fold_sum(F.transform(emb, lambda x: x.cast("double") * x.cast("double")))


def norm2_sql(col: str = "embedding", dim: int = EMB_DIM) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"j -> CAST({col}[j] AS DOUBLE) * CAST({col}[j] AS DOUBLE)))"
    )


def dot_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    return (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"j -> CAST({a}[j] AS DOUBLE) * CAST({b}[j] AS DOUBLE)))"
    )


# ---------------------------------------------------------------------------
# sign-LSH: bucket = sign pattern of N_PLANES deterministic hyperplane
# projections. Hyperplane weights are pseudo-random integers derived with
# pure arithmetic so both engines build identical planes.
# ---------------------------------------------------------------------------

N_PLANES = 8
_W_MUL = 2_654_435_761  # Knuth multiplicative constant
_W_MOD = 1_000_003
_W_OFF = 501_001


def plane_weight(i: int, j: int) -> int:
    """Weight of hyperplane i at dimension j (zero-mean-ish ints)."""
    return ((1 + i * EMB_DIM + j) * _W_MUL) % _W_MOD - _W_OFF


def lsh_bucket(emb: Column) -> Column:
    """Sign-LSH bucket id in [0, 2^N_PLANES) for a float-array column."""
    v = emb_double(emb)
    planes = [
        F.array(*[F.lit(float(plane_weight(i, j))) for j in range(EMB_DIM)])
        for i in range(N_PLANES)
    ]
    return sum(
        F.when(dot(v, planes[i]) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(N_PLANES)
    ).cast("int")


def lsh_bucket_sql(col: str = "embedding") -> str:
    def plane_dot(i: int) -> str:
        w = f"(((1 + {i * EMB_DIM} + (j - 1)) * {_W_MUL}) % {_W_MOD} - {_W_OFF})"
        return (
            f"list_sum(list_transform(range(1, {EMB_DIM + 1}), "
            f"j -> CAST({col}[j] AS DOUBLE) * CAST({w} AS DOUBLE)))"
        )

    bucket = " + ".join(
        f"CASE WHEN {plane_dot(i)} > 0 THEN {1 << i} ELSE 0 END" for i in range(N_PLANES)
    )
    return f"CAST({bucket} AS INTEGER)"
