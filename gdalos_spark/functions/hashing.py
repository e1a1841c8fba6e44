"""Portable hashing primitives — identical results in Spark and DuckDB.

Engine-native hash functions (Spark xxhash64/hash, DuckDB hash) differ
between engines, so every hash the correctness gate sees is built from
md5 (identical everywhere) reduced to integers with plain arithmetic:

    int60(s)  = first 15 hex digits of md5(s) as a 60-bit int
    base(s)   = int60(s) mod P31          (P31 = 2^31-1, Mersenne prime)
    h_i(s)    = (A_i * base(s) + B_i) mod P31   (universal-hash family)

A_i * base < 2^62 so the products stay inside signed 64-bit range in both
engines. The same definitions are emitted as SQL strings for the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1

# Fixed universal-hash parameters (odd multipliers, arbitrary offsets).
# 16 permutations -> 4 LSH bands of 4 rows each.
MINHASH_A = (
    1_103_515_245, 1_299_721, 2_038_074_743, 32_452_843,
    49_979_687, 67_867_967, 86_028_121, 104_395_301,
    122_949_823, 141_650_939, 160_481_183, 179_424_673,
    198_491_317, 217_645_177, 236_887_691, 256_203_161,
)
MINHASH_B = (
    12_345, 67_891, 234_567, 891_011,
    1_213_141, 5_161_718, 1_920_212, 2_232_425,
    2_627_282, 9_303_132, 3_334_353, 6_373_839,
    4_041_424, 3_444_546, 4_748_495, 5_051_525,
)


def md5_int60(col: Column) -> Column:
    """First 15 hex digits of md5 as a non-negative 60-bit BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int60_sql(expr: str) -> str:
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def hash_base(col: Column) -> Column:
    """md5-derived value reduced mod P31 (fits universal-hash products)."""
    return md5_int60(col) % F.lit(P31)


def hash_base_sql(expr: str) -> str:
    return f"({md5_int60_sql(expr)} % {P31})"


def perm_hash(base: Column, i: int) -> Column:
    """i-th universal hash of a base value, in [0, P31)."""
    return (F.lit(MINHASH_A[i]) * base + F.lit(MINHASH_B[i])) % F.lit(P31)


def perm_hash_sql(base_expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * {base_expr} + {MINHASH_B[i]}) % {P31})"
