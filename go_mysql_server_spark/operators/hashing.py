"""Cross-engine deterministic hashing primitives.

Dedup/similarity operators need hash functions that the DuckDB oracle can
reproduce exactly. Spark's hash()/xxhash64() have no DuckDB equivalent, so
we derive integers from md5 hex (stable, available in both engines):

  Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
  DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

15 hex chars = 60 bits, so the value always fits in a signed 64-bit int.
md5 is ~10× slower than xxhash64 but still JVM-side, vectorized, and far
from the bottleneck (the shuffle is); a production deployment would swap
in xxhash64 via the same helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int60(col: Column) -> Column:
    """60-bit non-negative integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int60_sql(expr: str) -> str:
    """Same hash as md5_int60, as a DuckDB SQL expression."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def seeded(col: Column, seed: int) -> Column:
    """Seeded variant: hash of value + '#' + seed (both engines identical)."""
    return md5_int60(F.concat(col, F.lit(f"#{seed}")))


def seeded_sql(expr: str, seed: int) -> str:
    return md5_int60_sql(f"{expr} || '#{seed}'")
