"""Portable deterministic hashing shared by dedup / fingerprint operators.

``hash60(s)`` = first 15 hex digits of md5 as a non-negative 60-bit
integer. Chosen because BOTH engines compute it identically —
Spark: ``conv(substr(md5(s),1,15),16,10)::bigint``;
DuckDB: ``('0x' || substr(md5(s),1,15))::bigint`` —
so every hash-based operator (MinHash, SimHash, exact-dup keys,
fingerprints) is oracle-verifiable. md5 is not cryptographically relevant
here; it's a stable uniform hash available on the JVM side (no Python UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(c: Column) -> Column:
    """Non-negative 60-bit integer hash of a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash60_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value for expression ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded(seed: int, c: Column) -> Column:
    """Seed-differentiated hash for MinHash permutations."""
    return hash60(F.concat(F.lit(f"s{seed}|"), c))


def seeded_sql(seed: int, expr: str) -> str:
    return hash60_sql(f"'s{seed}|' || {expr}")
