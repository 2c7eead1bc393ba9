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


# --- universal-hash permutation family (MinHash fast path) -----------------
# One md5 per input, then N permutations h_i = (a_i * h' + b_i) mod P where
# h' = hash60 % P. P = 2^31 - 1 (prime); a_i,b_i < P derived from md5 of the
# index so both engines embed the same constants. a_i * h' < 2^62 — no int64
# overflow, so Spark and DuckDB compute identical values.

MERSENNE_P = 2_147_483_647


def perm_params(n: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(n):
        d = hashlib.md5(f"perm|{i}".encode()).hexdigest()
        a = int(d[:8], 16) % (MERSENNE_P - 1) + 1  # a in [1, P-1]
        b = int(d[8:16], 16) % MERSENNE_P
        out.append((a, b))
    return out


def perm_expr(base: Column, a: int, b: int) -> Column:
    """One permutation of a pre-reduced base hash (base = hash60 % P)."""
    return (F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE_P)


def perm_sql(base_expr: str, a: int, b: int) -> str:
    return f"(({a} * {base_expr} + {b}) % {MERSENNE_P})"
