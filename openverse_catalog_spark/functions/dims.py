"""Literal dimension builder: inline ``VALUES`` relations.

Tiny static dimensions (license pairs, TLS domains, blocklists,
provider code maps) are broadcast into joins all over the engine. Built
with ``spark.createDataFrame`` they become python-RDD-backed relations
(``Scan ExistingRDD`` in the plan), which cost a Python worker
round-trip on EVERY query invocation — ~0.1-0.3 s of pure overhead on
queries whose real work is one map-side pass (round-7 A/B finding on
``clean_sub_provider_update``). Rendered as a SQL ``VALUES`` inline
table they plan as a ``LocalTableScan``: literal rows shipped inside
the plan, zero Python involvement, still broadcastable.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def _sql_literal(v, escape_backslash: bool = True) -> str:
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float) and not math.isfinite(v):
        # repr(nan/inf) would render a bare identifier; Spark's DOUBLE
        # cast accepts these spellings
        word = "NaN" if math.isnan(v) else (
            "Infinity" if v > 0 else "-Infinity"
        )
        return f"CAST('{word}' AS DOUBLE)"
    if isinstance(v, (int, float)):
        return repr(v)
    # backslash FIRST (in the default parser mode string literals are
    # unescaped: a lone '\b' in the SQL text would arrive as
    # backspace) — but ONLY then: under escapedStringLiterals=true the
    # parser takes backslashes verbatim and doubling would corrupt the
    # value the other way. Then quotes.
    s = str(v)
    if escape_backslash:
        s = s.replace("\\", "\\\\")
    return "'" + s.replace("'", "''") + "'"


def _split_cols(schema: str) -> list[str]:
    """Split a DDL column list on TOP-LEVEL commas only, so
    parameterized types (``decimal(10,2)``, ``map<string,int>``,
    ``array<struct<a:int,b:int>>``) stay intact."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(schema[start:i])
            start = i + 1
    out.append(schema[start:])
    return [c for c in (c.strip() for c in out) if c]


def values_dim(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema: str,
) -> DataFrame:
    """A literal dimension from ``rows`` with the DDL ``schema``
    ("name type, name type"): planned as a LocalTableScan. Values are
    CAST to the declared types so the frame's schema matches what the
    same call to ``createDataFrame`` would have produced; zero rows
    yield an empty relation (same contract as createDataFrame — an
    empty blocklist is a valid dimension). Supports
    str/int/float/bool/None cells — the row shapes static config dims
    actually have."""
    cols = [c.split(None, 1) for c in _split_cols(schema)]
    names = [c[0] for c in cols]
    types = [c[1] for c in cols]
    esc = str(spark.conf.get(
        "spark.sql.parser.escapedStringLiterals", "false"
    )).lower() != "true"
    body = ", ".join(
        "(" + ", ".join(_sql_literal(v, escape_backslash=esc) for v in r)
        + ")" for r in rows
    )
    if not body:
        sel = ", ".join(
            f"CAST(NULL AS {t}) AS {n}" for n, t in zip(names, types)
        )
        return spark.sql(f"SELECT {sel} WHERE 1 = 0")
    sel = ", ".join(
        f"CAST(v.{n} AS {t}) AS {n}" for n, t in zip(names, types)
    )
    return spark.sql(
        f"SELECT {sel} FROM (VALUES {body}) AS v({', '.join(names)})"
    )
