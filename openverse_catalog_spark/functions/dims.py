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


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_dim(
    spark: SparkSession,
    rows: Iterable[Sequence],
    schema: str,
) -> DataFrame:
    """A literal dimension from ``rows`` with the DDL ``schema``
    ("name type, name type"): planned as a LocalTableScan. Values are
    CAST to the declared types so the frame's schema matches what the
    same call to ``createDataFrame`` would have produced. Supports
    str/int/float/bool/None cells — the row shapes static config dims
    actually have."""
    cols = [c.strip().split(None, 1) for c in schema.split(",")]
    names = [c[0] for c in cols]
    types = [c[1] for c in cols]
    body = ", ".join(
        "(" + ", ".join(_sql_literal(v) for v in r) + ")" for r in rows
    )
    if not body:
        raise ValueError("values_dim needs at least one row")
    sel = ", ".join(
        f"CAST(v.{n} AS {t}) AS {n}" for n, t in zip(names, types)
    )
    return spark.sql(
        f"SELECT {sel} FROM (VALUES {body}) AS v({', '.join(names)})"
    )
