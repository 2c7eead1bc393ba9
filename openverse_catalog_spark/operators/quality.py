"""Declarative data-quality checks compiled into ONE aggregation pass.

The reference validates data row-by-row during ingestion (required-field
drops, url/license guards — loader/sql.py paths) and reports counts per
DAG run. At 100 TB you cannot afford one scan per rule: every scalar
rule here (null / range / set / regex / uniqueness) compiles into a
single ``.agg()`` over one scan of the table — Catalyst evaluates all
the conditional sums in the same whole-stage-codegen pass, and partial
aggregation makes the shuffled state one row per rule. Referential
checks add one broadcast anti-join per foreign table (the dim is the
broadcast side; the fact table is still scanned once per FK table).

Usage::

    report = quality_report(
        df,
        rules=[
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 600_000),
            in_set("o_orderstatus", ["O", "F", "P"]),
            unique("o_orderkey"),
            matches("o_orderpriority", r"^[1-5]-"),
        ],
        fk_rules=[fk("o_custkey", customer_df, "c_custkey")],
    )

Report schema: (check, violations, passed) — one row per rule, ready to
gate a pipeline or land in a run-report table (reference's load_report
analog, but constraint-based).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    # builds the per-rule violation-count aggregate expression
    agg: Callable[[], Column]
    # builds the ROW-LEVEL validity predicate (None for rules that only
    # exist at aggregate grain, e.g. unique) — lets ingestion gates
    # (CowTable.merge validate_rules) reject violating rows instead of
    # only counting them
    cond: "Callable[[], Column] | None" = None


def _viol(cond: Column) -> Column:
    """Count rows where the rule is violated (null predicate = violation
    for value rules — an unknown value cannot be proven valid; an empty
    table violates nothing — sum over zero rows coalesces to 0)."""
    return F.coalesce(
        F.sum(F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)),
        F.lit(0),
    )


def not_null(col: str) -> Rule:
    return Rule(
        f"not_null({col})",
        lambda: _viol(F.col(col).isNotNull()),
        cond=lambda: F.col(col).isNotNull(),
    )


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range({col})",
        lambda: _viol(F.col(col).between(F.lit(lo), F.lit(hi))),
        cond=lambda: F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def in_set(col: str, values) -> Rule:
    vals = list(values)
    return Rule(
        f"in_set({col})",
        lambda: _viol(F.col(col).isin(vals)),
        cond=lambda: F.col(col).isin(vals),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"matches({col})",
        lambda: _viol(F.col(col).rlike(pattern)),
        cond=lambda: F.col(col).rlike(pattern),
    )


def unique(col: str) -> Rule:
    # violations = rows beyond the first per value = count - countDistinct
    return Rule(
        f"unique({col})",
        lambda: F.count(F.col(col)) - F.countDistinct(F.col(col)),
    )


@dataclass(frozen=True)
class FkRule:
    name: str
    col: str
    dim: DataFrame
    dim_col: str


def fk(col: str, dim: DataFrame, dim_col: str) -> FkRule:
    return FkRule(f"fk({col})", col, dim, dim_col)


def quality_report(
    df: DataFrame,
    rules: list[Rule],
    fk_rules: list[FkRule] | None = None,
) -> DataFrame:
    """All scalar rules in one scan; one broadcast anti-join per FK rule."""
    aggs = [r.agg().cast("bigint").alias(f"_c{i}") for i, r in enumerate(rules)]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{r.name.replace(chr(39), '')}', _c{i}" for i, r in enumerate(rules)
    )
    report = one.select(
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (check, violations)"
        )
    )
    for fr in fk_rules or []:
        dim_keys = fr.dim.select(F.col(fr.dim_col).alias(fr.col)).distinct()
        orphans = (
            df.select(fr.col)
            .filter(F.col(fr.col).isNotNull())
            .join(F.broadcast(dim_keys), fr.col, "left_anti")
        )
        report = report.unionByName(
            orphans.agg(
                F.lit(fr.name).alias("check"),
                F.count(F.lit(1)).alias("violations"),
            )
        )
    return report.select(
        "check", "violations", (F.col("violations") == 0).alias("passed")
    )
