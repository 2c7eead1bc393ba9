"""Fixture/statement timing hook for bench.py.

Several benchmark entries (index / MV / stream-maintenance families)
spend 70-90% of their wall time BUILDING their fixture — a CoW base
table plus an index or materialized view — before the statement the
benchmark exists to watch (churn + incremental maintenance + query)
even starts. A regression in the statement is invisible inside the
combined number: 2x on a 2 s refresh moves a 12 s entry by ~15%.

So fixture-building registry queries call :func:`mark_fixture_done` at
the boundary, and bench.py splits each entry into
``{fixture_sec, statement_sec}``. The convention for the boundary:
the mark lands when the base tables and derived structures EXIST
(creates finished), so the statement side covers churn, maintenance
(refresh / stream drain), and the query itself — the parts that are
the operator's actual cost at scale.

Outside bench.py the marks are inert: the driver's correctness runs
set them and nobody reads them (bench clears before each query).
"""

from __future__ import annotations

import time

_mark: list[float] = []


def mark_fixture_done() -> None:
    """Record the fixture->statement boundary (latest call wins)."""
    _mark.append(time.time())


def pop_mark() -> float | None:
    """The most recent mark since the last clear/pop, or None."""
    t = _mark[-1] if _mark else None
    _mark.clear()
    return t


def clear() -> None:
    _mark.clear()
