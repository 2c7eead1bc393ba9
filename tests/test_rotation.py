"""Driver-gate rotation policy (__spark_entry__._rotated_names).

The driver verifies only the first ~50 ``queries()`` entries per
round, so the ordering IS the coverage mechanism: never-checked names
front-run (oracle-backed before rows-only, headline families first),
and once the registry is exhausted the order flips from coverage to
FRESHNESS — stalest driver evidence first, a re-check sends the name
to the back. These tests pin the flip directly so the post-exhaustion
rounds (r9+) hold no surprises.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry


def _fake_queries(names):
    return {n: (lambda spark, sf: None) for n in names}


def test_driver_checked_latest_round_wins(tmp_path):
    """A name appearing in several CORRECTNESS files maps to the
    LATEST round — the freshness key — and unparseable files are
    skipped, not fatal."""
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"a": {}, "b": {}})
    )
    (tmp_path / "CORRECTNESS_r07.json").write_text(json.dumps({"a": {}}))
    (tmp_path / "CORRECTNESS_r05.json").write_text("{not json")
    assert entry._driver_checked(str(tmp_path)) == {"a": 7, "b": 3}


def test_rotation_fresh_names_front_run(monkeypatch):
    """Coverage phase: never-checked oracle-backed names lead (prio
    families first, then registration order), rows-only fresh names
    follow, already-checked names trail ordered stalest-first."""
    names = ["agg_x", "sql_y", "knn_z", "plain_w", "agg_done", "sql_done"]
    monkeypatch.setattr(entry, "QUERIES", _fake_queries(names))
    monkeypatch.setattr(
        entry, "ORACLES",
        {n: "SELECT 1" for n in names if n != "plain_w"},
    )
    monkeypatch.setattr(
        entry, "_driver_checked",
        lambda root=None: {"agg_done": 6, "sql_done": 4},
    )
    got = entry._rotated_names()
    # sql_y leads (prio prefix), then fresh oracle in registration
    # order, then the rows-only fresh name, then checked stalest-first
    assert got == ["sql_y", "agg_x", "knn_z", "plain_w",
                   "sql_done", "agg_done"]


def test_rotation_post_exhaustion_freshness_flip(monkeypatch):
    """Exhaustion phase: every name has driver evidence, so the order
    flips to oldest-LATEST-round first with registration-order
    tiebreak; a re-check moves that name to the BACK; a newly
    registered query still jumps the whole queue."""
    names = ["q_a", "q_b", "q_c", "q_d"]
    monkeypatch.setattr(entry, "QUERIES", _fake_queries(names))
    monkeypatch.setattr(
        entry, "ORACLES", {n: "SELECT 1" for n in names}
    )
    seen = {"q_a": 5, "q_b": 3, "q_c": 3, "q_d": 7}
    monkeypatch.setattr(
        entry, "_driver_checked", lambda root=None: dict(seen)
    )
    assert entry._rotated_names() == ["q_b", "q_c", "q_a", "q_d"], (
        "stalest evidence first; ties break on registration order"
    )
    # the driver re-checks q_b in round 8: its evidence is now the
    # newest, so it must fall to the back of the freshness queue
    seen["q_b"] = 8
    assert entry._rotated_names() == ["q_c", "q_a", "q_d", "q_b"]
    # a brand-new query registered later jumps everything
    monkeypatch.setattr(
        entry, "QUERIES", _fake_queries(names + ["q_new"])
    )
    monkeypatch.setattr(
        entry, "ORACLES", {n: "SELECT 1" for n in names + ["q_new"]}
    )
    assert entry._rotated_names()[0] == "q_new"


def test_rotation_live_registry_orders_never_checked_first():
    """Against the REAL registry + CORRECTNESS files: every name the
    rotation fronts ahead of a driver-checked name must itself be
    never-checked (no stale name may shadow the coverage window until
    exhaustion)."""
    seen = entry._driver_checked()
    order = entry._rotated_names()
    fresh = [n for n in order if n not in seen]
    if fresh:  # pre-exhaustion: all fresh names precede all checked
        k = len(fresh)
        assert all(n not in seen for n in order[:k])
        assert all(n in seen for n in order[k:])
