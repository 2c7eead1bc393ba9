"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship 5-way-join enrichment at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data operators) as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` provides the DuckDB twin for each SQL-expressible one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing the plan modules populates the registry.
from openverse_catalog_spark.plans import analytics as _analytics  # noqa: F401
from openverse_catalog_spark.plans import merge_queries as _merge  # noqa: F401
from openverse_catalog_spark.plans import corpus_queries as _corpus  # noqa: F401
from openverse_catalog_spark.plans import stream_queries as _stream  # noqa: F401
from openverse_catalog_spark.plans import clean_queries as _clean  # noqa: F401
from openverse_catalog_spark.plans import sampling_queries as _sampling  # noqa: F401
from openverse_catalog_spark.plans import packing_queries as _packing  # noqa: F401
from openverse_catalog_spark.plans import sketch_queries as _sketches  # noqa: F401
from openverse_catalog_spark.plans import quality_queries as _quality  # noqa: F401
from openverse_catalog_spark.plans import layout_queries as _layout  # noqa: F401
from openverse_catalog_spark.plans import graph_queries as _graph  # noqa: F401
from openverse_catalog_spark.plans import window_queries as _window  # noqa: F401
from openverse_catalog_spark.plans import search_queries as _search  # noqa: F401
from openverse_catalog_spark.plans import subquery_queries as _subquery  # noqa: F401
from openverse_catalog_spark.plans import clustering_queries as _clustering  # noqa: F401
from openverse_catalog_spark.plans import sql_queries as _sql  # noqa: F401
from openverse_catalog_spark.plans import matview_queries as _matview  # noqa: F401
from openverse_catalog_spark.plans.analytics import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["join_5way_enrich"](spark, "/root/testdata/sf0.001")


def _driver_checked(root: str | None = None) -> dict[str, int]:
    """Name -> LATEST round with a driver CORRECTNESS row for it.

    Latest, not earliest: the post-exhaustion freshness rotation sorts
    checked names by this value, so a re-check must push the name to
    the BACK of the queue (its evidence is now the newest). Keyed on
    the earliest round, a re-checked name would keep its original sort
    position and the same window would re-verify forever while every
    other query's driver evidence went stale. ``root`` overrides the
    scan directory (tests); default is this file's directory."""
    import glob
    import json
    import os
    import re

    here = root or os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                names = set(json.load(fh).keys())
        except (OSError, ValueError):
            continue
        for n in names:
            if n not in seen or rnd > seen[n]:
                seen[n] = rnd
    return seen


def _rotated_names() -> list[str]:
    """Registry names ordered so never-driver-checked queries come first.

    The driver verifies only the first N registry entries per round, so
    rotating unchecked queries to the front walks the whole registry
    through the hard correctness gate across rounds.  Oracle-backed
    queries lead (rows+schema+hash check) ahead of rows-only ones;
    registration order is preserved within each bucket so the window is
    deterministic.

    POST-EXHAUSTION POLICY: once every registry name has a driver row
    (the fresh buckets are empty), the rotation flips from coverage to
    FRESHNESS — already-checked names are ordered by the round that
    LAST checked them, stalest evidence first, so each subsequent round
    re-checks the oldest rows against the current code and a re-check
    sends the name to the back of the queue. New queries added later
    still jump the queue (they land in the fresh buckets).
    """
    seen = _driver_checked()
    names = list(QUERIES)
    fresh_oracle = [n for n in names if n not in seen and n in ORACLES]
    fresh_plain = [n for n in names if n not in seen and n not in ORACLES]
    # freshness order: oldest driver evidence first (stable on
    # registration order within a round via enumerate tiebreak)
    done = sorted(
        (n for n in names if n in seen),
        key=lambda n: (seen[n], names.index(n)),
    )
    # surface the headline never-checked families (lakehouse, MV/CDC,
    # SQL facade, tokenizers, ANN, multimodal) ahead of the long tail
    prio = (
        "merge_cow_", "mv_", "sql_", "stream_cdc_", "stream_cow_",
        "corpus_unigram_", "knn_ivf_pq", "multimodal_",
    )
    # r11 note: the rotation CLOSED in r10 (269/269 cumulative driver
    # coverage; freshness floor r5), so the fresh buckets now hold only
    # queries added this round (they jump the queue) and the window is
    # otherwise filled stalest-evidence-first — r11 should re-check the
    # 19 r5-evidence names plus the oldest r6 cohort. `back` is inert
    # (every name in it has driver evidence) and kept only so a future
    # resync of DRIVER_CHECKED cannot resurface it ahead of new work
    back = {
        "sql_vector_index", "vector_index_refresh",
        "stream_vector_index_maintenance", "search_hybrid_indexed",
        "dedup_semantic_indexed", "vector_index_pq_refresh",
        "vector_index_pq_residual",
    }
    lead = [n for n in fresh_oracle
            if n.startswith(prio) and n not in back]
    tail = [n for n in fresh_oracle
            if not n.startswith(prio) and n not in back]
    newest = [n for n in fresh_oracle if n in back]
    return lead + tail + newest + fresh_plain + done


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _rotated_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {n: ORACLES[n] for n in _rotated_names() if n in ORACLES}
