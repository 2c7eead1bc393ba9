"""SQL facade: run the engine through plain SQL text.

The reference's users speak SQL — its popularity logic, provider load
scripts and maintenance jobs are SQL files executed against Postgres
(``catalog/dags/common/popularity/sql.py``, every
``provider_csv_load_script``). This engine's surface is the Python
DataFrame API; the facade closes the gap by registering lake tables and
frames as Spark temp views and executing query TEXT against them, with
the two lake-only constructs SQL has no ANSI spelling for rewritten
inline:

  ``<table> VERSION AS OF <n>``        time-travel snapshot read
  ``<table> TIMESTAMP AS OF <epoch>``  newest commit at/before the time
  ``TABLE_CHANGES('<table>', a[, b])`` the change data feed (Delta's
                                       table_changes table function)

Each construct resolves to a dedicated temp view over the CowTable's
manifest-pinned read (``read(version=...)`` / ``read_changes``), so the
rewritten query is ordinary Spark SQL and Catalyst plans it like any
other — pruning, pushdown and join strategy included. Registered head
views re-resolve to the table's CURRENT version on every ``sql()``
call (a version check per table, metadata-only), so a facade session
always queries the latest committed snapshot without re-registration.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from openverse_catalog_spark.operators.cowtable import CowTable

_VERSION_AS_OF = re.compile(
    r"\b(\w+)\s+VERSION\s+AS\s+OF\s+(\d+)", re.IGNORECASE
)
_TIMESTAMP_AS_OF = re.compile(
    r"\b(\w+)\s+TIMESTAMP\s+AS\s+OF\s+([0-9]+(?:\.[0-9]+)?)", re.IGNORECASE
)
_TABLE_CHANGES = re.compile(
    r"\bTABLE_CHANGES\s*\(\s*'(\w+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)",
    re.IGNORECASE,
)


class SqlFacade:
    """Name registry + SQL runner for frames and CoW lake tables."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, CowTable] = {}
        self._head_version: dict[str, int] = {}

    # -- registration --------------------------------------------------------

    def register_df(self, name: str, df: DataFrame) -> None:
        """Expose a static frame (a parquet load, a dim) as a view."""
        df.createOrReplaceTempView(name)

    def register_table(self, name: str, table: CowTable) -> None:
        """Expose a CoW lake table: ``name`` always reads the CURRENT
        snapshot (re-resolved per query), and the time-travel / CDF
        constructs above work against it."""
        self._tables[name] = table
        self._refresh_head(name)

    def _refresh_head(self, name: str) -> None:
        t = self._tables[name]
        v = t.version
        if self._head_version.get(name) != v:
            t.read(version=v).createOrReplaceTempView(name)
            self._head_version[name] = v

    # -- execution -----------------------------------------------------------

    def _rewrite(self, text: str) -> str:
        """Resolve lake-only constructs to temp views; everything else
        is untouched Spark SQL."""

        def need(name: str) -> CowTable:
            if name not in self._tables:
                raise ValueError(
                    f"{name!r} is not a registered lake table "
                    f"(have: {sorted(self._tables)}); time travel and "
                    "TABLE_CHANGES need register_table()"
                )
            return self._tables[name]

        def version_of(match: re.Match) -> str:
            name, v = match.group(1), int(match.group(2))
            view = f"{name}__v{v}"
            need(name).read(version=v).createOrReplaceTempView(view)
            return view

        def timestamp_of(match: re.Match) -> str:
            name, ts = match.group(1), float(match.group(2))
            t = need(name)
            v = t.version_as_of(ts)
            view = f"{name}__v{v}"
            t.read(version=v).createOrReplaceTempView(view)
            return view

        def changes_of(match: re.Match) -> str:
            name = match.group(1)
            lo = int(match.group(2))
            hi = int(match.group(3)) if match.group(3) else None
            t = need(name)
            hi_v = t.version if hi is None else hi
            view = f"{name}__changes_{lo}_{hi_v}"
            t.read_changes(lo, hi).createOrReplaceTempView(view)
            return view

        text = _TABLE_CHANGES.sub(changes_of, text)
        text = _VERSION_AS_OF.sub(version_of, text)
        text = _TIMESTAMP_AS_OF.sub(timestamp_of, text)
        return text

    def sql(self, text: str) -> DataFrame:
        """Run SQL text: refresh head views, rewrite lake constructs,
        hand the rest to Catalyst."""
        for name in self._tables:
            self._refresh_head(name)
        return self.spark.sql(self._rewrite(text))
