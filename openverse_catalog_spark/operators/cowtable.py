"""Manifest-based copy-on-write parquet table: the ACID-shaped canonical
table with file-skipping MERGE, snapshot isolation and time travel.

The reference keeps its canonical media table in Postgres and upserts
with ``INSERT ... ON CONFLICT`` under unique indexes
(``catalog/dags/common/loader/sql.py:264-332``,
``docker/local_postgres/0003_openledger_image_schema.sql:46-54``). At
100 TB that table is a lake-format table (Delta/Iceberg); neither is in
this environment, so this module implements the minimal version of the
same contract from parquet + JSON manifests only:

  <root>/data/v<N>/part-*.parquet   immutable data files (copy-on-write)
  <root>/manifests/v<N>.json        file list + per-file key-range stats
  <root>/VERSION                    current-version pointer, atomic swap

MERGE semantics are exactly ``merge_upsert`` / ``merge_upsert_pruned``
(url dedupe, cross-partition url-conflict guard against the FULL table,
per-column upsert strategies), but the physical work is bounded by FILE
SKIPPING: data files are range-clustered on the merge key at write time,
each manifest entry carries the file's (min, max) composite-key range,
and a merge rewrites only the files whose range intersects the batch —
every other file is carried into the new snapshot by reference, never
read. Readers pin a manifest version, so they see either the old or the
new snapshot, never a mix; historical versions stay readable until
``vacuum``.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openverse_catalog_spark.operators.merge import (
    DEFAULT_MERGE_KEYS,
    distinct_on,
    merge_upsert,
    url_conflict_filter,
)
from openverse_catalog_spark.schemas.columns import ColumnSpec, spark_schema


def _file_stats(
    spark: SparkSession, dir_path: str, keys: tuple[str, ...], rel_dir: str
) -> list[dict]:
    """One column-pruned scan over a data directory -> per-file manifest
    entries (row count + min/max of each merge key). ``rel_dir`` is the
    directory's path relative to the table root (e.g. ``data/v3``) —
    manifest paths are built from it plus the file's basename, so a
    table root that itself contains a ``/data/`` segment cannot corrupt
    them."""
    df = spark.read.parquet(dir_path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for k in keys:
        aggs += [F.min(k).alias(f"min_{k}"), F.max(k).alias(f"max_{k}")]
    rows = (
        df.groupBy(F.input_file_name().alias("__file"))
        .agg(*aggs)
        .collect()
    )
    entries = []
    for r in rows:
        basename = r["__file"].rstrip("/").rsplit("/", 1)[-1]
        entries.append(
            {
                "path": f"{rel_dir}/{basename}",
                "rows": r["rows"],
                "min": {k: r[f"min_{k}"] for k in keys},
                "max": {k: r[f"max_{k}"] for k in keys},
            }
        )
    return sorted(entries, key=lambda e: e["path"])


class CowTable:
    """Handle on a copy-on-write table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str, keys: tuple[str, ...] = DEFAULT_MERGE_KEYS):
        self.spark = spark
        self.root = root.rstrip("/")
        self.keys = tuple(keys)

    # -- bootstrap ----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        df: DataFrame,
        keys: tuple[str, ...] = DEFAULT_MERGE_KEYS,
        target_files: int = 8,
    ) -> "CowTable":
        """Initialize version 1: range-cluster the data on the merge key
        (so per-file key ranges are tight and file skipping bites) and
        write the first manifest."""
        t = cls(spark, root, keys)
        os.makedirs(f"{t.root}/manifests", exist_ok=True)
        entries: list[dict] = []
        if df.head(1):
            data_dir = f"{t.root}/data/v1"
            df.repartitionByRange(target_files, *[F.col(k) for k in keys]).write.mode(
                "error"
            ).parquet(data_dir)
            entries = _file_stats(spark, data_dir, t.keys, "data/v1")
        # an EMPTY create initializes a zero-file snapshot (the schema in
        # the manifest keeps it readable) — the streaming-ingest path
        # starts from this and lets micro-batch merges populate it
        t._commit(1, entries, op="create", schema_json=df.schema.json())
        return t

    # -- manifest plumbing --------------------------------------------------

    @property
    def version(self) -> int:
        with open(f"{self.root}/VERSION") as f:
            return int(f.read().strip())

    def _manifest(self, version: int | None = None) -> dict:
        v = self.version if version is None else version
        with open(f"{self.root}/manifests/v{v}.json") as f:
            return json.load(f)

    def _commit(
        self, version: int, entries: list[dict], op: str, schema_json: str | None = None
    ) -> None:
        if schema_json is None:
            schema_json = self._manifest().get("schema")
        manifest = {
            "version": version,
            "operation": op,
            "keys": list(self.keys),
            "schema": schema_json,
            "files": entries,
            "rows": sum(e["rows"] for e in entries),
        }
        mpath = f"{self.root}/manifests/v{version}.json"
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
        # atomic pointer swap: readers see v_old or v_new, never a mix
        tmp = f"{self.root}/.VERSION.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, f"{self.root}/VERSION")

    def history(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(f"{self.root}/manifests")):
            with open(f"{self.root}/manifests/{name}") as f:
                m = json.load(f)
            out.append({k: m[k] for k in ("version", "operation", "rows")})
        return sorted(out, key=lambda m: m["version"])

    # -- reads --------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read (time travel with ``version``): exactly the files
        the manifest lists, nothing else. A zero-file snapshot reads as
        an empty frame with the manifest's recorded schema."""
        m = self._manifest(version)
        paths = [f"{self.root}/{e['path']}" for e in m["files"]]
        if not paths:
            from pyspark.sql import types as T

            return self.spark.createDataFrame(
                [], T.StructType.fromJson(json.loads(m["schema"]))
            )
        return self.spark.read.parquet(*paths)

    # -- merge --------------------------------------------------------------

    @staticmethod
    def _lex(*vals) -> tuple:
        """NULL-safe lexicographic tuple: None sorts first (Spark's
        min/max skip NULLs, but a file or batch of all-NULL key values
        yields None stats — treat those conservatively)."""
        return tuple((v is not None, v) for v in vals)

    def _affected_split(self, m: dict, source: DataFrame) -> tuple[list[dict], list[dict]]:
        """File skipping: a data file must be rewritten only if its
        composite-key range intersects one of the batch's per-partition
        key boxes. The batch summary is a tiny driver-side collect (one
        row per distinct value of keys[0] — providers, in the reference's
        schema). Works for any key count >= 1: with one key the box is
        the key value itself."""
        k0, rest = self.keys[0], list(self.keys[1:])
        if rest:
            aggs = [F.min(rest[0]).alias("lo"), F.max(rest[0]).alias("hi")]
        else:
            aggs = [F.min(k0).alias("lo"), F.max(k0).alias("hi")]
        boxes = [
            (r[k0], r["lo"], r["hi"])
            for r in source.groupBy(k0).agg(*aggs).collect()
        ]
        affected, untouched = [], []
        for e in m["files"]:
            if rest:
                lo = self._lex(e["min"][k0], e["min"][rest[0]])
                hi = self._lex(e["max"][k0], e["max"][rest[0]])
                hit = any(
                    lo <= self._lex(p, fhi) and self._lex(p, flo) <= hi
                    for p, flo, fhi in boxes
                )
            else:
                lo, hi = self._lex(e["min"][k0]), self._lex(e["max"][k0])
                hit = any(
                    lo <= self._lex(fhi) and self._lex(flo) <= hi
                    for _, flo, fhi in boxes
                )
            (affected if hit else untouched).append(e)
        return affected, untouched

    def merge(
        self,
        source: DataFrame,
        columns: list[ColumnSpec],
        target_files: int = 4,
        **kwargs,
    ) -> dict:
        """MERGE the batch into a new snapshot. Untouched files carry over
        by reference; affected files + the batch run the standard
        ``merge_upsert`` and are rewritten range-clustered. Returns the
        commit summary {version, files_rewritten, files_skipped, rows}.

        Source preprocessing (url dedupe + cross-partition url-conflict
        guard) runs against the FULL current snapshot projected to
        (url, keys) — a narrow column scan over all files, matching
        merge_upsert_pruned's correctness argument: skipping never
        changes results because rows of non-intersecting files can only
        classify as 'kept', and the url guard never rewrites target rows.
        """
        m = self._manifest()
        keys = self.keys
        if not source.head(1):
            # empty batch: nothing to rewrite, no new version (the
            # reference's loader likewise skips the upsert on an empty
            # load) — keeps parquet-write-of-zero-partitions out of the
            # stats scan
            return {
                "version": m["version"],
                "files_rewritten": 0,
                "files_skipped": len(m["files"]),
                "files_written": 0,
                "rows": m["rows"],
            }
        if kwargs.pop("dedupe_source_on_url", True) and "url" in source.columns:
            source = distinct_on(source, ["url"], [F.col(k) for k in keys])
        if kwargs.pop("guard_url_conflicts", True) and "url" in source.columns:
            source = url_conflict_filter(source, self.read(), keys)
        source = source.localCheckpoint(eager=False)

        affected, untouched = self._affected_split(m, source)
        if kwargs.get("validate_unique"):
            # uniqueness repair must see the whole table (a url dup can
            # span a file the batch never touches) — disable skipping
            # for this commit and rewrite every file enforced
            affected, untouched = affected + untouched, []
        if affected:
            target_slice = self.spark.read.parquet(
                *[f"{self.root}/{e['path']}" for e in affected]
            )
        else:
            target_slice = self.spark.createDataFrame([], spark_schema(columns))
        merged = merge_upsert(
            target_slice,
            source,
            columns,
            keys=keys,
            dedupe_source_on_url=False,
            guard_url_conflicts=False,
            **kwargs,
        )

        new_version = m["version"] + 1
        data_dir = f"{self.root}/data/v{new_version}"
        merged.repartitionByRange(
            target_files, *[F.col(k) for k in keys]
        ).write.mode("error").parquet(data_dir)
        new_entries = _file_stats(
            self.spark, data_dir, keys, f"data/v{new_version}"
        )
        self._commit(new_version, untouched + new_entries, op="merge")
        return {
            "version": new_version,
            "files_rewritten": len(affected),
            "files_skipped": len(untouched),
            "files_written": len(new_entries),
            "rows": sum(e["rows"] for e in untouched + new_entries),
        }

    # -- maintenance --------------------------------------------------------

    def compact(self, target_rows: int = 1_000_000) -> dict:
        """OPTIMIZE: bin-pack small files (rows < target_rows) into
        range-clustered files near target size; files already at size
        carry into the new snapshot by reference. A metadata-plus-
        rewrite-of-small-files commit — the data is bit-identical, so
        readers pinned to the old version and readers of the new one see
        the same rows. Counters the small-file accumulation every
        streaming/merge ingest path produces (each micro-batch MERGE
        writes its own files; scan cost grows with file count, not
        bytes). Returns {version, files_compacted, files_kept,
        files_written, rows}; no new version if <2 small files exist.
        """
        m = self._manifest()
        small = [e for e in m["files"] if e["rows"] < target_rows]
        keep = [e for e in m["files"] if e["rows"] >= target_rows]
        if len(small) < 2:
            return {
                "version": m["version"],
                "files_compacted": 0,
                "files_kept": len(m["files"]),
                "files_written": 0,
                "rows": m["rows"],
            }
        small_rows = sum(e["rows"] for e in small)
        n_files = max(1, -(-small_rows // target_rows))
        df = self.spark.read.parquet(*[f"{self.root}/{e['path']}" for e in small])
        new_version = m["version"] + 1
        data_dir = f"{self.root}/data/v{new_version}"
        df.repartitionByRange(
            n_files, *[F.col(k) for k in self.keys]
        ).write.mode("error").parquet(data_dir)
        new_entries = _file_stats(
            self.spark, data_dir, self.keys, f"data/v{new_version}"
        )
        self._commit(new_version, keep + new_entries, op="compact")
        return {
            "version": new_version,
            "files_compacted": len(small),
            "files_kept": len(keep),
            "files_written": len(new_entries),
            "rows": sum(e["rows"] for e in keep + new_entries),
        }

    def restore(self, version: int) -> dict:
        """ROLLBACK: commit a NEW version whose file list is the target
        version's — a metadata-only operation (no data file is read or
        written, the commit is one manifest JSON), so restoring a
        100 TB table after a bad merge is instant. History stays linear
        and append-only: the bad version remains inspectable until
        vacuum, and the restore itself is a recorded operation."""
        m = self._manifest(version)
        new_version = self.version + 1
        self._commit(
            new_version, m["files"], op=f"restore(v{version})",
            schema_json=m.get("schema"),
        )
        return {
            "version": new_version,
            "restored_from": version,
            "files": len(m["files"]),
            "rows": m["rows"],
        }

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Drop manifests older than the newest ``keep_versions`` and
        delete data files no surviving manifest references. Returns the
        deleted file paths."""
        current = self.version
        keep = {current - i for i in range(keep_versions)}
        live: set[str] = set()
        drop_manifests = []
        for name in os.listdir(f"{self.root}/manifests"):
            v = int(name.removeprefix("v").removesuffix(".json"))
            if v in keep:
                with open(f"{self.root}/manifests/{name}") as f:
                    live.update(e["path"] for e in json.load(f)["files"])
            else:
                drop_manifests.append(name)
        deleted = []
        for dirpath, _, files in os.walk(f"{self.root}/data"):
            for fn in files:
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, self.root)
                if fn.endswith(".parquet") and rel not in live:
                    os.remove(full)
                    deleted.append(rel)
        for name in drop_manifests:
            os.remove(f"{self.root}/manifests/{name}")
        return sorted(deleted)
