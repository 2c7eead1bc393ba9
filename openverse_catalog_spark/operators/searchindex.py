"""Incrementally-maintained inverted index: the Spark-native stand-in
for the reference's Elasticsearch handoff.

The reference rebuilds its search index by re-shipping whole tables to
an external indexer per data refresh (data_refresh_task_factory.py:
183-240 — REINDEX then alias swap). This module keeps the index INSIDE
the lakehouse and maintains it from the base table's CHANGE FEED, so an
index refresh costs O(changed documents), never O(corpus):

* ``postings`` — a CoW lake table keyed ``(term, doc_id)`` holding per-
  document term frequencies. Merge-key range clustering means posting
  files are term-ordered, so a query's ``read_pruned(terms)`` opens
  only the files whose term range can contain a query term — the same
  file-skipping dividend every other keyed read in the engine gets.
* ``doclen`` — a CoW table keyed ``doc_id`` with each document's token
  count (the BM25 length normalizer); corpus totals (N, avgdl) derive
  from it at query time with one thin-table aggregate.
* a ``state.json`` recording the base version the index reflects.

``refresh()`` reads the base's CDF span since the applied version and
reduces it to a NET per-document transition: the index currently holds
each dirty document's state at the applied version (= the span's FIRST
pre-image, or nothing for docs born inside the span), and must end at
the span's FINAL post-image (or nothing after a trailing delete). Old
and new postings are both tokenized from feed row images — the index
itself is never scanned to find what to remove — and reconciled in ONE
``merge_when`` commit per table (matched+gone -> DELETE, matched ->
UPDATE tf, unmatched+new -> INSERT). A crash between the table commits
and the state write is safe: replaying the span recomputes the same
net transition and the keyed merges converge to the identical state.

Tokenization matches plans/search_queries.py (lowercase, [a-z]+ runs of
length >= 3) so index-served BM25 is oracle-comparable against a full
corpus scan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openverse_catalog_spark.operators.cowtable import CowTable

K1 = 1.2
B = 0.75


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), "[^a-z]+"), lambda x: F.length(x) >= 3
    )


def _postings_of(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf) rows for a frame of documents."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))


def _doclens_of(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, dl) for docs with >= 1 qualifying token. Token-less and
    NULL-text docs are EXCLUDED (size() of a null array is -1 with ANSI
    off): BM25's N and avgdl count indexed documents only, matching the
    full-scan definition where such docs never produce a dl row."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(F.col(text_col))).alias("dl"),
    ).filter(F.col("dl") > 0)


class SearchIndex:
    """Inverted index over a documents CowTable, CDF-maintained."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        base: CowTable,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.spark = spark
        self.root = root.rstrip("/")
        self.base = base
        self.id_col = id_col
        self.text_col = text_col
        self.postings = CowTable(
            spark, f"{self.root}/postings", keys=("term", "doc_id")
        )
        self.doclen = CowTable(
            spark, f"{self.root}/doclen", keys=("doc_id",)
        )

    # -- construction ---------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        base: CowTable,
        id_col: str = "doc_id",
        text_col: str = "text",
        target_files: int = 8,
        version: int | None = None,
    ) -> "SearchIndex":
        """Build the index from a base snapshot (pin the version FIRST
        so a concurrent base write between the two scans cannot tear
        the build). ``version`` overrides the raw head — a catalog-
        managed base must pass its PINNED version, or the index would
        tokenize an unpublished (possibly aborted) head no catalog
        reader sees."""
        idx = cls(spark, root, base, id_col, text_col)
        v = base.version if version is None else int(version)
        snap = base.read(v)
        CowTable.create(
            spark, idx.postings.root,
            _postings_of(snap, id_col, text_col),
            keys=("term", "doc_id"), target_files=target_files,
        )
        CowTable.create(
            spark, idx.doclen.root,
            _doclens_of(snap, id_col, text_col),
            keys=("doc_id",), target_files=max(2, target_files // 2),
        )
        idx._write_state(v)
        return idx

    @classmethod
    def open(
        cls,
        spark: SparkSession,
        root: str,
        base: CowTable,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "SearchIndex":
        """Attach an EXISTING persisted index (a new session resuming
        O(churn) maintenance — the whole point of persisting it).
        Validates the root holds one AND that it was built from THIS
        base table and these columns — binding a persisted index to a
        different table or column would serve wrong results and then
        corrupt the index at the first refresh."""
        idx = cls(spark, root, base, id_col, text_col)
        if not os.path.exists(f"{idx.root}/state.json"):
            raise ValueError(
                f"{root!r} holds no search index (no state.json); "
                "build one with SearchIndex.create"
            )
        st = idx._state()
        want = {
            "base_root": os.path.realpath(base.root),
            "id_col": id_col,
            "text_col": text_col,
        }
        got = {
            "base_root": (
                os.path.realpath(st["base_root"])
                if st.get("base_root") is not None else None
            ),
            "id_col": st.get("id_col"),
            "text_col": st.get("text_col"),
        }
        if any(v is None for v in got.values()):
            # a pre-metadata state file: nothing to verify against; the
            # next _write_state backfills the identity keys
            return idx
        if got != want:
            raise ValueError(
                f"search index at {root!r} was built over {got}, not "
                f"{want}; attach it to the table/columns it indexes"
            )
        return idx

    # -- state ------------------------------------------------------------

    @property
    def applied_version(self) -> int:
        return int(self._state()["applied"])

    def _state(self) -> dict:
        with open(f"{self.root}/state.json") as fh:
            return json.load(fh)

    def _write_state(self, applied: int, pending: int | None = None) -> None:
        # identity metadata rides along so open() can verify an ATTACH
        # binds the index to the table/columns it was built from
        st = {
            "applied": int(applied),
            "base_root": self.base.root,
            "id_col": self.id_col,
            "text_col": self.text_col,
        }
        if pending is not None:
            st["pending"] = int(pending)
        tmp = f"{self.root}/.tmp.state.json"
        with open(tmp, "w") as fh:
            json.dump(st, fh)
        os.replace(tmp, f"{self.root}/state.json")

    # -- maintenance --------------------------------------------------------

    def refresh(self, to_version: int | None = None) -> dict:
        """Advance the index to the base's current version (or the
        given ``to_version`` — a catalog-managed base passes its PINNED
        version so unpublished/aborted heads never leak into query
        results) from the change feed. O(changed docs): the feed is the manifest diff,
        old postings come from feed PRE-IMAGES (never an index scan),
        and the reconciling merges file-skip on their key ranges.

        CRASH SAFETY is the matview pending-WAL protocol: the span
        [applied, head] is recorded in state.json BEFORE any merge, and
        both merges carry a txn fence keyed on the span's end version.
        A crash at any point replays exactly the PENDING span on the
        next refresh — already-landed merges txn-skip, lost ones apply
        — so the netting baseline ("old = what the index holds") can
        never drift even if the base advanced in the meantime: new
        commits wait in a fresh span behind the pending one.

        A base vacuumed past the unapplied span (the consumer fell
        behind CDF retention) triggers a FULL RESYNC against the
        current snapshot, then the feed resumes from there — the same
        protocol the incremental MVs follow."""
        st = self._state()
        applied = int(st["applied"])
        replayed = False
        if "pending" in st:
            # finish (or redo) the torn span before anything newer.
            # ONLY the feed read is guarded: a vacuumed pending span
            # (including one torn by a crash DURING a resync) skips the
            # replay and falls through — the main span below is a
            # superset, so its feed read raises the same way and the
            # single resync path handles it. Merge-side errors
            # (constraints, config) propagate — they are not retention
            # misses and must never be papered over by a rebuild.
            pend = int(st["pending"])
            if to_version is not None and pend > int(to_version):
                # a recorded span past the caller's cap means the index
                # was advanced OUTSIDE this discipline (e.g. a raw-API
                # refresh of a catalog-managed base, whose head can
                # carry unpublished versions); the span end is fixed by
                # its txn fence, so it cannot be partially applied —
                # refuse loudly instead of replaying data the cap
                # exists to exclude
                raise ValueError(
                    f"pending span ends at v{pend}, past the requested "
                    f"cap v{int(to_version)}; the index was refreshed "
                    "outside the cap's discipline — rebuild it, or "
                    "finish with an uncapped refresh() ONLY if every "
                    "version in the span is published"
                )
            feed = self._try_feed(applied, pend)
            if feed is not None:
                self._apply_feed(feed, pend)
                self._write_state(pend)
                applied = pend
                replayed = True
        head = self.base.version if to_version is None else int(to_version)
        if to_version is not None and applied > int(to_version):
            # the COMPLETED twin of the pending-past-cap case: an
            # uncapped refresh already consumed versions the cap
            # excludes (possibly aborted ones no catalog reader sees).
            # Returning quietly would serve them indefinitely
            raise ValueError(
                f"index already applied v{applied}, past the requested "
                f"cap v{int(to_version)}; it was refreshed outside the "
                "cap's discipline — rebuild it (or re-create from the "
                "capped snapshot) to restore pinned reads"
            )
        if head <= applied:
            return {"applied": applied, "refreshed": replayed}
        self._write_state(applied, pending=head)
        feed = self._try_feed(applied, head)
        if feed is not None:
            self._apply_feed(feed, head)
        else:
            # feed span vacuumed away (the consumer fell behind CDF
            # retention): resync from the snapshot the head pins, then
            # resume incrementally from there
            self._full_resync(head)
        self._write_state(head)
        out = {"applied": head, "refreshed": True, "from": applied}
        if feed is None:
            # an O(corpus) rebuild, not an O(churn) feed apply — the
            # caller's monitoring must be able to tell
            out["resync"] = True
        return out

    def _try_feed(self, from_v: int, to_v: int):
        """The base's change feed for the span, or None if retention
        already dropped part of it (read_changes resolves the span's
        manifests eagerly, so the miss surfaces HERE, never from the
        downstream merges)."""
        try:
            return self.base.read_changes(from_v, to_v)
        except ValueError:
            return None

    def _apply_feed(self, feed: DataFrame, to_v: int) -> None:
        idc, txc = self.id_col, self.text_col

        # net transition per dirty doc over the span:
        #   old = the FIRST pre-image (the state the index holds);
        #   new = the LAST post-state, unless the final event deletes.
        pre = feed.filter(
            F.col("_change_type").isin("update_preimage", "delete")
        )
        w_first = F.row_number().over(
            Window.partitionBy(idc).orderBy("_commit_version")
        )
        old_docs = (
            pre.withColumn("__rn", w_first).filter(F.col("__rn") == 1)
            .select(idc, txc)
            .localCheckpoint(eager=False)  # feeds postings AND doclen
        )
        post = feed.filter(
            F.col("_change_type").isin(
                "insert", "update_postimage", "delete"
            )
        )
        w_last = F.row_number().over(
            Window.partitionBy(idc).orderBy(F.desc("_commit_version"))
        )
        new_docs = (
            post.withColumn("__rn", w_last).filter(
                (F.col("__rn") == 1)
                & (F.col("_change_type") != "delete")
            ).select(idc, txc)
            .localCheckpoint(eager=False)
        )
        old_p = _postings_of(old_docs, idc, txc)
        new_p = _postings_of(new_docs, idc, txc)
        new_l = _doclens_of(new_docs, idc, txc)
        self._reconcile(old_docs.select(F.col(idc).alias("doc_id")),
                        old_p, new_p, new_l, to_v)

    def _reconcile(
        self,
        old_ids: DataFrame,
        old_p: DataFrame,
        new_p: DataFrame,
        new_l: DataFrame,
        to_v: int,
    ) -> None:
        """One merge_when per index table, txn-fenced on the span end so
        a replayed span txn-skips instead of double-applying."""
        src = (
            new_p.withColumnRenamed("tf", "new_tf")
            .join(old_p.select("term", "doc_id"), ["term", "doc_id"],
                  "full")
            .select("term", "doc_id", F.col("new_tf").alias("tf"))
        )
        self.postings.merge_when(
            src,
            update_set={"tf": "s.tf"},
            delete_cond="s.tf IS NULL",
            insert=True,
            insert_cond="s.tf IS NOT NULL",
            check_duplicate_keys=False,  # key-unique by construction
            txn_app="searchindex-postings",
            txn_version=to_v,
        )
        lsrc = (
            old_ids
            .join(new_l.withColumnRenamed("dl", "new_dl"),
                  ["doc_id"], "full")
            .select("doc_id", F.col("new_dl").alias("dl"))
        )
        self.doclen.merge_when(
            lsrc,
            update_set={"dl": "s.dl"},
            delete_cond="s.dl IS NULL",
            insert=True,
            insert_cond="s.dl IS NOT NULL",
            check_duplicate_keys=False,
            txn_app="searchindex-doclen",
            txn_version=to_v,
        )

    def _full_resync(self, to_v: int) -> None:
        """Rebuild the index CONTENT from the base snapshot at ``to_v``
        through the same reconcile merges (old = everything currently
        indexed — the one case that legitimately scans the index)."""
        snap = self.base.read(to_v)
        self._reconcile(
            self.doclen.read().select("doc_id"),
            self.postings.read().select("term", "doc_id"),
            _postings_of(snap, self.id_col, self.text_col),
            _doclens_of(snap, self.id_col, self.text_col),
            to_v,
        )

    # -- query --------------------------------------------------------------

    def bm25(self, terms: list[str], k: int) -> DataFrame:
        """Top-k BM25 served FROM THE INDEX: the corpus is never
        tokenized at query time. Postings files are pruned by the term
        key range; doc-frequency and idf derive from the pruned
        postings; (N, avgdl) is one aggregate over the thin doclen
        table; the final top-k is TakeOrdered."""
        # read_pruned appends the exact residual isin itself — the
        # pruned read is already filtered, not just file-skipped
        post = self.postings.read_pruned(list(terms))
        dl = self.doclen.read()
        stats = dl.agg(
            F.count("*").alias("n"), F.avg("dl").alias("avgdl")
        )
        idf = (
            post.groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"))
            .crossJoin(F.broadcast(stats.select("n")))
            .select(
                "term",
                F.log(
                    1.0 + (F.col("n") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                ).alias("idf"),
            )
        )
        scored = (
            post.join(F.broadcast(idf), "term")
            .join(dl, "doc_id")
            .crossJoin(F.broadcast(stats.select("avgdl")))
            .select(
                "doc_id",
                (
                    F.col("idf") * F.col("tf") * (K1 + 1.0)
                    / (
                        F.col("tf")
                        + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))
                    )
                ).alias("term_score"),
            )
            .groupBy("doc_id")
            .agg(F.round(F.sum("term_score"), 6).alias("score"))
        )
        return scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
