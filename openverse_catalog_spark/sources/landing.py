"""Provider-API landing zone: driver-side paged fetch -> JSONL landing
files -> distributed ``spark.read.json``.

Reference: the generic ingester loop
``catalog/dags/providers/provider_api_scripts/provider_data_ingester.py:203-280``
(get_next_query_params -> HTTP GET -> get_batch_data -> per-record
transform, stop on empty batch / ingestion limit) and the rate-limited
requester ``catalog/dags/common/requester.py:31-161``.

Spark-first split: fetching is inherently sequential-per-provider and
rate-limited, so it stays on the driver (or a thin fetch tier) and ONLY
writes raw JSONL batches to a date-partitioned landing zone; all
parsing/cleaning/merging happens distributed from the landing files.
Executors never make network calls — at 1000 executors that would melt
any provider API and make retries non-deterministic.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class OverfetchError(RuntimeError):
    """API served more records than its own reported total (I4)."""


class PagedFetcher:
    """The ingester loop contract with the transport injected.

    ``fetch_fn(query_params) -> dict | None`` plays the HTTP GET;
    ``get_batch_data(response) -> list[dict] | None`` extracts records;
    ``get_next_query_params(prev) -> dict`` advances the cursor. Stops on
    empty/None batch or ``ingestion_limit`` records
    (provider_data_ingester.py:136-143, 203-280). ``min_delay`` seconds
    between requests is the politeness budget (requester.py:31-68).
    """

    def __init__(
        self,
        fetch_fn: Callable[[dict], dict | None],
        get_batch_data: Callable[[dict], list[dict] | None],
        get_next_query_params: Callable[[dict | None], dict],
        ingestion_limit: int | None = None,
        min_delay: float = 0.0,
        max_batches: int = 10_000,
        expected_count_fn: Callable[[dict], int] | None = None,
        raise_on_overfetch: bool = True,
        shared_state: dict | None = None,
        retries: int = 2,
        backoff: float = 0.0,
    ) -> None:
        self.fetch_fn = fetch_fn
        self.get_batch_data = get_batch_data
        self.get_next_query_params = get_next_query_params
        self.ingestion_limit = ingestion_limit
        self.min_delay = min_delay
        self.max_batches = max_batches
        # I4 overfetch guard (time_delineated_provider_data_ingester.py:
        # 221-259): some APIs keep serving pages past their own reported
        # total — fetching more than the stated count flags the bug
        # (raise, or log-and-continue when raise_on_overfetch=False)
        self.expected_count_fn = expected_count_fn
        self.raise_on_overfetch = raise_on_overfetch
        # transient-failure retries with exponential backoff: the
        # reference's DelayedRequester re-issues a failed/garbled
        # request before giving up (requester.py retry-on-error loop);
        # ``retries`` extra attempts, backoff * 2^attempt sleep between
        self.retries = retries
        self.backoff = backoff
        self.fetched_count = 0
        self.overfetched = False
        # shared across the sweep-loop's per-sweep fetchers so the
        # politeness window spans sweep boundaries (the reference's
        # DelayedRequester is one instance for the whole ingestion)
        self._state = shared_state if shared_state is not None else {}
        self._state.setdefault("last_request", 0.0)

    def _fetch_with_retry(self, params: dict) -> dict | None:
        """One logical request = up to 1 + retries transport attempts.
        A ``None`` return is the end-of-stream contract, never retried;
        only raised exceptions (connection/parse failures) are."""
        for attempt in range(self.retries + 1):
            try:
                return self.fetch_fn(params)
            except Exception:
                if attempt == self.retries:
                    raise
                if self.backoff > 0:
                    time.sleep(self.backoff * (2 ** attempt))
                self._state["last_request"] = time.monotonic()
        return None  # pragma: no cover - loop always returns or raises

    def batches(self) -> Iterator[list[dict]]:
        params: dict | None = None
        fetched = 0
        for _ in range(self.max_batches):
            params = self.get_next_query_params(params)
            wait = self.min_delay - (time.monotonic() - self._state["last_request"])
            if wait > 0:
                time.sleep(wait)
            self._state["last_request"] = time.monotonic()
            response = self._fetch_with_retry(params)
            if response is None:
                return
            batch = self.get_batch_data(response)
            if not batch:
                return
            if self.ingestion_limit is not None:
                batch = batch[: self.ingestion_limit - fetched]
            fetched += len(batch)
            self.fetched_count = fetched
            if self.expected_count_fn is not None:
                total = self.expected_count_fn(response)
                if total is not None and fetched > total:
                    self.overfetched = True
                    msg = (
                        f"Expected {total} records, but {fetched} have been"
                        " fetched. Consider reducing the ingestion interval."
                    )
                    if self.raise_on_overfetch:
                        raise OverfetchError(msg)
            yield batch
            if self.ingestion_limit is not None and fetched >= self.ingestion_limit:
                return


def write_landing(
    fetcher: PagedFetcher,
    landing_dir: str,
    ingest_date: str,
    provider: str,
) -> int:
    """Drain the fetcher into ``landing_dir/ingest_date=<d>/<provider>-N.jsonl``
    (one file per API batch — append-only, idempotent per (date, batch));
    returns the record count. The date directory IS the event-time
    partition Spark prunes on (SURVEY I1)."""
    part_dir = os.path.join(landing_dir, f"ingest_date={ingest_date}")
    os.makedirs(part_dir, exist_ok=True)
    n = 0
    for i, batch in enumerate(fetcher.batches()):
        path = os.path.join(part_dir, f"{provider}-{i:05d}.jsonl")
        with open(path, "w", encoding="utf-8") as f:
            for record in batch:
                f.write(json.dumps(record, ensure_ascii=False) + "\n")
        n += len(batch)
    return n


def read_json_landing(
    spark: SparkSession,
    landing_dir: str,
    schema: str | None = None,
) -> DataFrame:
    """Distributed read of the landing zone. With an explicit schema the
    scan avoids the inference pass AND gets a corrupt-record column
    (PERMISSIVE), mirroring the tolerant TSV path; ``ingest_date`` comes
    in as a partition column for free pruning."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt"
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(landing_dir)
    if "_corrupt" in df.columns:
        df = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    return df


def reingestion_day_shifts(tiers: list[tuple[int, int]]) -> list[list[int]]:
    """Tiered re-ingestion day-shift lists (SURVEY I3): ``tiers`` is
    ``[(day_step, repeats), ...]`` — daily/weekly/monthly/... levels; the
    i-th output list counts by ``step_i`` starting where the previous
    tier left off (reference ``common/helpers.py:
    get_partitioned_reingestion_days``; tier configs
    ``provider_reingestion_workflows.py:58-115``, e.g. Flickr's
    (1,7)(7,12)(15,20)(30,24)(90,24)(180,40) = 127 shifted days + day 0).
    Each returned day-shift feeds one dated re-MERGE run — the
    idempotent-upsert form of late-data handling."""
    tiers = [t for t in tiers if t[1] != 0]
    out = []
    base = 0
    for step, repeats in tiers:
        out.append([base + step * (j + 1) for j in range(repeats)])
        base += step * repeats
    return out


def reingestion_dates(logical_date: str, tiers: list[tuple[int, int]]) -> list[list[str]]:
    """The day-shift lists resolved to ISO dates relative to
    ``logical_date`` (provider_dag_factory.py:420-445's example
    semantics), day 0 prepended as the first level."""
    from datetime import date, timedelta

    d0 = date.fromisoformat(logical_date)
    shifts = [[0]] + reingestion_day_shifts(tiers)
    return [[(d0 - timedelta(days=s)).isoformat() for s in level] for level in shifts]


def hash_prefix_partitions(prefix_length: int = 2) -> list[str]:
    """Input-split planning by id-hash prefix (reference
    ``smithsonian.py:232-236, 414-418``): the fetch space partitions into
    16^n slices ('00'..'ff' for n=2), each an independent query the
    driver can fan out — the API-side analog of Spark's input splits.
    Uniform by construction (md5 prefixes), so the fan-out is skew-free
    regardless of how record ids cluster."""
    return [format(h, f"0{prefix_length}x") for h in range(16 ** prefix_length)]


def adaptive_time_slices(
    date: str,
    count_fn,
    max_records: int = 3000,
    min_divisions: int = 4,
    max_divisions: int = 12,
    division_threshold: int = 10_000,
) -> list[tuple[str, str]]:
    """Adaptive time-slicing for skewed fetch days (SURVEY I2; reference
    ``time_delineated_provider_data_ingester.py:119-196`` with Flickr's
    production constants ``flickr.py:52-65``): probe the day's record
    count; under ``max_records`` → one slice; otherwise probe each hour —
    empty hours drop, small hours stay whole, heavy hours split into
    ``min_divisions`` (or ``max_divisions`` past ``division_threshold``)
    even sub-slices. ``count_fn(start_iso, end_iso) -> int`` is the
    provider's count probe. Costs ONE extra request on a quiet day and
    25 on a heavy one, exactly the reference's budget. The returned
    (start, end) ISO pairs are the fetch fan-out units — shuffle-side
    skew is AQE's job, this keeps the FETCH side skew-free."""
    from datetime import datetime, timedelta

    d0 = datetime.fromisoformat(f"{date}T00:00:00+00:00")

    def slices(start, end, n):
        total = (end - start).total_seconds()
        if total % n:
            raise ValueError(f"{start}..{end} does not divide evenly by {n}")
        step = timedelta(seconds=int(total / n))
        return [(start + i * step, start + (i + 1) * step) for i in range(n)]

    def iso(pair):
        return (pair[0].isoformat(), pair[1].isoformat())

    day = (d0, d0 + timedelta(days=1))
    n_day = count_fn(*iso(day))
    if n_day == 0:
        return []
    if n_day < max_records:
        return [iso(day)]
    out = []
    for hour in slices(*day, 24):
        n = count_fn(*iso(hour))
        if n == 0:
            continue
        if n < max_records:
            out.append(iso(hour))
            continue
        n_div = min_divisions if n < division_threshold else max_divisions
        out.extend(iso(p) for p in slices(*hour, n_div))
    return out
