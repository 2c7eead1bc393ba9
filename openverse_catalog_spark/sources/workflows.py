"""Provider workflow registry: the reference's user-facing configuration
surface (``catalog/dags/providers/provider_workflows.py:99-296``) —
which providers run, on what schedule, dated or not, with what
timeouts — re-expressed without Airflow. A user of the reference
enumerates ``PROVIDER_WORKFLOWS`` to see/launch ingestions; this module
gives the same contract for the Spark engine: each entry names the
adapter family, its cadence metadata, and ``build_fetcher`` wires it
into the shared paged-fetch -> landing -> clean -> merge pipeline.

Scheduling itself is deliberately out of scope (cron/orchestrator
concern, SURVEY §2 no-op list) — the registry preserves the reference's
*configuration facts* so parity is checkable, and they remain the right
inputs for whatever scheduler drives the engine.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field

from openverse_catalog_spark.sources.providers import (
    FlickrStyleAdapter,
    JamendoStyleAdapter,
    StockSnapStyleAdapter,
    WikimediaStyleAdapter,
    provider_fetcher,
)
from openverse_catalog_spark.sources.providers_museums import (
    BrooklynStyleAdapter,
    ClevelandStyleAdapter,
    MetStyleAdapter,
    NyplStyleAdapter,
    PhylopicStyleAdapter,
    ScienceMuseumStyleAdapter,
    SmithsonianStyleAdapter,
    SmkStyleAdapter,
    VictoriaStyleAdapter,
)
from openverse_catalog_spark.sources.providers_web import (
    EuropeanaStyleAdapter,
    FinnishStyleAdapter,
    FreesoundStyleAdapter,
    NappyStyleAdapter,
    RawpixelStyleAdapter,
    WordPressStyleAdapter,
)


@dataclass
class ProviderWorkflow:
    """One provider's ingestion configuration (provider_workflows.py:99).

    ``adapter_cls`` is None only for bulk-load providers whose ingestion
    is a registered pipeline query instead of a paged fetch (iNaturalist:
    ``pipeline_inaturalist_bulk``)."""

    adapter_cls: type | None
    dag_id: str
    schedule: str = "@monthly"
    dated: bool = False
    start_date: str = "1970-01-01"
    pull_timeout_hours: int = 24
    upsert_timeout_hours: int = 1
    media_types: tuple[str, ...] = ("image",)
    bulk_pipeline: str | None = None
    tags: list[str] = field(default_factory=list)


PROVIDER_WORKFLOWS = [
    ProviderWorkflow(BrooklynStyleAdapter, "brooklyn_museum_workflow",
                     start_date="2020-01-01"),
    ProviderWorkflow(ClevelandStyleAdapter, "cleveland_museum_workflow",
                     start_date="2020-01-15", pull_timeout_hours=12),
    ProviderWorkflow(EuropeanaStyleAdapter, "europeana_workflow",
                     schedule="@daily", dated=True, start_date="2022-10-27"),
    ProviderWorkflow(FinnishStyleAdapter, "finnish_museums_workflow",
                     schedule="@daily", dated=True, start_date="2015-11-01",
                     upsert_timeout_hours=5),
    ProviderWorkflow(FlickrStyleAdapter, "flickr_workflow",
                     schedule="@daily", dated=True, start_date="2020-11-01"),
    ProviderWorkflow(FreesoundStyleAdapter, "freesound_workflow",
                     schedule="@quarterly", pull_timeout_hours=24 * 50,
                     media_types=("audio",)),
    ProviderWorkflow(None, "inaturalist_workflow",
                     schedule="0 0 2 * *", pull_timeout_hours=24 * 5,
                     upsert_timeout_hours=24 * 5,
                     bulk_pipeline="pipeline_inaturalist_bulk"),
    ProviderWorkflow(JamendoStyleAdapter, "jamendo_workflow",
                     media_types=("audio",)),
    ProviderWorkflow(MetStyleAdapter, "metropolitan_museum_workflow",
                     schedule="@daily", dated=True, start_date="2016-09-01",
                     pull_timeout_hours=12),
    ProviderWorkflow(VictoriaStyleAdapter, "museum_victoria_workflow",
                     start_date="2020-01-01"),
    ProviderWorkflow(NappyStyleAdapter, "nappy_workflow",
                     start_date="2022-12-01"),
    ProviderWorkflow(NyplStyleAdapter, "nypl_workflow",
                     start_date="2020-01-01"),
    ProviderWorkflow(PhylopicStyleAdapter, "phylopic_workflow",
                     schedule="@weekly", start_date="2011-02-07",
                     pull_timeout_hours=12),
    ProviderWorkflow(RawpixelStyleAdapter, "rawpixel_workflow",
                     pull_timeout_hours=12),
    ProviderWorkflow(ScienceMuseumStyleAdapter, "science_museum_workflow",
                     start_date="2020-01-01"),
    ProviderWorkflow(SmithsonianStyleAdapter, "smithsonian_workflow",
                     schedule="@weekly", start_date="2020-01-01",
                     upsert_timeout_hours=6),
    ProviderWorkflow(SmkStyleAdapter, "smk_workflow",
                     start_date="2020-01-01"),
    ProviderWorkflow(StockSnapStyleAdapter, "stocksnap_workflow"),
    ProviderWorkflow(WikimediaStyleAdapter, "wikimedia_commons_workflow",
                     schedule="@daily", dated=True, start_date="2020-11-01",
                     pull_timeout_hours=12,
                     media_types=("image", "audio")),
    ProviderWorkflow(WordPressStyleAdapter, "wordpress_workflow",
                     pull_timeout_hours=12),
]


def get_workflow(dag_id: str) -> ProviderWorkflow:
    for wf in PROVIDER_WORKFLOWS:
        if wf.dag_id == dag_id:
            return wf
    raise KeyError(dag_id)


def build_fetcher(
    workflow: ProviderWorkflow,
    fetch_fn,
    date: str | None = None,
    ingestion_limit: int | None = None,
    min_delay: float = 0.0,
    **transports,
):
    """Instantiate the workflow's adapter (passing the ingestion date to
    dated adapters whose constructor accepts one) and wire it into the
    shared fetch loop — the engine-side analog of the reference's
    provider_dag_factory building a DAG from a ProviderWorkflow.

    Adapters that issue SECONDARY requests (Brooklyn/Met/NYPL per-record
    detail fetches, Phylopic build probe, WordPress/Freesound HEAD
    probes, Freesound pack resolution) declare those transports as
    constructor parameters; pass them as keyword args (e.g.
    ``build_fetcher(wf, fetch, detail_fetch=...)``). Any constructor
    parameter NOT supplied defaults to the primary ``fetch_fn`` — the
    reference uses one DelayedRequester for main and secondary requests
    alike, so that is the faithful default."""
    if workflow.adapter_cls is None:
        raise ValueError(
            f"{workflow.dag_id} is a bulk-load workflow; run its "
            f"pipeline query {workflow.bulk_pipeline!r} instead"
        )
    params = inspect.signature(workflow.adapter_cls.__init__).parameters
    kwargs = {k: v for k, v in transports.items() if k in params}
    unknown = set(transports) - set(kwargs)
    if unknown:
        raise TypeError(
            f"{workflow.adapter_cls.__name__} takes no {sorted(unknown)}"
        )
    if workflow.dated and date is not None and "date" in params:
        kwargs["date"] = date
    # default every remaining REQUIRED transport-shaped parameter to the
    # primary fetch callable (arity-tolerant: probe transports like
    # Phylopic's build probe are called with no arguments)
    def _default_transport(*args, **kw):
        return fetch_fn(args[0] if args else {})

    for name, p in params.items():
        if name in ("self", "date") or name in kwargs:
            continue
        if p.default is inspect.Parameter.empty and p.kind in (
            inspect.Parameter.POSITIONAL_OR_KEYWORD,
            inspect.Parameter.KEYWORD_ONLY,
        ):
            kwargs[name] = _default_transport
    adapter = workflow.adapter_cls(**kwargs)
    return provider_fetcher(
        adapter, fetch_fn, ingestion_limit=ingestion_limit, min_delay=min_delay
    )


def workflow_dag_spec(workflow: ProviderWorkflow) -> dict:
    """Emit the workflow's task graph as a dependency-free spec dict —
    the engine-side analog of the reference's provider_dag_factory
    output (``providers/provider_dag_factory.py``: pull_data ->
    per-media load -> upsert -> report chain), consumable by an Airflow
    shim (each task dict maps 1:1 onto an operator) without importing
    Airflow here.

    Task chain per provider: ``pull_data`` (paged fetch -> landing)
    then, per media type, ``clean_<mt>`` -> ``merge_<mt>`` (the CoW
    upsert with the registry's upsert timeout), joined by a final
    ``report`` (load stats — the reference's report_load_completion).
    Bulk workflows (iNaturalist) emit ``ingest_bulk`` running their
    registered pipeline query instead of a paged fetch."""
    base = {
        "dag_id": workflow.dag_id,
        "schedule": workflow.schedule,
        "dated": workflow.dated,
        "start_date": workflow.start_date,
        "media_types": list(workflow.media_types),
        "tags": list(workflow.tags),
    }
    if workflow.adapter_cls is None:
        tasks = [
            {
                "task_id": "ingest_bulk",
                "op": "pipeline_query",
                "pipeline": workflow.bulk_pipeline,
                "timeout_hours": workflow.pull_timeout_hours,
                "depends_on": [],
            },
            {
                "task_id": "report",
                "op": "load_report",
                "timeout_hours": 1,
                "depends_on": ["ingest_bulk"],
            },
        ]
        return {**base, "tasks": tasks}
    tasks = [
        {
            "task_id": "pull_data",
            "op": "paged_fetch",
            "adapter": workflow.adapter_cls.__name__,
            "timeout_hours": workflow.pull_timeout_hours,
            "depends_on": [],
        }
    ]
    merge_ids = []
    for mt in workflow.media_types:
        tasks.append(
            {
                "task_id": f"clean_{mt}",
                "op": "clean_media_batch",
                "media_type": mt,
                "timeout_hours": workflow.upsert_timeout_hours,
                "depends_on": ["pull_data"],
            }
        )
        tasks.append(
            {
                "task_id": f"merge_{mt}",
                "op": "cow_merge",
                "media_type": mt,
                "timeout_hours": workflow.upsert_timeout_hours,
                "depends_on": [f"clean_{mt}"],
            }
        )
        merge_ids.append(f"merge_{mt}")
    tasks.append(
        {
            "task_id": "report",
            "op": "load_report",
            "timeout_hours": 1,
            "depends_on": merge_ids,
        }
    )
    return {**base, "tasks": tasks}


def workflow_dag_specs() -> list[dict]:
    """Specs for every registered workflow, dag_id-ordered — the full
    orchestration surface a scheduler shim consumes (the reference's
    ``test_dag_parsing``-style contract: every workflow produces a
    well-formed task graph)."""
    return [workflow_dag_spec(wf) for wf in
            sorted(PROVIDER_WORKFLOWS, key=lambda w: w.dag_id)]


def run_workflow_spec(
    spark,
    spec: dict,
    fetch_fn,
    root: str,
    date: str = "2024-01-01",
    ingestion_limit: int | None = None,
    min_delay: float = 0.0,
    pipeline_runner=None,
    **transports,
) -> dict:
    """Execute an emitted DAG spec — the minimal scheduler shim that
    proves the specs are RUNNABLE, not just well-formed: tasks run in
    dependency order, each op mapping 1:1 onto the engine (paged_fetch
    -> landing zone; clean_<mt> -> clean_media_batch; merge_<mt> ->
    CoW-table MERGE with exact dedupe; report -> per-media row counts).
    An Airflow shim maps the same dict onto operators; this in-process
    runner is also the integration test the reference gets from
    provider_dag_factory's DAG-run tests. Returns {task_id: result}.

    Layout under ``root``: ``landing/`` (date-partitioned JSONL) and
    ``table_<media_type>/`` (one CoW table per media type)."""
    import os as _os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from openverse_catalog_spark.operators.cowtable import CowTable
    from openverse_catalog_spark.operators.dedupe import exact_dedupe
    from openverse_catalog_spark.plans.media_pipeline import (
        clean_media_batch,
        empty_canonical,
    )
    from openverse_catalog_spark.schemas.columns import (
        audio_db_schema,
        image_db_schema,
    )
    from openverse_catalog_spark.sources.landing import (
        read_json_landing,
        write_landing,
    )
    from openverse_catalog_spark.sources.providers import (
        audio_staging_schema,
        staging_schema,
    )

    wf = get_workflow(spec["dag_id"])
    landing = _os.path.join(root, "landing")
    primary = spec["media_types"][0]
    results: dict[str, dict] = {}
    cleaned: dict[str, object] = {}
    done: set[str] = set()

    def staging_for(media_type):
        base = staging_schema() if media_type == "image" else audio_staging_schema()
        fields = list(base.fields) + [T.StructField("media_type", T.StringType())]
        df = read_json_landing(spark, landing, T.StructType(fields))
        # a run loads ITS logical date's landing partition only (the
        # reference's per-run TSV): ingest_date is the partition column,
        # so this prunes at the file index — a catchup/backfill day
        # never rescans the other days' landings
        if "ingest_date" in df.columns:
            df = df.filter(
                F.col("ingest_date") == F.lit(date)
            ).drop("ingest_date")
        mt = F.coalesce(F.col("media_type"), F.lit(primary))
        return df.filter(mt == F.lit(media_type)).drop("media_type")

    for task in spec["tasks"]:
        missing = set(task["depends_on"]) - done
        if missing:
            raise RuntimeError(f"{task['task_id']} depends on unfinished {missing}")
        op = task["op"]
        if op == "paged_fetch":
            fetcher = build_fetcher(
                wf, fetch_fn, date=date, ingestion_limit=ingestion_limit,
                min_delay=min_delay, **transports,
            )
            n = write_landing(fetcher, landing, date, wf.dag_id)
            results[task["task_id"]] = {"records": n}
        elif op == "clean_media_batch":
            mt = task["media_type"]
            cleaned[mt] = clean_media_batch(staging_for(mt), spark, mt)
            results[task["task_id"]] = {"media_type": mt}
        elif op == "cow_merge":
            mt = task["media_type"]
            cols = image_db_schema() if mt == "image" else audio_db_schema()
            table_root = _os.path.join(root, f"table_{mt}")
            if not _os.path.exists(_os.path.join(table_root, "VERSION")):
                CowTable.create(spark, table_root, empty_canonical(spark, mt))
            table = CowTable(spark, table_root)
            batch = exact_dedupe(
                cleaned[mt], ["provider", "foreign_identifier"], [F.col("url")]
            )
            batch = batch.select(
                [c.name for c in cols if c.name in batch.columns]
            )
            summary = table.merge(batch, cols, deterministic=True)
            results[task["task_id"]] = summary
        elif op == "load_report":
            report = {}
            for mt in spec["media_types"]:
                table_root = _os.path.join(root, f"table_{mt}")
                if _os.path.exists(_os.path.join(table_root, "VERSION")):
                    report[mt] = CowTable(spark, table_root).read().count()
            if not report and "ingest_bulk" in results:
                # bulk workflows report the pipeline's output row count
                report[spec["media_types"][0]] = results["ingest_bulk"]["rows"]
            results[task["task_id"]] = {
                "rows": report,
                "message": format_load_report(
                    spec["dag_id"], report, date=date
                ),
            }
        elif op == "pipeline_query":
            # bulk workflows (iNaturalist) run a registered pipeline query
            # instead of a paged fetch; the runner is injected (usually
            # ``lambda name: queries()[name](spark, sf_dir)``) so the shim
            # stays import-cycle-free of the query registry
            if pipeline_runner is None:
                raise ValueError(
                    f"bulk workflow {spec['dag_id']} needs a "
                    f"pipeline_runner to execute {task['pipeline']!r} "
                    "(pass pipeline_runner=lambda name: ...)"
                )
            out_df = pipeline_runner(task["pipeline"])
            results[task["task_id"]] = {
                "pipeline": task["pipeline"],
                "rows": out_df.count(),
            }
        else:  # pragma: no cover - emission and shim move together
            raise ValueError(f"unknown op {op!r}")
        done.add(task["task_id"])
    return results


def format_load_report(
    provider: str,
    media_counts: dict,
    duration_s: float | None = None,
    date: str | None = None,
) -> str:
    """Human-facing load-completion summary — the content of the
    reference's completion report (``common/loader/reporting.py``:
    per-media upserted counts + run duration posted at the end of every
    provider DAG), minus the Slack transport (deployment concern).
    Counts render grouped-thousands; zero-count media are still listed
    so a silently-empty ingest is visible."""
    parts = ", ".join(
        f"{int(n):,} {mt}" for mt, n in sorted(media_counts.items())
    )
    msg = f"{provider}: {parts or 'no records'} upserted"
    if date:
        msg += f" for {date}"
    if duration_s is not None:
        mins, secs = divmod(int(duration_s), 60)
        msg += f" in {mins}m{secs:02d}s" if mins else f" in {secs}s"
    return msg


def catchup_dates(start_date: str, end_date: str) -> list[str]:
    """Inclusive daily date range, oldest first — the run sequence
    Airflow's ``catchup=True`` generates for a dated workflow between
    its start_date and now (``provider_dag_factory.py:340-370``:
    dated workflows set catchup and ingest day by day)."""
    from datetime import date as _date, timedelta as _td

    d0 = _date.fromisoformat(start_date)
    d1 = _date.fromisoformat(end_date)
    if d1 < d0:
        raise ValueError(f"end_date {end_date} before start_date {start_date}")
    return [
        (d0 + _td(days=i)).isoformat() for i in range((d1 - d0).days + 1)
    ]


def run_workflow_backfill(
    spark,
    spec: dict,
    fetch_for_date,
    root: str,
    start_date: str,
    end_date: str,
    **kwargs,
) -> dict:
    """CATCHUP BACKFILL execution: run the workflow spec once per day of
    [start_date, end_date], oldest first — the reference's
    ``catchup=conf.dated`` behavior (provider_dag_factory.py:340-370)
    as a real loop, not a spec field. ``fetch_for_date(date)`` returns
    the day's transport (a dated API serves different rows per day).

    Each day's run lands its own ``ingest_date=<d>`` partition and
    MERGEs only that partition into the CoW media table (the shim
    prunes staging to the run's date), so a 5-day backfill costs 5
    day-sized merges, not 5 rescans of the accumulated landing zone —
    and re-running any day is idempotent (exact dedupe + upsert).

    Returns {date: per-task results} plus a ``summary`` with final
    per-media row counts."""
    wf = get_workflow(spec["dag_id"])
    if not wf.dated:
        raise ValueError(
            f"{spec['dag_id']} is not a dated workflow; backfill applies "
            "to dated (catchup) workflows only"
        )
    out: dict = {}
    for d in catchup_dates(start_date, end_date):
        out[d] = run_workflow_spec(
            spark, spec, fetch_for_date(d), root, date=d, **kwargs
        )
    last = out[max(out)]
    out["summary"] = {
        "days": len(out),
        "rows": last["report"]["rows"],
    }
    return out


def run_workflow_reingestion(
    spark,
    spec: dict,
    fetch_for_date,
    root: str,
    base_date: str,
    tiers: list[tuple[int, int]],
    **kwargs,
) -> dict:
    """TIERED REINGESTION execution: compute the day-shift lists from
    ``tiers`` ([(day_step, repeats), ...] — the reference's
    daily/weekly/fortnightly/monthly tier lengths,
    ``provider_reingestion_workflows.py:58-115`` +
    ``common/helpers.py get_partitioned_reingestion_days``) and RE-RUN
    the workflow for the base date plus every shifted date, oldest
    shift last. Re-ingesting a date the table already holds is the
    point: the fetch re-lands the partition (overwriting the same
    ``ingest_date=<d>`` files) and the MERGE re-upserts idempotently,
    refreshing metadata that changed upstream without duplicating rows
    — the reference's answer to drifting provider data.

    Returns {date: per-task results} plus ``summary`` with the shift
    schedule and final counts."""
    from datetime import date as _date, timedelta as _td

    from openverse_catalog_spark.sources.landing import (
        reingestion_day_shifts,
    )

    wf = get_workflow(spec["dag_id"])
    if not wf.dated:
        raise ValueError(
            f"{spec['dag_id']} is not a dated workflow; reingestion "
            "day-shifts apply to dated workflows only"
        )
    shifts = [0] + [
        s for tier in reingestion_day_shifts(tiers) for s in tier
    ]
    base = _date.fromisoformat(base_date)
    dates = [(base - _td(days=s)).isoformat() for s in shifts]
    out: dict = {}
    for d in dates:
        out[d] = run_workflow_spec(
            spark, spec, fetch_for_date(d), root, date=d, **kwargs
        )
    out["summary"] = {
        "shifts": shifts,
        "dates": dates,
        "rows": out[dates[-1]]["report"]["rows"],
    }
    return out
