"""10x probe of the fourth round-5 batch (event funnel, cohort
retention, counter rate, CTAS lifecycle): key-offset replication +
per-row linearity check, appended to SCALING.md.

Usage: python tools/probe_r5d.py
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from openverse_catalog_spark.session import get_spark, load_tables  # noqa: E402
from tools.scale_probe import COPIES, SF_DIR, replicate, timed  # noqa: E402

R5D_PROBES = [
    ("agg_event_funnel", {"events": ["event_id", "user_id"]}),
    ("agg_cohort_retention", {"events": ["event_id", "user_id"]}),
    ("window_counter_rate", {"events": ["event_id", "user_id"]}),
    ("sql_ctas_restore", {"customer": ["c_custkey"]}),
]


def main() -> None:
    spark = get_spark("probe_r5d")
    queries = entrymod.queries()
    tmp = tempfile.mkdtemp(prefix="sf10x_r5d_")
    tables_needed: dict[str, list[str]] = {}
    for _, offs in R5D_PROBES:
        tables_needed.update(offs)
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        if t not in tables_needed:
            load_tables(spark, SF_DIR, (t,))[t].write.mode(
                "overwrite"
            ).parquet(f"{tmp}/{t}.parquet")
    replicate(spark, SF_DIR, tmp, tables_needed, copies=COPIES)

    rows = []
    for name, _ in R5D_PROBES:
        fn = queries[name]
        timed(fn, spark, SF_DIR)  # warm
        t1 = timed(fn, spark, SF_DIR)
        t10 = timed(fn, spark, tmp)
        rows.append((name, t1, t10, t10 / t1, t10 / t1 / COPIES))
        print(
            f"{name}: {t1:.2f}s -> {t10:.2f}s "
            f"({t10 / t1:.1f}x wall, {t10 / t1 / COPIES:.2f}x/row)"
        )
    lines = [
        "",
        "## Round-5 10x probe, batch 4 (funnel / cohort / counter rate "
        "/ CTAS lifecycle)",
        "",
        "Same harness (key-offset replication, cores fixed): per-row "
        "<= ~1.2x = the shuffle/partition shape holds. Events replicate "
        "with offset user ids, so the funnel/cohort user count scales "
        "10x with the rows; the CTAS query includes the full "
        "create/insert/poison/restore commit chain at both scales.",
        "",
        "| query | sf0.1 (s) | 10x (s) | wall | per-row |",
        "|---|---|---|---|---|",
    ]
    for name, t1, t10, w, pr in rows:
        lines.append(
            f"| {name} | {t1:.2f} | {t10:.2f} | {w:.1f}x | {pr:.2f}x |"
        )
    with open("/root/repo/SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
