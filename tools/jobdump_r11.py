"""Per-Spark-job breakdown for one registry query (round-11 profiling):
run the query with the event log enabled, then fold the log into a
job-by-job table (call site, duration, task count). The optimization
guide's §1 'measure first' at job grain — the maintenance statements
are job-count-bound, so the job list IS the cost model.

Usage: python tools/jobdump_r11.py <query_name> [sf_dir]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    log_dir = f"/tmp/spark-graft-eventlog-{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)

    from openverse_catalog_spark.session import get_spark

    spark = get_spark(
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            # plain JSON lines — the default rolling+zstd layout is
            # unreadable by the line-folder below
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    )
    import __spark_entry__  # noqa: F401 - registers every plans module
    from openverse_catalog_spark.plans.analytics import QUERIES

    t0 = time.time()
    df = QUERIES[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()

    jobs: dict[int, dict] = {}
    execs: dict[str, str] = {}
    paths = [
        p
        for p in glob.glob(f"{log_dir}/**", recursive=True)
        if os.path.isfile(p) and os.path.getsize(p) > 0
    ]
    for path in paths:
        with open(path, errors="ignore") as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not isinstance(ev, dict):
                    continue
                if ev.get("Event") == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "t0": ev["Submission Time"],
                        "site": props.get(
                            "callSite.short",
                            props.get("spark.job.description", "?"),
                        ),
                        "exec": props.get("spark.sql.execution.root.id")
                        or props.get("spark.sql.execution.id"),
                        "stages": len(ev.get("Stage IDs") or []),
                    }
                elif ev.get("Event", "").endswith("SQLExecutionStart"):
                    execs[str(ev.get("executionId"))] = (
                        (ev.get("description") or "?").splitlines()[0][:90]
                    )
                elif ev.get("Event") == "SparkListenerJobEnd":
                    j = jobs.get(ev["Job ID"])
                    if j is not None:
                        j["sec"] = (ev["Completion Time"] - j["t0"]) / 1000.0

    print(f"=== {name} wall {wall:.2f}s  jobs {len(jobs)}")
    by_site: dict[str, list] = {}
    for jid in sorted(jobs):
        j = jobs[jid]
        site = j["site"]
        if site == "?" and j.get("exec") is not None:
            site = execs.get(str(j["exec"]), "?")
        j["site"] = site
        by_site.setdefault(site, [0, 0.0])
        by_site[site][0] += 1
        by_site[site][1] += j.get("sec", 0.0)
        print(
            f"  job {jid:3d}  {j.get('sec', -1):7.2f}s  "
            f"stages={j['stages']}  ex={j.get('exec')}  {site[:90]}"
        )
    print("--- by call site")
    for site, (n, sec) in sorted(by_site.items(), key=lambda kv: -kv[1][1]):
        print(f"  {sec:7.2f}s  n={n:3d}  {site[:90]}")


if __name__ == "__main__":
    main()
