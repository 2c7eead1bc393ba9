"""CLI for the engine: list, run, and explain registry queries.

  python -m openverse_catalog_spark list
  python -m openverse_catalog_spark run corpus_build_funnel \
      [--sf-dir /root/testdata/sf0.01] [--show 20]
  python -m openverse_catalog_spark explain corpus_mix_langs

`list` touches no JVM (registry import only); `run`/`explain` start a
local session via session.get_spark.
"""

from __future__ import annotations

import argparse
import sys


def _registry():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="openverse_catalog_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list registry queries (* = oracle-gated)")
    for c in ("run", "explain"):
        p = sub.add_parser(c)
        p.add_argument("name")
        p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
        if c == "run":
            p.add_argument("--show", type=int, default=20)
    args = ap.parse_args(argv)

    queries, oracles = _registry()
    if args.cmd == "list":
        for name in sorted(queries):
            print(f"{'*' if name in oracles else ' '} {name}")
        return 0

    if args.name not in queries:
        print(f"unknown query: {args.name}", file=sys.stderr)
        return 2
    from openverse_catalog_spark.session import get_spark

    spark = get_spark("cli")
    df = queries[args.name](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.show, truncate=False)
        print(f"[{df.count()} rows]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
