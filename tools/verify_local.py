"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same parquet,
compare row count, schema width, and order-insensitive values.

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from openverse_catalog_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # a full-registry run shares the process with the Spark JVM; give
    # DuckDB an explicit generous cap with a spill dir so heavy
    # oracles degrade to disk instead of OOMing late in the run (and
    # the caller retries an OOM once on a fresh connection). Too tight
    # a cap backfires: the embedding-funnel oracle spills tens of GB
    # at 16GB and can fill /tmp.
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    # cap worker threads: sharing the machine with a local[32] Spark
    # JVM + 32 python workers, DuckDB's default thread-per-core spawns
    # into transient EAGAIN windows (observed: jemalloc "background
    # thread creation failed (11)" -> bad_alloc on KB-sized blocks);
    # 8 threads keeps every oracle comfortably fast at sf<=0.1
    con.execute("SET threads TO 8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        try:
            if v is None or (isinstance(v, float) and v != v) or v is pd.NA:
                return "∅"
        except Exception:
            pass
        return str(v)

    for c in df.columns:
        df[c] = df[c].map(norm)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df




def subprocess_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    """Run one oracle in a FRESH JVM-free python process (see the
    OOM-fallback comment in main) and hand the frame back via a
    parquet temp file."""
    import subprocess
    import sys as _sys
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".sql", delete=False) as fh:
        fh.write(sql.encode())
        sql_path = fh.name
    out_path = sql_path + ".parquet"
    code = (
        "import duckdb, sys\n"
        f"con = duckdb.connect()\n"
        f"con.execute(\"SET temp_directory='/tmp/duckdb_spill'\")\n"
        "con.execute('SET threads TO 8')\n"
        + "".join(
            f"con.execute(\"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir}/{t}.parquet'\")\n"
            for t in TABLES
        )
        + f"sql = open({sql_path!r}).read()\n"
        f"con.execute(f\"COPY ({{sql}}) TO '{out_path}' "
        f"(FORMAT PARQUET)\")\n"
    )
    subprocess.run(
        [_sys.executable, "-c", code], check=True, timeout=600,
        capture_output=True,
    )
    df = pd.read_parquet(out_path)
    import os as _os

    _os.unlink(sql_path)
    _os.unlink(out_path)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    s, o = canon(sdf), canon(odf)
    if len(s) == len(o):
        neq = (s.values != o.values)
        if neq.any():
            import numpy as np

            rows, cols = np.where(neq)
            seen = []
            for r, c in list(zip(rows, cols))[:5]:
                seen.append(
                    f"row{r} col={s.columns[c]} spark={s.iloc[r, c]!r} oracle={o.iloc[r, c]!r}"
                )
            problems.append("values differ: " + " | ".join(seen))
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-local")
    con = duck_con(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except duckdb.OutOfMemoryException:
            # a prior heavy oracle can leave the shared connection's
            # buffers pinned; a fresh connection releases them — retry
            # once, then fall back to a SUBPROCESS oracle: sharing the
            # process with a 32-thread Spark JVM makes small mallocs
            # flaky under allocation bursts (observed: bad_alloc on
            # 2 KB blocks with 100+ GB free), and a fresh connection
            # in the same address space does not always clear it
            con.close()
            con = duck_con(sf_dir)
            try:
                odf = con.execute(oracles[name]).fetchdf()
            except duckdb.OutOfMemoryException:
                try:
                    odf = subprocess_oracle(sf_dir, oracles[name])
                except Exception as e:
                    print(
                        f"FAIL {name}: oracle error (subprocess): "
                        f"{type(e).__name__}: {str(e)[:300]}"
                    )
                    n_fail += 1
                    continue
            except Exception as e:
                print(
                    f"FAIL {name}: oracle error: "
                    f"{type(e).__name__}: {str(e)[:300]}"
                )
                n_fail += 1
                continue
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
