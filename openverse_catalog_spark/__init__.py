"""openverse_catalog_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of WordPress/openverse-catalog.

The reference system (Airflow + PostgreSQL ETL for openly-licensed media
metadata) is re-expressed Spark-first: its typed column system, record
cleaning, dedup, per-column upsert MERGE, popularity scoring, and bulk
relational joins all become declarative DataFrame programs optimized by
Catalyst. See SURVEY.md for the operator-by-operator mapping.

Layout:
    schemas/    column-spec registry (schema + clean + merge metadata)
    functions/  scalar expression library (clean, license, url, text, sim)
    operators/  dataflow operators (merge, dedupe, popularity, knn, windows)
    sources/    readers/writers (TSV with \\N nulls, parquet landing)
    plans/      end-to-end pipelines / analytics query suite
    streaming/  incremental (dated-partition) patterns
"""

__version__ = "0.1.0"
