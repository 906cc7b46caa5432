"""General-purpose curation operators over the testdata star schema.

Each query builder takes ``(spark, sf_dir)`` and returns a DataFrame; the
matching ANSI-SQL oracle lives in ``__spark_entry__.oracle_sql``. Column
aliases are kept identical on both sides (driver hash-compares by sorted
column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the testdata tables as temp views so the engine's SQL
    face (``spark.sql`` / ``jobs/run_query.py --sql``) can query them by
    name — same names the DuckDB oracle side uses. Views are lazy: no
    scan happens until a query touches one."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)


# ad-hoc persisted frames (tfidf's tf, cmvn's feature frame, ...): persist
# keeps them recomputable on executor loss (unlike localCheckpoint) but
# the blocks outlive the query — repeated gate/bench invocations would
# accumulate cache. Registering here lets dedup.clear_session_cache drop
# them between repeats, keeping memory bounded.
_TRANSIENT_PERSISTS: list[tuple[str, DataFrame]] = []


def register_transient_persist(spark: SparkSession, df: DataFrame) -> None:
    _TRANSIENT_PERSISTS.append((spark.sparkContext.applicationId, df))


def clear_transient_persists(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    keep = []
    for a, df in _TRANSIENT_PERSISTS:
        if a == app:
            df.unpersist()
        else:
            keep.append((a, df))
    _TRANSIENT_PERSISTS[:] = keep
