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
# them between repeats; registration itself stays bounded (stopped-app
# entries evicted, oldest live entry unpersisted past a cap) so even a
# long-lived session that never calls clear_session_cache cannot
# accumulate persists or registry refs without limit.
_TRANSIENT_PERSISTS: list[tuple[str, DataFrame]] = []
_TRANSIENT_CAP = 16  # oldest live persist evicted beyond this


def register_transient_persist(spark: SparkSession, df: DataFrame) -> None:
    app = spark.sparkContext.applicationId
    # only one SparkContext exists per Python process, so entries tagged
    # with another applicationId belong to stopped sessions — their cache
    # blocks died with the app; drop the stale refs instead of keeping
    # (appId, df) tuples of dead applications forever
    _TRANSIENT_PERSISTS[:] = [e for e in _TRANSIENT_PERSISTS if e[0] == app]
    _TRANSIENT_PERSISTS.append((app, df))
    while len(_TRANSIENT_PERSISTS) > _TRANSIENT_CAP:
        _, old = _TRANSIENT_PERSISTS.pop(0)
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 - context raced to shutdown
            pass


def clear_transient_persists(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    for a, df in _TRANSIENT_PERSISTS:
        if a == app:
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 - context raced to shutdown
                pass
    _TRANSIENT_PERSISTS.clear()
