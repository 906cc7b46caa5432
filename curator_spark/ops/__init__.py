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
