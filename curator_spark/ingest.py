"""Input coercion: anything row-shaped → DataFrame (SURVEY §2.1 S1).

The reference coerces a str / list / generator / Dataset into its input
dataset (``llm/llm.py:304-325``: a bare prompt becomes a one-row dataset,
an iterable of prompts or dicts becomes rows). The Spark analogs:

- DataFrame → passed through.
- pandas DataFrame → Arrow-converted.
- str → one-row, one-column.
- iterable of str → one column (``column`` names it).
- iterable of dict → one row per dict (union of keys = columns).
- str path → read by extension: ``.jsonl``/``.json`` (line-delimited,
  the reference's response-file format), ``.csv`` (header row), else
  parquet. Pass ``schema`` to skip the JSON/CSV inference pass — at
  scale inference is an extra full read of the text files.

Everything driver-materialized goes through a pandas frame: on this
engine ``createDataFrame(list_of_rows)`` takes the Python-RDD path
(~5s of fixed per-job cost), while the pandas→Arrow path is ~0.05s.
Driver-side lists are by definition small (they fit in the driver);
big inputs arrive as paths or DataFrames.
"""

from __future__ import annotations

import logging
import os
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


# this repo's CSV dialect (what export.py writes): RFC-4180 doubled-quote
# escaping + multiLine, so a transcript containing '\n' or '"' round-trips
# instead of splitting into garbage rows. Trade-offs a caller can override
# via csv_options: multiLine makes each file ONE non-splittable task (fine
# for exported shards, slow for a single multi-GB CSV), and escape='"'
# mis-parses backslash-escaped CSVs (Spark's own writer default) — pass
# csv_options={"escape": "\\", "multiLine": False} for those.
CSV_DIALECT = {"escape": '"', "multiLine": True}


def _read_path(spark: SparkSession, path: str, schema=None, csv_options=None) -> DataFrame:
    """Read a data file/dir by extension (module docstring's dispatch)."""
    name = path.rstrip("/").lower()
    if name.endswith((".jsonl", ".json")):
        reader = spark.read.schema(schema) if schema is not None else spark.read
        return reader.json(path)
    if name.endswith(".csv"):
        reader = spark.read.option("header", True)
        if not csv_options:
            # the repo dialect silently changes two parse behaviors vs
            # Spark's reader defaults (escape='"' mis-parses
            # backslash-escaped files; multiLine makes each file one
            # task) — say so once per process so a mis-parse is
            # traceable to the dialect, not the data (round-5 ADVICE)
            logging.getLogger(__name__).info(
                "reading %s with the repo CSV dialect %s — pass "
                "csv_options to override (see ingest.CSV_DIALECT)",
                path,
                CSV_DIALECT,
            )
        for k, v in {**CSV_DIALECT, **(csv_options or {})}.items():
            reader = reader.option(k, v)
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", True)
        return reader.csv(path)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(path)


def to_dataframe(
    spark: SparkSession, data, column: str = "prompt", schema=None, csv_options=None
) -> DataFrame:
    """Coerce ``data`` into a DataFrame (see module docstring).
    ``csv_options`` overrides the repo CSV dialect for path reads (see
    ``CSV_DIALECT`` for when to)."""
    if isinstance(data, DataFrame):
        return data
    if isinstance(data, pd.DataFrame):
        return spark.createDataFrame(data)
    if isinstance(data, str):
        if os.path.exists(data):  # a path → read it by extension
            return _read_path(spark, data, schema, csv_options)
        data = [data]
    if isinstance(data, dict):  # one row-shaped mapping → one row
        data = [data]
    if isinstance(data, (bytes, bytearray)) or not isinstance(data, Iterable):
        # bytes ARE iterable but iterating them yields ints — silently
        # producing a column of byte values would be garbage, not coercion
        raise TypeError(f"cannot coerce {type(data).__name__} into a DataFrame")
    rows = list(data)
    if not rows:
        raise ValueError(
            "cannot infer a schema from an empty iterable — pass a DataFrame "
            "or a pandas frame with explicit columns instead"
        )
    if isinstance(rows[0], dict):
        # NOT via pandas: pd.DataFrame NaN-fills keys missing from a row,
        # silently promoting int columns to float64 (id=1 round-trips as
        # 1.0 / DoubleType). Spark's own inference over tuples merges
        # types across ALL rows and keeps ints long with proper nulls.
        keys: list = []
        for d in rows:
            for k in d:
                if k not in keys:
                    keys.append(k)
        # a key that is None in EVERY row gives inference no evidence at
        # all and createDataFrame hard-crashes ("Some of types cannot be
        # determined"); default those columns to string (an always-empty
        # optional field is a normal row shape) and infer the rest
        dead = [k for k in keys if all(d.get(k) is None for d in rows)]
        if not dead:
            return spark.createDataFrame(
                [tuple(d.get(k) for k in keys) for d in rows], schema=keys
            )
        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType, StructField, StructType

        live = [k for k in keys if k not in dead]
        if not live:
            return spark.createDataFrame(
                [tuple(None for _ in keys) for _ in rows],
                StructType([StructField(k, StringType()) for k in keys]),
            )
        out = spark.createDataFrame(
            [tuple(d.get(k) for k in live) for d in rows], schema=live
        )
        for k in dead:
            out = out.withColumn(k, F.lit(None).cast("string"))
        return out.select(*keys)
    return spark.createDataFrame(pd.DataFrame({column: rows}))
