"""Driver-gate queries for the user-defined map surface (SURVEY §2.2 M7/M8,
§2.8 T2): deterministic VectorMap / CodeExecutor runs whose outputs have
plain SQL oracles, so the retry→bisect→quarantine lifecycle
(reference: base_online_request_processor.py:455-544) and the subprocess
executor (code_executor/code_executor.py:99-181) sit under the driver's
hash-compare gate instead of pytest only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load
from ..api import VectorMap, code_exec_stage


def vector_map_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A VectorMap stage over events where every event_id % 97 == 0 row
    poisons its batch: the batch retries, bisects, and quarantines exactly
    those rows (_error set, outputs null) while all other rows succeed —
    the T2 retry-queue/quarantine semantics, driver-checkable because the
    poisoned set and the error string are deterministic."""

    def _double(pdf: pd.DataFrame) -> pd.DataFrame:
        if (pdf["row_key"] % 97 == 0).any():
            raise ValueError("poisoned row")
        out = pdf[["row_key"]].copy()
        out["doubled"] = np.asarray(pdf["value"], dtype=np.float64) * 2.0
        return out

    stage = VectorMap(name="double", fn=_double, out_schema="row_key long, doubled double")
    events = load(spark, sf_dir, "events").select(
        F.col("event_id").alias("row_key"), "value"
    )
    return stage(events).orderBy("row_key")


def row_params_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 per-row generation-params override (≙ prompt_formatter.py:101-112):
    a per-row ``params`` map is merged over the stage defaults, and the
    effective value drives the stage's decision. Here: a per-doc minimum
    word count — docs with doc_id % 3 == 0 override the default of 40 down
    to 10, doc_id % 3 == 1 override up to 80, and doc_id % 3 == 2 carry no
    override (default applies)."""

    def _keep(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["row_key"]].copy()
        min_words = np.asarray([int(p["min_words"]) for p in pdf["_params"]])
        n_words = np.asarray([len([w for w in (t or "").split(" ") if w]) for t in pdf["text"]])
        out["min_words_eff"] = min_words
        out["n_words"] = n_words
        out["keep"] = n_words >= min_words
        return out

    stage = VectorMap(
        name="row_params_keep",
        fn=_keep,
        out_schema="row_key long, min_words_eff int, n_words int, keep boolean",
        defaults=(("min_words", 40),),
        params_col="params",
    )
    docs = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("row_key"),
        "text",
        F.when(F.col("doc_id") % 3 == 0, F.create_map(F.lit("min_words"), F.lit(10)))
        .when(F.col("doc_id") % 3 == 1, F.create_map(F.lit("min_words"), F.lit(80)))
        .alias("params"),
    )
    return (
        stage(docs)
        .drop("_error")  # pure stage: no failures by construction
        .orderBy("row_key")
    )


def code_exec_rows(spark: SparkSession, sf_dir: str, n: int = 50) -> DataFrame:
    """CodeExecutor (M7) under the driver gate: each row carries a Python
    program + stdin; subprocesses emit deterministic stdout/exit codes
    (v*3 printed; exit 3 when v % 5 == 0), so the result is SQL-checkable."""
    code = "import sys\nv = int(input())\nprint(v * 3)\nsys.exit(3 if v % 5 == 0 else 0)"
    rows = (
        load(spark, sf_dir, "events")
        .select(F.col("event_id").alias("row_key"))
        .orderBy("row_key")
        .limit(n)
        .select(
            "row_key",
            F.lit(code).alias("code"),
            F.col("row_key").cast("string").alias("stdin"),
        )
    )
    stage = code_exec_stage()
    return (
        stage(rows)
        .select("row_key", "stdout", "exit_code")
        .orderBy("row_key")
    )
