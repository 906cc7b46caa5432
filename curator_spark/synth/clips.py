"""The ``clips`` input table (BASELINE.json input_hint shape).

``clips(clip_id string, bytes binary, sr_hz int, dur_ms int, codec string,
transcript string)``

Generated distributed (``spark.range(n) → mapInPandas``) so SF=0.1 (100k
clips, ~several GB of audio bytes) never funnels through the driver —
exactly how a 10^12-clip table would be seeded on a real cluster. Every row
is a pure function of its index, so the single-node oracle can regenerate
any row bit-identically without Spark.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import audiogen, textgen

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string"
)


def clip_row(i: int) -> dict:
    """One clip — pure function of (GLOBAL_SEED, i). Shared with the oracle."""
    blob, sr, dur_ms, codec = audiogen.encode_clip(i)
    transcript, _true_lang, _flags = textgen.gen_transcript(i)
    return {
        "clip_id": f"clip_{i:012d}",
        "bytes": blob,
        "sr_hz": sr,
        "dur_ms": dur_ms,
        "codec": codec,
        "transcript": transcript,
    }


def _gen_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = [clip_row(int(i)) for i in pdf["id"]]
        yield pd.DataFrame(rows)


def generate_clips(spark: SparkSession, n: int, n_partitions: int | None = None) -> DataFrame:
    """Distributed clips DataFrame of ``n`` rows."""
    if n_partitions is None:
        n_partitions = max(8, min(256, n // 500 or 1))
    rng_df = spark.range(0, n, 1, n_partitions)
    return rng_df.mapInPandas(_gen_batches, schema=CLIPS_SCHEMA)


def write_clips(spark: SparkSession, n: int, path: str) -> None:
    """Materialize the clips table as parquet (bench/test input)."""
    generate_clips(spark, n).write.mode("overwrite").parquet(path)


def clips_pandas(n: int) -> pd.DataFrame:
    """Single-node generation for the oracle / tiny unit tests."""
    return pd.DataFrame([clip_row(i) for i in range(n)])
