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


NEAR_DUP_GAIN = 0.98  # volume-normalized re-encode: same recording, new gain


def near_dup_row(i: int, gain: float = NEAR_DUP_GAIN) -> dict:
    """A volume-scaled re-encode of clip ``i`` — the classic near-duplicate
    a fingerprint dedup must catch (same recording, different mastering).
    Decode → scale → clip → re-encode through the SAME codec, so the copy
    is byte-different (exact dedup misses it) but energy-shape identical.
    Lives in the DATA-GENERATION layer by design: operators stay pure over
    their input (round-2 ADVICE on the embedding fixture)."""
    import numpy as np

    from ..scoring import audio as audio_scoring
    from . import audiogen

    r = clip_row(i)
    pcm = audio_scoring.decode(r["bytes"], r["codec"], r["sr_hz"])
    g = np.clip(pcm * gain, -1.0, 1.0)
    blob = (
        audiogen.pcm16_to_wav(g, r["sr_hz"])
        if r["codec"] == "pcm_s16le"
        else audiogen.mulaw_encode(g)
    )
    return {**r, "clip_id": "dup_" + r["clip_id"], "bytes": blob}


def clips_with_near_dups_pandas(n: int, every: int = 20) -> pd.DataFrame:
    """Base clips 0..n-1 plus a near-dup of every ``every``-th — the
    single-node face of :func:`generate_clips_with_near_dups`."""
    rows = [clip_row(i) for i in range(n)]
    rows += [near_dup_row(i) for i in range(0, n, every)]
    return pd.DataFrame(rows)


def generate_clips_with_near_dups(
    spark: SparkSession, n: int, every: int = 20, n_partitions: int = 4
) -> DataFrame:
    """Distributed base + planted near-dups (ids are still pure functions
    of the index, so the oracle regenerates the same table)."""
    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < n:
                    rows.append(clip_row(i))
                else:  # tail indices map to the planted dups
                    rows.append(near_dup_row((i - n) * every))
            yield pd.DataFrame(rows)

    n_dups = len(range(0, n, every))
    return spark.range(0, n + n_dups, 1, n_partitions).mapInPandas(
        _gen, schema=CLIPS_SCHEMA
    )


def near_dup_clip_ids(
    spark: SparkSession, n: int, every: int = 20, n_partitions: int = 4
) -> DataFrame:
    """The clip_id universe of :func:`generate_clips_with_near_dups`
    WITHOUT synthesizing any audio — ids are pure functions of the index
    (``clip_row``/``near_dup_row`` above), so consumers that only need the
    id column (e.g. the dedup components' singleton left join) get a pure
    Catalyst frame instead of a second full waveform+encode pass."""
    from pyspark.sql import functions as F

    base = spark.range(0, n, 1, n_partitions).select(
        F.format_string("clip_%012d", "id").alias("clip_id")
    )
    dups = spark.range(0, len(range(0, n, every))).select(
        F.format_string("dup_clip_%012d", F.col("id") * every).alias("clip_id")
    )
    return base.union(dups)
