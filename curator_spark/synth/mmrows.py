"""The mixed-modality row table: transcript + audio + image in ONE row.

The reference's ``_MultiModalPrompt`` carries texts+images+files in a
single payload (types/prompt.py:12-117); this table is that shape as a
DataFrame: each row holds a transcript string, an audio payload with its
codec metadata, and an image payload with its format metadata. Every row
is a pure function of its index (audio/transcript reuse
:mod:`curator_spark.synth.clips`, the image reuses
:mod:`curator_spark.synth.imagegen`), so the single-node oracle can
regenerate any row bit-identically without Spark.

Deterministic corruption: every 17th row gets an external audio codec
(``opus``) and every 23rd an external image format (``jpeg``) — both are
documented decoder stubs, so the fused stage's PER-MODALITY quarantine
(audio_ok / image_ok independent) is exercised by the gate query itself,
not just by unit tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import clips, imagegen

MM_SCHEMA = (
    "row_id string, transcript string, "
    "bytes binary, sr_hz int, dur_ms int, codec string, "
    "image binary, img_fmt string, width int, height int"
)

AUDIO_STUB_MOD = 17  # row i % 17 == 0 -> codec 'opus' (external stub)
IMAGE_STUB_MOD = 23  # row i % 23 == 0 -> fmt 'jpeg' (external stub)


def mm_row(i: int) -> dict:
    """One mixed-modality row — pure function of (GLOBAL_SEED, i)."""
    c = clips.clip_row(i)
    img = imagegen.make_image(i)
    return {
        "row_id": c["clip_id"],
        "transcript": c["transcript"],
        "bytes": c["bytes"],
        "sr_hz": c["sr_hz"],
        "dur_ms": c["dur_ms"],
        "codec": "opus" if i % AUDIO_STUB_MOD == 0 else c["codec"],
        "image": img["data"],
        "img_fmt": "jpeg" if i % IMAGE_STUB_MOD == 0 else img["fmt"],
        "width": img["width"],
        "height": img["height"],
    }


def _gen_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        yield pd.DataFrame([mm_row(int(i)) for i in pdf["id"]])


def generate_mm_rows(spark: SparkSession, n: int, n_partitions: int = 4) -> DataFrame:
    """Distributed mixed-modality DataFrame of ``n`` rows (driver-free
    seeding — the same ``spark.range → mapInPandas`` pattern as clips)."""
    return spark.range(0, n, 1, n_partitions).mapInPandas(_gen_batches, schema=MM_SCHEMA)


def mm_pandas(n: int) -> pd.DataFrame:
    """Single-node generation for the oracle fixture / unit tests."""
    return pd.DataFrame([mm_row(i) for i in range(n)])
