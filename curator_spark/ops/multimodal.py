"""Multimodal (binary-column) operators.

Audio is this engine's first-class payload (BASELINE.json graft cell):
clips carry opaque ``bytes`` + typed metadata (sr_hz, dur_ms, codec), and
every byte-touching op decodes once per Arrow batch inside ``mapInPandas``
— the Spark re-expression of the reference's lazy media serialization
(``types/prompt.py:21-103``). The same plumbing pattern (binary column +
metadata + batched decode UDF) extends to image/video payloads; codecs the
container lacks decode libraries for raise in
:func:`curator_spark.scoring.audio.decode` rather than silently passing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode a deterministic synthetic clip batch and emit per-clip audio
    features (rms_db / silence_ratio / clip_ratio). The input is generated
    in-query (seeded; no external data) because the shared testdata star
    schema carries no binary columns. Rows-only driver check — PCM math has
    no SQL form; SNR/allclose invariants live in tests/test_stage_parity.py."""
    from .. import stages
    from ..synth import clips

    df = clips.generate_clips(spark, 200, 4)
    return (
        stages.decode_stage(df)
        .select(
            "clip_id",
            "codec",
            F.round("rms_db", 6).alias("rms_db"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("clip_ratio", 6).alias("clip_ratio"),
            "decode_ok",
        )
        .orderBy("clip_id")
    )


def clip_keep_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete north-rule DAG (decode -> langid+ppl -> rules -> scrub
    -> keep/drop) over a deterministic seeded clip batch, rolled up per
    (lang, keep). Rows-only driver check (langid/LM weights have no SQL
    form); bit-exact label parity vs the pure-Python oracle is asserted in
    tests/test_stage_parity.py."""
    from .. import stages
    from ..config import PipelineConfig
    from ..synth import clips

    cfg = PipelineConfig()
    labeled = stages.apply_all(clips.generate_clips(spark, 300, 4), cfg.rules)
    return (
        labeled.groupBy("lang", "keep")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("ppl"), 4).alias("mean_ppl"),
            F.round(F.avg("silence_ratio"), 4).alias("mean_silence"),
        )
        .orderBy("lang", "keep")
    )
