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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _opt_int(v):
    """NULL-safe int coercion for metadata carried into quarantine rows.

    Fused media stages build the carried-metadata dict BEFORE the
    try/except that implements quarantine semantics, so a NULL / NaN /
    uncoercible metadata value must degrade to None here rather than
    raise and fail the whole Spark task (the decode call inside the try
    still sees the raw value and quarantines the row)."""
    try:
        if v is None or (isinstance(v, float) and v != v):
            return None
        return int(v)
    except (TypeError, ValueError, OverflowError):
        return None


def audio_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode a deterministic synthetic clip batch and emit per-clip audio
    features (rms_db / silence_ratio / clip_ratio). The input is generated
    in-query (seeded; no external data) because the shared testdata star
    schema carries no binary columns. Full value-hash oracle: the DuckDB
    side decodes the PCM itself (scoring/audio_sql.py — hex-tokenized
    PCM16 + inlined μ-law codebook); SNR/allclose invariants additionally
    live in tests/test_stage_parity.py."""
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


AUDIO_SEGMENTS_SCHEMA = (
    "clip_id string, n_speech_segments int, speech_ratio double, "
    "longest_speech_ms double, longest_silence_ms double, decode_ok boolean"
)


def audio_segments_stage(df: DataFrame) -> DataFrame:
    """VAD-style energy segmentation over the clips binary column: decode
    once per Arrow batch, run the vectorized frame-RMS run-length pass
    (scoring/audio.segments), drop the PCM before anything shuffles.
    Malformed payloads quarantine (``decode_ok = false``), never fail the
    task — the same contract as the decode stage."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring

    def _seg(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    s = audio_scoring.segments(pcm, int(sr))
                    rows.append({"clip_id": cid, **s, "decode_ok": True})
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {
                            "clip_id": cid,
                            "n_speech_segments": None,
                            "speech_ratio": None,
                            "longest_speech_ms": None,
                            "longest_silence_ms": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.split()[0] for f in AUDIO_SEGMENTS_SCHEMA.split(", ")]
            )

    return df.mapInPandas(_seg, schema=AUDIO_SEGMENTS_SCHEMA)


def audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip speech segmentation stats over a deterministic seeded clip
    batch (full value-hash oracle — scoring/audio_sql.py replays the
    20ms-frame VAD run-length pass in SQL; parity vs the pure-numpy
    oracle is additionally pytest-asserted). Deepens the audio payload
    family: decode → frame RMS → run-length segments, all inside one
    Arrow pass."""
    from ..synth import clips

    df = clips.generate_clips(spark, 200, 4)
    seg = audio_segments_stage(df)
    return seg.select(
        "clip_id",
        "n_speech_segments",
        F.round("speech_ratio", 6).alias("speech_ratio"),
        F.round("longest_speech_ms", 6).alias("longest_speech_ms"),
        F.round("longest_silence_ms", 6).alias("longest_silence_ms"),
        "decode_ok",
    ).orderBy("clip_id")


def speech_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Words-per-second — the audio × text quality feature (a fast-talking
    or silence-padded clip is a transcript-alignment red flag the pure-text
    rules can't see). ``wps`` is words over NOMINAL duration; ``speech_wps``
    renormalizes by the VAD speech_ratio so silence padding doesn't deflate
    the rate. One decode pass (segments stage) + a narrow broadcast-free id
    join against Catalyst word counts — at table scale both sides are
    partitioned by clip_id, so the join is co-located. Full oracle:
    scoring/audio_sql.speech_rate_sql replays frames → speech_ratio → the
    identical division chain in SQL.

    Reference analog: derived per-row stats over media + text
    (SURVEY.md §2.5 A1; types/prompt.py media metadata)."""
    from ..synth import clips

    df = clips.generate_clips(spark, 200, 4)
    words = F.filter(F.split(F.coalesce("transcript", F.lit("")), " ", -1), lambda w: w != F.lit(""))
    txt = df.select("clip_id", "dur_ms", F.size(words).alias("n_words"))
    seg = audio_segments_stage(df).select("clip_id", "speech_ratio", "decode_ok")
    dur_s = F.col("dur_ms") / F.lit(1000.0)
    wps = F.col("n_words") / dur_s
    speech_wps = F.when(
        F.col("decode_ok") & (F.col("speech_ratio") > 0),
        F.col("n_words") / (F.col("speech_ratio") * dur_s),
    )
    return (
        txt.join(seg, "clip_id")
        .select(
            "clip_id",
            "n_words",
            "dur_ms",
            F.round(wps, 6).alias("wps"),
            F.round(speech_wps, 6).alias("speech_wps"),
            "decode_ok",
        )
        .orderBy("clip_id")
    )


AUDIO_FP_SCHEMA = (
    "clip_id string, dur_ms int, sr_hz int, b0 int, b1 int, b2 int, b3 int, "
    "rms_db double, silence_ratio double, decode_ok boolean"
)


def audio_fingerprint_stage(df: DataFrame) -> DataFrame:
    """Energy-shape fingerprints + the verify features in ONE decode pass
    over the clips binary column (the fused-stage house pattern: bytes
    cross the Arrow socket once; PCM dropped before anything shuffles;
    malformed rows quarantine). Emits the four 16-bit block keys plus the
    rms/silence features the near-dup verify stage compares."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring

    cols = [f.split()[0] for f in AUDIO_FP_SCHEMA.split(", ")]

    def _fp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, dur, cid in zip(
                pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["dur_ms"], pdf["clip_id"]
            ):
                base = {"clip_id": cid, "dur_ms": _opt_int(dur), "sr_hz": _opt_int(sr)}
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    blocks = audio_scoring.fingerprint(pcm)
                    feat = audio_scoring.features(pcm, int(sr), int(dur))
                    rows.append(
                        {
                            **base,
                            **{f"b{j}": blocks[j] for j in range(4)},
                            "rms_db": feat["rms_db"],
                            "silence_ratio": feat["silence_ratio"],
                            "decode_ok": True,
                        }
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {
                            **base,
                            "b0": None, "b1": None, "b2": None, "b3": None,
                            "rms_db": None, "silence_ratio": None, "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_fp, schema=AUDIO_FP_SCHEMA)


def audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip energy-shape fingerprint blocks (scoring/audio.fingerprint)
    over the deterministic seeded batch. Full oracle: the SQL side decodes
    the audio and packs the same 64 bits (audio_sql.audio_fingerprints_sql)."""
    from ..synth import clips

    df = clips.generate_clips(spark, 200, 4)
    return (
        audio_fingerprint_stage(df)
        .select("clip_id", "b0", "b1", "b2", "b3", "decode_ok")
        .orderBy("clip_id")
    )


# (n clips, plant a near-dup every k-th, partitions) — ONE tuple shared
# by the edge frame (audio_dup_pairs) and the id universe
# (audio_dup_groups): call-site drift would silently desync group
# membership from the pair graph
NEAR_DUP_FIXTURE = (200, 20, 4)


def _audio_dup_pair_edges(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """UNORDERED audio near-dup pairs — internal edge set (the components
    consumer re-shuffles immediately; see dedup._dup_pair_edges).

    Audio-native near-duplicate pairs — the dedup family extended to the
    media payload itself (a volume-renormalized re-encode defeats byte
    digests; its energy shape does not).

    The LSH → verify composition every dedup op here uses: one FUSED
    decode pass → 4 block keys + verify features per clip → EXPLODE to
    (band, key) → bucketed self-join (never all-pairs; pigeonhole makes
    candidates complete at Hamming <= 3) → popcount on the carried blocks
    (no second join) → FEATURE VERIFY (same duration + sample rate, rms
    within 1 dB, silence_ratio within 0.02 — measured: 10/10 planted
    re-encodes kept, 0/349 shape-coincidence candidates survive) →
    distinct. Degenerate keys (all-flat blocks 0x0000/0xFFFF) are the hot
    buckets at scale; AQE skew-join splits them, and they only inflate
    candidates, never correctness. Input: base batch + planted
    volume-scaled re-encodes (synth/clips.generate_clips_with_near_dups —
    the fixture lives in the data-generation layer, the operator is pure
    over its input)."""
    from ..synth import clips

    df = clips.generate_clips_with_near_dups(spark, *NEAR_DUP_FIXTURE)
    fp = audio_fingerprint_stage(df).filter(F.col("decode_ok"))
    carry = ["b0", "b1", "b2", "b3", "dur_ms", "sr_hz", "rms_db", "silence_ratio"]
    bands = fp.select(
        "clip_id", *carry,
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("band"), F.col(f"b{j}").alias("key"))
                for j in range(4)
            ])
        ).alias("bk"),
    ).select("clip_id", *carry, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{j}").bitwiseXOR(F.col(f"b.b{j}"))) for j in range(4)
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.clip_id") < F.col("b.clip_id"))
        .filter(
            (F.col("a.dur_ms") == F.col("b.dur_ms"))
            & (F.col("a.sr_hz") == F.col("b.sr_hz"))
            & (F.abs(F.col("a.rms_db") - F.col("b.rms_db")) <= 1.0)
            & (F.abs(F.col("a.silence_ratio") - F.col("b.silence_ratio")) <= 0.02)
        )
        .select(
            F.col("a.clip_id").alias("clip_a"),
            F.col("b.clip_id").alias("clip_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def audio_dup_pairs(spark: SparkSession, sf_dir: str, max_hamming: int = 3) -> DataFrame:
    """Gate-facing ordered view of :func:`_audio_dup_pair_edges`."""
    return _audio_dup_pair_edges(spark, sf_dir, max_hamming).orderBy("clip_a", "clip_b")


LOUDNESS_SCHEMA = (
    "clip_id string, rms_db double, gain_db double, post_gain_clip_ratio double, "
    "decode_ok boolean"
)


def loudness_stage(df: DataFrame, target_db: float | None = None) -> DataFrame:
    """Per-clip loudness-normalization plan over the binary column: one
    decode per Arrow batch → gain to the target RMS + predicted post-gain
    clipping (scoring/audio.loudness); PCM dropped inside the batch,
    malformed rows quarantine (``decode_ok = false``)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring

    tgt = audio_scoring.DEFAULT_TARGET_RMS_DB if target_db is None else target_db
    cols = [f.split()[0] for f in LOUDNESS_SCHEMA.split(", ")]

    def _loud(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.loudness(pcm, tgt), "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {
                            "clip_id": cid,
                            "rms_db": None,
                            "gain_db": None,
                            "post_gain_clip_ratio": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_loud, schema=LOUDNESS_SCHEMA)


def loudness_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudness-normalization plan per clip — the standard speech-corpus
    preprocessing step (gain every clip to a common RMS target, flag clips
    that would clip after amplification so the pipeline attenuates or
    drops them instead). Full oracle: the SQL side decodes the audio and
    replays rms → quantized gain → per-sample |x|·g clip check
    (audio_sql.loudness_normalize_sql).

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1)."""
    from ..synth import clips

    df = clips.generate_clips(spark, 200, 4)
    return (
        loudness_stage(df)
        .select(
            "clip_id",
            F.round("rms_db", 6).alias("rms_db"),
            F.round("gain_db", 6).alias("gain_db"),
            F.round("post_gain_clip_ratio", 6).alias("post_gain_clip_ratio"),
            "decode_ok",
        )
        .orderBy("clip_id")
    )


ZCR_SCHEMA = "clip_id string, zcr double, est_freq_hz double, peak double, decode_ok boolean"


def audio_zcr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-crossing rate, fundamental-frequency proxy, and peak level per
    clip — the cheap voiced/unvoiced + hot-signal features a curation rule
    consumes before anything spectral. One fused decode pass; full oracle:
    the SQL side decodes the audio and counts strict sign flips with a lag
    window (audio_sql.audio_zcr_sql) — no float-summation exposure (zcr is
    a count, peak a MAX).

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in ZCR_SCHEMA.split(", ")]

    def _zcr(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.zcr_stats(pcm, int(sr)), "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "zcr": None, "est_freq_hz": None,
                         "peak": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    df = clips.generate_clips(spark, 200, 4)
    return (
        df.mapInPandas(_zcr, schema=ZCR_SCHEMA)
        .select(
            "clip_id",
            F.round("zcr", 6).alias("zcr"),
            F.round("est_freq_hz", 6).alias("est_freq_hz"),
            F.round("peak", 6).alias("peak"),
            "decode_ok",
        )
        .orderBy("clip_id")
    )


PITCH_SCHEMA = (
    "clip_id string, f0_hz double, ac_peak_ratio double, voiced boolean, decode_ok boolean"
)


def pitch_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip fundamental-frequency (pitch) estimate + voiced/unvoiced
    decision via integer autocorrelation (scoring/audio.py:pitch_stats) —
    the feature a speech-curation rule consumes to separate voiced speech
    from hum, hiss, and music-only clips. One fused decode MapInPandas
    (bytes cross the Arrow socket once, PCM dropped inside the call);
    full oracle: the SQL side decodes the audio, re-quantizes to the
    int16 grid, and replays the exact-int64 lag argmax with the same
    smallest-lag tie-break (audio_sql.pitch_estimate_sql).

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1) on
    the media-loader payload (S9)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in PITCH_SCHEMA.split(", ")]

    def _pitch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.pitch_stats(pcm, int(sr)),
                         "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "f0_hz": None, "ac_peak_ratio": None,
                         "voiced": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    df = clips.generate_clips(spark, 200, 4)
    return (
        df.mapInPandas(_pitch, schema=PITCH_SCHEMA)
        .select(
            "clip_id",
            F.round(_nan_to_null("f0_hz"), 6).alias("f0_hz"),
            F.round(_nan_to_null("ac_peak_ratio"), 6).alias("ac_peak_ratio"),
            "voiced",
            "decode_ok",
        )
        .orderBy("clip_id")
    )


SNR_SCHEMA = (
    "clip_id string, signal_db double, noise_db double, snr_db double, "
    "n_frames int, decode_ok boolean"
)


def _nan_to_null(name: str) -> Column:
    """pandas coerces ``None`` in a float64 column to NaN before Arrow ships
    it, so a quarantined row's "no value" would reach Spark as NaN while
    the SQL oracle says NULL — normalize back (the op never emits a real
    NaN)."""
    c = F.col(name)
    return F.when(F.isnan(c), F.lit(None)).otherwise(c).alias(name)


def audio_snr_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile frame-energy SNR estimate per clip — the north star's
    decoded-PCM quality gauge (SNR>=30dB) as a first-class curation
    feature, via the public NIST-STNR idea: signal level = mean of the top
    decile of 20 ms-frame energies, noise floor = mean of the bottom
    decile (scoring/audio.py:snr_stats — no VAD labels needed, so it works
    on wall-to-wall speech). ``snr_ok`` applies the 30 dB rule to the
    6-decimal-rounded value, so both engines compare the same number.

    One fused decode ``MapInPandas`` (bytes cross the Arrow socket once);
    only six narrow feature columns leave the stage. Full oracle:
    scoring/audio_sql.audio_snr_sql decodes the PCM and replays the
    rank-decile partition in SQL (tie-stable: the decile is an energy
    multiset).

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in SNR_SCHEMA.split(", ")]

    def _snr(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.snr_stats(pcm, int(sr)), "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "signal_db": None, "noise_db": None,
                         "snr_db": None, "n_frames": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    df = clips.generate_clips(spark, 200, 4)
    return (
        df.mapInPandas(_snr, schema=SNR_SCHEMA)
        .select(
            "clip_id",
            F.round(_nan_to_null("signal_db"), 6).alias("signal_db"),
            F.round(_nan_to_null("noise_db"), 6).alias("noise_db"),
            F.round(_nan_to_null("snr_db"), 6).alias("snr_db"),
            "n_frames",
            "decode_ok",
        )
        .withColumn(
            "snr_ok",
            F.when(F.col("snr_db").isNotNull(), F.col("snr_db") >= F.lit(30.0)),
        )
        .select(
            "clip_id", "signal_db", "noise_db", "snr_db",
            "n_frames", "snr_ok", "decode_ok",
        )
        .orderBy("clip_id")
    )


TRIM_SCHEMA = (
    "clip_id string, n_frames int, trim_start_ms int, trim_end_ms int, "
    "kept_ms int, decode_ok boolean"
)


def trim_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading/trailing-silence trim boundaries per clip — the edit
    decision a storage-bound curation pipeline makes before writing
    (scoring/audio.py:trim_bounds): first/last active 20 ms frame on the
    same VAD flag as :func:`audio_segments`, in integer milliseconds, so
    the oracle comparison is EXACT (no rounded floats anywhere in the
    output). One fused decode ``MapInPandas``; five narrow columns leave
    the stage. Full oracle: scoring/audio_sql.trim_silence_sql.

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in TRIM_SCHEMA.split(", ")]

    def _trim(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.trim_bounds(pcm, int(sr)),
                         "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "n_frames": None, "trim_start_ms": None,
                         "trim_end_ms": None, "kept_ms": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return (
        clips.generate_clips(spark, 200, 4)
        .mapInPandas(_trim, schema=TRIM_SCHEMA)
        .orderBy("clip_id")
    )


SPECTRAL_SCHEMA = (
    "clip_id string, r100 double, r300 double, r700 double, r1500 double, "
    "decode_ok boolean"
)


def spectral_band_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bin DFT band-energy ratios per clip — the first spectral-tier
    feature (is the energy where speech lives?): probe frequencies at
    100/300/700/1500 Hz, each band's share of the summed probe energy,
    plus the dominant band (ties toward the lower frequency, decided on
    the 6-decimal-ROUNDED ratios so both engines compare the same
    numbers — scoring/audio.py:band_ratios).

    One fused decode ``MapInPandas``: decode + 8 vectorized dot products
    per clip inside the Arrow batch; only four ratio doubles leave the
    stage, so nothing wide ever shuffles. Full oracle:
    scoring/audio_sql.spectral_band_ratios_sql replays the DFT in SQL
    with the identical angle op-order.

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in SPECTRAL_SCHEMA.split(", ")]

    def _spec(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.band_ratios(pcm, int(sr)),
                         "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "r100": None, "r300": None,
                         "r700": None, "r1500": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    rounded = (
        clips.generate_clips(spark, 200, 4)
        .mapInPandas(_spec, schema=SPECTRAL_SCHEMA)
        .select(
            "clip_id",
            F.round(_nan_to_null("r100"), 6).alias("r100"),
            F.round(_nan_to_null("r300"), 6).alias("r300"),
            F.round(_nan_to_null("r700"), 6).alias("r700"),
            F.round(_nan_to_null("r1500"), 6).alias("r1500"),
            "decode_ok",
        )
    )
    r1, r2, r3, r4 = (F.col(c) for c in ("r100", "r300", "r700", "r1500"))
    dominant = (
        F.when((r1 >= r2) & (r1 >= r3) & (r1 >= r4), F.lit(100))
        .when((r2 >= r3) & (r2 >= r4), F.lit(300))
        .when(r3 >= r4, F.lit(700))
        .otherwise(F.lit(1500))
    )
    return (
        rounded.withColumn(
            "dominant_hz", F.when(r1.isNotNull(), dominant).cast("int")
        )
        .select("clip_id", "r100", "r300", "r700", "r1500", "dominant_hz", "decode_ok")
        .orderBy("clip_id")
    )


LEVEL_SCHEMA = (
    "clip_id string, dc_offset double, rms double, peak double, "
    "crest_db double, decode_ok boolean"
)


def audio_level_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-domain health gauges per clip — DC offset, RMS, peak, crest
    factor (scoring/audio.py:level_stats): the checks a mastering-fault /
    brickwalling rule consumes before anything spectral. Exact int64
    Σxi/Σxi²/MAX inside ONE fused decode ``MapInPandas``; full oracle:
    the SQL side re-quantizes the decoded samples and replays the same
    integer sums and the identical float report expressions
    (audio_sql.audio_level_stats_sql).

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in LEVEL_SCHEMA.split(", ")]

    def _lvl(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.level_stats(pcm, int(sr)),
                         "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "dc_offset": None, "rms": None,
                         "peak": None, "crest_db": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return (
        clips.generate_clips(spark, 200, 4)
        .mapInPandas(_lvl, schema=LEVEL_SCHEMA)
        .select(
            "clip_id",
            F.round(_nan_to_null("dc_offset"), 6).alias("dc_offset"),
            F.round(_nan_to_null("rms"), 6).alias("rms"),
            F.round(_nan_to_null("peak"), 6).alias("peak"),
            F.round(_nan_to_null("crest_db"), 6).alias("crest_db"),
            "decode_ok",
        )
        .orderBy("clip_id")
    )


CEPSTRAL_SCHEMA = (
    "clip_id string, c0 double, c1 double, c2 double, flatness double, decode_ok boolean"
)


def cepstral_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cepstral-lite features per clip — DCT-II over the probe-band log
    energies (``c0..c2``) plus spectral flatness, completing the classic
    speech-feature chain energy → spectral → cepstral → CMVN
    (scoring/audio.py:cepstral_features). Same ONE fused decode
    ``MapInPandas`` shape as the spectral op (the DFT work is shared code
    and the only per-clip output is 4 doubles); full oracle replays the
    DFT + ln/DCT/exp with the identical left-associated operation trees
    (audio_sql.cepstral_features_sql).

    Reference analog: per-row derived media stats (SURVEY.md §2.5 A1)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in CEPSTRAL_SCHEMA.split(", ")]

    def _cep(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    rows.append(
                        {"clip_id": cid, **audio_scoring.cepstral_features(pcm, int(sr)),
                         "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "c0": None, "c1": None, "c2": None,
                         "flatness": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return (
        clips.generate_clips(spark, 200, 4)
        .mapInPandas(_cep, schema=CEPSTRAL_SCHEMA)
        .select(
            "clip_id",
            F.round(_nan_to_null("c0"), 6).alias("c0"),
            F.round(_nan_to_null("c1"), 6).alias("c1"),
            F.round(_nan_to_null("c2"), 6).alias("c2"),
            F.round(_nan_to_null("flatness"), 6).alias("flatness"),
            "decode_ok",
        )
        .orderBy("clip_id")
    )


def clip_windows(
    spark: SparkSession, sf_dir: str, window_ms: int = 500, min_tail_ms: int = 100
) -> DataFrame:
    """Fixed-size training-window segmentation plan per clip — how an ASR
    pipeline chunks long audio before featurization. Emits one row per
    window: ``floor(dur/window)`` full windows plus the tail iff it is at
    least ``min_tail_ms`` (a clip shorter than one window is always its own
    single window). Pure Catalyst arithmetic (``sequence`` + ``explode``) —
    no decode, no Python, no shuffle: the plan is a single whole-stage-
    codegen projection over (clip_id, dur_ms), so it runs at any scale as a
    narrow map. PCM slicing happens downstream in
    :func:`window_decode_stage`, which decodes once per clip and slices per
    window using the identical arithmetic.

    Reference analog: size-balanced chunking (SURVEY.md §2.6 O4) applied
    to the media timeline instead of the row count."""
    from ..synth import clips

    # NULL dur_ms → dur 0 → ONE zero-length window: same contract as
    # window_decode_stage's quarantine window. Without the coalesce,
    # NULL-ignoring greatest/least would fabricate a live 0-500ms window
    # for a clip whose duration is unknown (identically on both engines,
    # but semantically wrong and diverging from the decode stage).
    df = clips.generate_clips(spark, 200, 4).select(
        "clip_id", F.coalesce("dur_ms", F.lit(0)).alias("dur_ms")
    )
    k = F.floor(F.col("dur_ms") / F.lit(window_ms))
    tail = F.col("dur_ms") - k * window_ms
    n_win = F.greatest(
        F.lit(1), (k + F.when(tail >= min_tail_ms, 1).otherwise(0)).cast("int")
    )
    return (
        df.withColumn("n_windows", n_win)
        .select(
            "clip_id",
            "dur_ms",
            "n_windows",
            F.explode(F.sequence(F.lit(0), F.col("n_windows") - 1)).alias("win_idx"),
        )
        .select(
            "clip_id",
            "win_idx",
            (F.col("win_idx") * window_ms).cast("int").alias("start_ms"),
            F.least(F.col("win_idx") * window_ms + window_ms, F.col("dur_ms"))
            .cast("int")
            .alias("end_ms"),
            "n_windows",
        )
        .orderBy("clip_id", "win_idx")
    )


WINDOW_FEATURES_SCHEMA = (
    "clip_id string, win_idx int, start_ms int, end_ms int, n_windows int, "
    "rms_db double, silence_ratio double, decode_ok boolean"
)


def window_decode_stage(
    df: DataFrame, window_ms: int = 500, min_tail_ms: int = 100
) -> DataFrame:
    """Per-WINDOW audio features with one decode per CLIP: the window
    fan-out happens INSIDE the Arrow batch (decode once, slice the PCM per
    window, emit one small row per window) — bytes never duplicate across
    window rows and never shuffle. The window arithmetic is byte-identical
    to :func:`clip_windows` (full windows + qualifying tail)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..scoring import audio as audio_scoring

    cols = [f.split()[0] for f in WINDOW_FEATURES_SCHEMA.split(", ")]

    def _wins(dur_ms: int) -> list[tuple[int, int, int]]:
        k = dur_ms // window_ms
        tail = dur_ms - k * window_ms
        n = max(1, k + (1 if tail >= min_tail_ms else 0))
        return [(i, i * window_ms, min((i + 1) * window_ms, dur_ms)) for i in range(n)]

    def _stage(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, dur, cid in zip(
                pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["dur_ms"], pdf["clip_id"]
            ):
                # NULL dur_ms → one zero-length quarantine window (the
                # except path below iterates wins, so it must exist even
                # when the metadata itself is the malformed part)
                d = _opt_int(dur)
                wins = _wins(d) if d is not None else [(0, 0, 0)]
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    n = pcm.shape[0]
                    for i, s_ms, e_ms in wins:
                        s0 = min((s_ms * int(sr)) // 1000, n)
                        s1 = min((e_ms * int(sr)) // 1000, n)
                        seg = pcm[s0:s1]
                        if seg.shape[0]:
                            rms = float(np.sqrt(np.dot(seg, seg) / seg.shape[0]))
                            rms_db = 20.0 * np.log10(max(rms, 1e-6))
                            sil = float(np.count_nonzero(np.abs(seg) < 0.01) / seg.shape[0])
                        else:
                            rms_db, sil = -120.0, 1.0
                        rows.append(
                            {
                                "clip_id": cid,
                                "win_idx": i,
                                "start_ms": s_ms,
                                "end_ms": e_ms,
                                "n_windows": len(wins),
                                "rms_db": rms_db,
                                "silence_ratio": sil,
                                "decode_ok": True,
                            }
                        )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    for i, s_ms, e_ms in wins:
                        rows.append(
                            {
                                "clip_id": cid,
                                "win_idx": i,
                                "start_ms": s_ms,
                                "end_ms": e_ms,
                                "n_windows": len(wins),
                                "rms_db": None,
                                "silence_ratio": None,
                                "decode_ok": False,
                            }
                        )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_stage, schema=WINDOW_FEATURES_SCHEMA)


def window_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window features (rms/silence per window) — what actually
    feeds a curation rule like "drop windows that are pure silence". One
    decode per clip, window fan-out inside the batch; full oracle: the SQL
    side restricts the decoded sample index to each window's
    [start_sample, end_sample) range (audio_sql.window_decode_features_sql).

    Reference analog: parse fan-out (SURVEY.md §2.3 M4) applied to the
    media timeline."""
    from ..synth import clips

    df = clips.generate_clips(spark, 200, 4)
    return (
        window_decode_stage(df)
        .select(
            "clip_id",
            "win_idx",
            "start_ms",
            "end_ms",
            "n_windows",
            F.round("rms_db", 6).alias("rms_db"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            "decode_ok",
        )
        .orderBy("clip_id", "win_idx")
    )


def duration_batches(
    spark: SparkSession, sf_dir: str, max_batch_ms: int = 4000, n_ranges: int = 8
) -> DataFrame:
    """Duration-bucketed training-batch packing — the ASR-training step
    that groups similar-length clips into batches capped at a total
    duration, so pad-to-longest waste stays small. Clips are globally
    ordered by (dur_ms, clip_id) and assigned
    ``batch_id = floor(cum_before / max_batch_ms)`` (contiguous
    fixed-capacity packing); the output is one row per batch with its
    padding cost.

    Scale shape: a global running sum is NOT a single-partition window
    (the classic scale-killer) — it is the distributed prefix sum:
    ``repartitionByRange`` on the order keys → per-partition running sums
    (window PARTITIONED by spark_partition_id) → per-partition totals
    (one tiny row each) cumulated and broadcast back as offsets. Every
    stage is a narrow map or a bounded shuffle; no task ever sees more
    than its range slice.

    Reference analog: size-balanced chunking (SURVEY.md §2.6 O4,
    base_batch_request_processor partitioning) lifted to the media
    timeline."""
    from pyspark.sql import Window as W

    from ..synth import clips

    # NULL dur_ms → 0: Spark windows sort NULLS FIRST while DuckDB's
    # default is NULLS LAST, and cum_before/batch_id arithmetic over a
    # NULL would emit a NULL batch — coalescing at the source makes the
    # packing total order and the sums identical on both engines.
    df = clips.generate_clips(spark, 200, 4).select(
        "clip_id", F.coalesce("dur_ms", F.lit(0)).alias("dur_ms")
    )
    ranged = df.repartitionByRange(n_ranges, "dur_ms", "clip_id").withColumn(
        "pid", F.spark_partition_id()
    )
    local_w = W.partitionBy("pid").orderBy("dur_ms", "clip_id")
    local = ranged.withColumn("local_cum", F.sum("dur_ms").over(local_w))
    # per-partition totals: n_ranges rows — the offset table is broadcast
    off_w = W.orderBy("pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = (
        local.groupBy("pid")
        .agg(F.sum("dur_ms").alias("ptot"))
        .select("pid", F.coalesce(F.sum("ptot").over(off_w), F.lit(0)).alias("offset"))
    )
    assigned = (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("cum_before", F.col("local_cum") + F.col("offset") - F.col("dur_ms"))
        .withColumn("batch_id", F.floor(F.col("cum_before") / max_batch_ms).cast("int"))
    )
    return (
        assigned.groupBy("batch_id")
        .agg(
            F.count("*").cast("int").alias("n_clips"),
            F.sum("dur_ms").cast("bigint").alias("total_ms"),
            F.max("dur_ms").cast("int").alias("max_ms"),
            (F.max("dur_ms") * F.count("*") - F.sum("dur_ms"))
            .cast("bigint")
            .alias("padding_ms"),
        )
        .orderBy("batch_id")
    )


def audio_dup_groups(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3, max_iters: int = 20
) -> DataFrame:
    """Connected components over the audio near-dup graph →
    (group_id, clip_id, is_canonical) — completes the AUDIO dedup DAG the
    same way dup_groups/simhash_dup_groups complete the text families:
    fingerprint LSH → feature verify → components → canonical decision.
    group_id is the component's min clip_id, so the base clip (``clip_…``)
    always wins over its re-encode (``dup_clip_…``) and a curation filter
    is simply ``WHERE is_canonical``. Clips with no near-dup edge are
    singleton canonicals. Oracle: recursive transitive closure over the
    identical SQL-decoded pair CTE (audio_sql.audio_dup_groups_sql).

    Reference analog: content-identity dedup (llm/llm.py:139-164) lifted
    to the media payload."""
    from ..synth import clips
    from .dedup import _min_label_components

    # id universe only — audio_dup_pairs already pays the one decode pass;
    # synthesizing the clips a second time just to enumerate clip_ids
    # would double the fixture's waveform+encode cost
    ids = clips.near_dup_clip_ids(spark, *NEAR_DUP_FIXTURE)
    edges = _audio_dup_pair_edges(spark, sf_dir, max_hamming).select("clip_a", "clip_b")
    groups = _min_label_components(
        edges, "clip_a", "clip_b", "clip_id", max_iters, "audio_dup_groups"
    )
    return (
        ids
        .join(groups, "clip_id", "left")
        .select(
            F.coalesce("group_id", F.col("clip_id")).alias("group_id"),
            "clip_id",
            (F.coalesce("group_id", F.col("clip_id")) == F.col("clip_id")).alias("is_canonical"),
        )
        .orderBy("group_id", "clip_id")
    )


RESAMPLE_SCHEMA = (
    "clip_id string, sr_hz int, n_in long, n_out long, rms_db_out double, "
    "decode_ok boolean"
)


def audio_resample_stats(
    spark: SparkSession, sf_dir: str, target_hz: int = 8000
) -> DataFrame:
    """Sample-rate normalization — the audio 'resize' every mixed-corpus
    training pipeline runs before feature models: decode once per Arrow
    batch, nearest-neighbor resample to ``target_hz``
    (scoring/audio.resample_nn — pure integer index selection), emit the
    post-resample energy so a gain regression in the resampler is
    observable. One fused ``MapInPandas``; the PCM (original and
    resampled) never leaves the batch. Full oracle: the SQL side decodes
    the audio and re-selects the identical integer sample indices
    (audio_sql.audio_resample_stats_sql).

    Reference analog: media normalization before scoring (SURVEY §2.1 S9
    lifted to the sample-rate axis)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    df = clips.generate_clips(spark, 200, 4)
    cols = [f.split()[0] for f in RESAMPLE_SCHEMA.split(", ")]

    def _res(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                base = {"clip_id": cid, "sr_hz": _opt_int(sr)}
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    out = audio_scoring.resample_nn(pcm, int(sr), target_hz)
                    m = out.shape[0]
                    if m == 0:
                        rms_db = -120.0
                    else:
                        rms = float(np.sqrt(np.dot(out, out) / m))
                        rms_db = 20.0 * float(np.log10(max(rms, 1e-6)))
                    rows.append(
                        {
                            **base,
                            "n_in": int(pcm.shape[0]),
                            "n_out": int(m),
                            "rms_db_out": rms_db,
                            "decode_ok": True,
                        }
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {**base, "n_in": None, "n_out": None, "rms_db_out": None,
                         "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return (
        df.mapInPandas(_res, schema=RESAMPLE_SCHEMA)
        .withColumn("rms_db_out", F.round("rms_db_out", 6))
        .orderBy("clip_id")
    )


CMVN_COLS = ("rms_db", "silence_ratio", "clip_ratio")


def cmvn_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mean-variance normalization (CMVN) of the per-clip decode
    features — the classic speech-pipeline feature-normalization step
    (per-corpus z-score so downstream models see zero-mean/unit-variance
    inputs regardless of mastering levels).

    Two jobs: ONE decode pass → rounded per-clip features (persisted so
    the stats pass and the z-score pass share it), then a 7-scalar moment
    aggregate (count + per-feature sum / sum-of-squares as exact DECIMAL,
    so partition order can never perturb the moments) broadcast back into
    a pure-codegen z-score projection. At 10^12 clips the moment agg is a
    partial-aggregate tree over 3 decimals/row and the second pass is
    shuffle-free — CMVN costs one extra scan of the (bytes-free) feature
    frame, never a second decode. Full oracle: audio_sql.cmvn_features_sql
    decodes the audio in SQL and replays the identical moment arithmetic
    (double mean/std derived from the same exact decimal sums).

    Reference analog: generation-side batch normalization has no direct
    reference twin; this extends the audio scoring family
    (scoring/audio.py, S9) the way a training pipeline consumes it."""
    import math

    from .. import stages
    from ..synth import clips

    from pyspark import StorageLevel

    df = clips.generate_clips(spark, 200, 4)
    # persist, not localCheckpoint: cached blocks stay RECOMPUTABLE from
    # lineage if an executor dies mid-query (localCheckpoint truncates
    # lineage onto executor-local blocks — an executor loss then kills
    # the job unrecoverably at scale); the moment agg below materializes
    # it, so the z-score pass never re-decodes
    feats = (
        stages.decode_stage(df)
        .filter(F.col("decode_ok"))
        .select("clip_id", *[F.round(c, 6).alias(c) for c in CMVN_COLS])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from . import register_transient_persist

    register_transient_persist(spark, feats)  # freed by clear_session_cache
    aggs = [F.count("*").alias("n")]
    for c in CMVN_COLS:
        aggs.append(F.sum(F.col(c).cast("decimal(28,6)")).alias(f"s1_{c}"))
        # x² is not 6dp — round BEFORE the decimal cast so both engines
        # quantize identically (same trick as the rounded feature columns)
        aggs.append(
            F.sum(F.round(F.col(c) * F.col(c), 6).cast("decimal(28,6)")).alias(f"s2_{c}")
        )
    m = feats.agg(*aggs).head()
    n = int(m["n"] or 0)
    if n == 0:
        return feats.select(
            "clip_id", *[F.lit(0.0).alias(f"{c}_z") for c in CMVN_COLS]
        ).limit(0)
    cols = [F.col("clip_id")]
    for c in CMVN_COLS:
        mean = float(m[f"s1_{c}"]) / n
        var = max(float(m[f"s2_{c}"]) / n - mean * mean, 0.0)
        std = math.sqrt(var)
        if not std > 1e-12:  # constant feature: z := x - mean = 0
            std = 1.0
        cols.append(F.round((F.col(c) - F.lit(mean)) / F.lit(std), 6).alias(f"{c}_z"))
    return feats.select(*cols).orderBy("clip_id")


IMAGES_SCHEMA = "image_id long, fmt string, width int, height int, data binary"
IMAGE_FEATURES_SCHEMA = (
    "image_id long, fmt string, mean_lum double, contrast double, entropy double, "
    "edge_strength double, aspect double, thumb_bytes long, decode_ok boolean"
)


def generate_images(spark: SparkSession, n: int, n_partitions: int = 4) -> DataFrame:
    """Distributed synthetic image table (pure function of image_id —
    same driver-free seeding pattern as synth/clips.py)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..synth import imagegen

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame([imagegen.make_image(int(i)) for i in pdf["id"]])

    return spark.range(0, n, 1, n_partitions).mapInPandas(_gen, schema=IMAGES_SCHEMA)


def generate_images_with_near_dups(
    spark: SparkSession, n: int, every: int = 10, n_partitions: int = 4
) -> DataFrame:
    """Base images 0..n-1 plus a brightness-shifted other-format re-encode
    of every ``every``-th — the image twin of
    clips.generate_clips_with_near_dups (fixture in the data-generation
    layer; operators stay pure over their input)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..synth import imagegen

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rows.append(
                    imagegen.make_image(i) if i < n
                    else imagegen.near_dup_image((i - n) * every)
                )
            yield pd.DataFrame(rows)

    n_dups = len(range(0, n, every))
    return spark.range(0, n + n_dups, 1, n_partitions).mapInPandas(
        _gen, schema=IMAGES_SCHEMA
    )


IMAGE_FP_SCHEMA = (
    "image_id long, fmt string, width int, height int, "
    "b0 int, b1 int, b2 int, b3 int, mean_lum double, decode_ok boolean"
)


def image_fingerprint_stage(df: DataFrame) -> DataFrame:
    """Average-hash fingerprints + the verify features in ONE decode pass
    over the image binary column (the fused-stage house pattern: pixels
    decoded and dropped inside the Arrow batch; malformed rows
    quarantine). Emits the four 16-bit aHash block keys plus the
    dimensions/mean-luminance the near-dup verify compares."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import image as image_scoring

    cols = [f.split()[0] for f in IMAGE_FP_SCHEMA.split(", ")]

    def _fp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob, fmt, w, h, iid in zip(
                pdf["data"], pdf["fmt"], pdf["width"], pdf["height"], pdf["image_id"]
            ):
                base = {
                    "image_id": _opt_int(iid), "fmt": fmt,
                    "width": _opt_int(w), "height": _opt_int(h),
                }
                try:
                    px = image_scoring.decode(bytes(blob), fmt, int(w), int(h))
                    blocks = image_scoring.ahash64(px)
                    feat = image_scoring.features(px)
                    rows.append(
                        {**base,
                         **{f"b{j}": blocks[j] for j in range(4)},
                         "mean_lum": feat["mean_lum"], "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {**base, "b0": None, "b1": None, "b2": None, "b3": None,
                         "mean_lum": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_fp, schema=IMAGE_FP_SCHEMA)


IMAGE_DUP_FIXTURE = (200, 10, 4)  # (n base images, dup every k-th, partitions)


def image_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: aHash fingerprints over base + planted re-encodes.
    Full oracle: the SQL side decodes the pixels and replays the
    pure-integer cross-multiplied hash (image_sql._ahash_ctes) — the
    mean_lum output rounds to 6, but the BITS involve no floats at all.

    Reference analog: media-payload identity (SURVEY §2.6 O5 applied to
    S9's image modality)."""
    df = generate_images_with_near_dups(spark, *IMAGE_DUP_FIXTURE)
    return (
        image_fingerprint_stage(df)
        .select(
            "image_id", "fmt", "width", "height", "b0", "b1", "b2", "b3",
            F.round(_nan_to_null("mean_lum"), 6).alias("mean_lum"),
            "decode_ok",
        )
        .orderBy("image_id")
    )


def image_dup_pairs(spark: SparkSession, sf_dir: str, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs — the dedup family completed across the
    image modality (a brightness-shifted re-encode in a different
    container defeats byte digests; its block-luminance shape does not).

    Same LSH → verify composition as ``audio_dup_pairs``: fused decode →
    4 aHash block keys per image → explode to (band, key) → bucketed
    self-join (pigeonhole: candidate-complete at Hamming <= 3) → verify
    (EXACT same dimensions + mean luminance within 10 — measured: 20/20
    planted re-encodes kept, every cross-image collision pair differs in
    dimensions and dies) → popcount threshold → distinct. The verify
    compare uses the exact integer-derived mean_lum doubles, identical on
    both engines by construction."""
    df = generate_images_with_near_dups(spark, *IMAGE_DUP_FIXTURE)
    fp = image_fingerprint_stage(df).filter(F.col("decode_ok"))
    return _image_dup_pair_edges(fp, max_hamming)


def _image_dup_pair_edges(fp: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Band-bucket self-join + verify over a fingerprint frame — split
    out (like ``_audio_dup_pair_edges``) so tests can drive the pair
    logic over adversarial tables the seeded fixture never produces."""
    carry = ["b0", "b1", "b2", "b3", "width", "height", "mean_lum"]
    bands = fp.select(
        "image_id", *carry,
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("band"), F.col(f"b{j}").alias("key"))
                for j in range(4)
            ])
        ).alias("bk"),
    ).select("image_id", *carry, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{j}").bitwiseXOR(F.col(f"b.b{j}"))) for j in range(4)
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.image_id") < F.col("b.image_id"))
        .filter(
            (F.col("a.width") == F.col("b.width"))
            & (F.col("a.height") == F.col("b.height"))
            & (F.abs(F.col("a.mean_lum") - F.col("b.mean_lum")) <= 10.0)
        )
        .select(
            F.col("a.image_id").alias("img_a"),
            F.col("b.image_id").alias("img_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("img_a", "img_b")
    )


def image_decode_stage(df: DataFrame) -> DataFrame:
    """Batched decode + feature extraction for the image payload — the
    same binary-column pattern as the audio decode stage (decode once per
    Arrow batch, pixels dropped before anything shuffles, malformed or
    external-codec rows quarantined with ``decode_ok = false`` instead of
    failing the task). At table scale this sits behind the identical
    manifest-scan path the audio pipeline uses (manifest.py) so the bytes
    never cross the JVM→Python socket."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import image as img

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                # id/fmt read defensively BEFORE the try: the except path
                # must never raise on them or the quarantine guarantee
                # fails exactly where it matters
                rid = None if pd.isna(r.image_id) else int(r.image_id)
                rfmt = None if pd.isna(r.fmt) else str(r.fmt)
                try:
                    f = img.decode_features(bytes(r.data), rfmt, int(r.width), int(r.height))
                    rows.append(
                        {
                            "image_id": rid,
                            "fmt": rfmt,
                            **{k: f[k] for k in ("mean_lum", "contrast", "entropy", "edge_strength", "aspect")},
                            "thumb_bytes": int(f["thumb_bytes"]),
                            "decode_ok": True,
                        }
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {
                            "image_id": rid,
                            "fmt": rfmt,
                            "mean_lum": None,
                            "contrast": None,
                            "entropy": None,
                            "edge_strength": None,
                            "aspect": None,
                            "thumb_bytes": None,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.split()[0] for f in IMAGE_FEATURES_SCHEMA.split(", ")])

    return df.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)


def image_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second media modality under the driver gate — full value-hash oracle
    (scoring/image_sql.py decodes the pixels in SQL over the deterministic
    fixture; integer milli-luminance keeps both sides bit-identical).
    Parity vs the pure-numpy oracle and partitioning invariance live in
    tests/test_image.py. Proves the binary-column pattern extends beyond
    audio: real header-parsing decode (PPM P6 + raw RGB), feature
    extraction, resize, quarantine-not-fail."""
    imgs = generate_images(spark, 200)
    return (
        image_decode_stage(imgs)
        .select(
            "image_id",
            "fmt",
            F.round("mean_lum", 6).alias("mean_lum"),
            F.round("contrast", 6).alias("contrast"),
            F.round("entropy", 6).alias("entropy"),
            F.round("edge_strength", 6).alias("edge_strength"),
            F.round("aspect", 6).alias("aspect"),
            "thumb_bytes",
            "decode_ok",
        )
        .orderBy("image_id")
    )


VIDEOS_SCHEMA = (
    "video_id long, fmt string, width int, height int, n_frames int, fps int, data binary"
)
VIDEO_FEATURES_SCHEMA = (
    "video_id long, fmt string, frame_idx int, mean_lum double, motion double, "
    "is_cut boolean, decode_ok boolean"
)


def generate_videos(spark: SparkSession, n: int, n_partitions: int = 4) -> DataFrame:
    """Distributed synthetic video table (pure function of video_id —
    same driver-free seeding pattern as synth/clips.py)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..synth import videogen

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame([videogen.make_video(int(i)) for i in pdf["id"]])

    return spark.range(0, n, 1, n_partitions).mapInPandas(_gen, schema=VIDEOS_SCHEMA)


def generate_videos_with_near_dups(
    spark: SparkSession, n: int, every: int = 10, n_partitions: int = 4
) -> DataFrame:
    """Base videos 0..n-1 plus a brightness-shifted re-encode of every
    ``every``-th DECODABLE video (external-codec stub ids are skipped —
    their base is quarantined, so a twin would be a pairless singleton).
    Pure function of the range index, like the clips/images variants."""
    from collections.abc import Iterator

    import pandas as pd

    from ..synth import videogen

    plant = [i for i in range(0, n, every) if i % 9 != 5]

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < n:
                    rows.append(videogen.make_video(i))
                else:
                    rows.append(videogen.near_dup_video(plant[i - n]))
            yield pd.DataFrame(rows)

    return spark.range(0, n + len(plant), 1, n_partitions).mapInPandas(
        _gen, schema=VIDEOS_SCHEMA
    )


VIDEO_FP_SCHEMA = (
    "video_id long, fmt string, width int, height int, n_frames int, "
    "b0 int, b1 int, b2 int, b3 int, mean_lum double, decode_ok boolean"
)

VIDEO_DUP_FIXTURE = (60, 10, 4)  # (n base videos, dup every k-th, partitions)


def video_fingerprint_stage(df: DataFrame) -> DataFrame:
    """Slice-block fingerprints + verify features in ONE decode pass over
    the video binary column (fused-stage house pattern; malformed rows
    quarantine). Emits the four 16-bit vhash block keys plus the
    dims/frame-count/mean-luminance the near-dup verify compares."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import video as video_scoring

    cols = [f.split()[0] for f in VIDEO_FP_SCHEMA.split(", ")]

    def _fp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob, fmt, w, h, nf, fps_, vid in zip(
                pdf["data"], pdf["fmt"], pdf["width"], pdf["height"],
                pdf["n_frames"], pdf["fps"], pdf["video_id"],
            ):
                base = {"video_id": _opt_int(vid), "fmt": fmt,
                        "width": _opt_int(w), "height": _opt_int(h),
                        "n_frames": _opt_int(nf)}
                try:
                    fr = video_scoring.decode(
                        bytes(blob), fmt, int(w), int(h), int(nf), int(fps_)
                    )
                    blocks = video_scoring.vhash64(fr)
                    v = fr.astype("int64")
                    mean_lum = int(v.sum()) / v.size  # exact ints → exact double
                    rows.append(
                        {**base, **{f"b{j}": blocks[j] for j in range(4)},
                         "mean_lum": mean_lum, "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {**base, "b0": None, "b1": None, "b2": None, "b3": None,
                         "mean_lum": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_fp, schema=VIDEO_FP_SCHEMA)


def video_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: slice-block vhash fingerprints over base + planted
    re-encodes. Full oracle: the SQL side decodes the frames and replays
    the pure-integer hash (video_sql._vhash_ctes).

    Reference analog: media-payload identity (SURVEY §2.6 O5 applied to
    S9's video modality)."""
    df = generate_videos_with_near_dups(spark, *VIDEO_DUP_FIXTURE)
    return (
        video_fingerprint_stage(df)
        .select(
            "video_id", "fmt", "width", "height", "n_frames",
            "b0", "b1", "b2", "b3",
            F.round(_nan_to_null("mean_lum"), 6).alias("mean_lum"),
            "decode_ok",
        )
        .orderBy("video_id")
    )


def video_dup_pairs(spark: SparkSession, sf_dir: str, max_hamming: int = 3) -> DataFrame:
    """Video near-duplicate pairs — the dedup family completed across the
    LAST modality (a re-encoded, exposure-shifted copy of the same
    recording defeats byte digests; its slice-block luminance shape does
    not). Same LSH → verify composition as the audio/image twins: fused
    decode → 4 vhash block keys → explode to (band, key) → bucketed
    self-join (pigeonhole-complete at Hamming <= 3) → verify (EXACT same
    dims AND frame count + mean luminance within 10 — measured: every
    planted twin kept at Hamming 0, every cross-video collision differs
    in shape and dies) → popcount threshold → distinct."""
    df = generate_videos_with_near_dups(spark, *VIDEO_DUP_FIXTURE)
    fp = video_fingerprint_stage(df).filter(F.col("decode_ok"))
    return _video_dup_pair_edges(fp, max_hamming)


def _video_dup_pair_edges(fp: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Band-bucket self-join + verify over a video fingerprint frame —
    split out (like ``_audio_dup_pair_edges``) so tests can drive the
    pair logic over adversarial tables the seeded fixture never
    produces."""
    carry = ["b0", "b1", "b2", "b3", "width", "height", "n_frames", "mean_lum"]
    bands = fp.select(
        "video_id", *carry,
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("band"), F.col(f"b{j}").alias("key"))
                for j in range(4)
            ])
        ).alias("bk"),
    ).select("video_id", *carry, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    ham = sum(
        F.bit_count(F.col(f"a.b{j}").bitwiseXOR(F.col(f"b.b{j}"))) for j in range(4)
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("a.video_id") < F.col("b.video_id"))
        .filter(
            (F.col("a.width") == F.col("b.width"))
            & (F.col("a.height") == F.col("b.height"))
            & (F.col("a.n_frames") == F.col("b.n_frames"))
            & (F.abs(F.col("a.mean_lum") - F.col("b.mean_lum")) <= 10.0)
        )
        .select(
            F.col("a.video_id").alias("vid_a"),
            F.col("b.video_id").alias("vid_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("vid_a", "vid_b")
    )


def video_decode_stage(df: DataFrame, sample_every: int = 2) -> DataFrame:
    """Batched decode + frame-sample + per-frame features for the video
    payload — the third face of the binary-column pattern (decode once per
    Arrow batch, frames dropped before anything shuffles, undecodable
    codecs quarantined with ``decode_ok = false``). Fan-out stage: one
    input row → one row per SAMPLED frame (or one quarantine row), the
    video analog of the parse flatMap (SURVEY §2.2 M4) fused with decode
    so the bytes cross the Arrow socket exactly once."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import video as vid

    cols = [f.split()[0] for f in VIDEO_FEATURES_SCHEMA.split(", ")]

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                rid = None if pd.isna(r.video_id) else int(r.video_id)
                rfmt = None if pd.isna(r.fmt) else str(r.fmt)
                try:
                    feats = vid.decode_features(
                        bytes(r.data), rfmt, int(r.width), int(r.height),
                        int(r.n_frames), sample_every, fps=int(r.fps),
                    )
                    rows.extend(
                        {"video_id": rid, "fmt": rfmt, **f, "decode_ok": True}
                        for f in feats
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics: any
                    # malformed-payload failure (incl. OverflowError from an
                    # absurd header) emits a decode_ok=false row, never fails
                    # the task — same contract as the audio stages
                    rows.append(
                        {
                            "video_id": rid,
                            "fmt": rfmt,
                            "frame_idx": None,
                            "mean_lum": None,
                            "motion": None,
                            # False, not NULL: a nullable boolean hashes
                            # differently across engines (None vs NaN);
                            # decode_ok already marks quarantine rows
                            "is_cut": False,
                            "decode_ok": False,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_decode, schema=VIDEO_FEATURES_SCHEMA)


def video_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third media modality under the driver gate — full value-hash oracle
    (scoring/video_sql.py decodes the frames in SQL over the deterministic
    fixture; exact integer sums keep both sides bit-identical). Covers the
    frame-sampling + per-frame feature + scene-cut pass a vision training
    pipeline runs before its models, with real header-parsing decode and
    quarantine-not-fail for external codecs (the ``h264`` stub rows)."""
    vids = generate_videos(spark, 60)
    return (
        video_decode_stage(vids)
        .select(
            "video_id",
            "fmt",
            "frame_idx",
            F.round("mean_lum", 6).alias("mean_lum"),
            F.round("motion", 6).alias("motion"),
            "is_cut",
            "decode_ok",
        )
        .orderBy("video_id", "frame_idx")
    )


MM_FEATURES_SCHEMA = (
    "row_id string, n_chars int, n_words int, rms_db double, silence_ratio double, "
    "mean_lum double, contrast double, audio_ok boolean, image_ok boolean"
)


def multimodal_row_stage(df: DataFrame) -> DataFrame:
    """Fused decode stage over MIXED-MODALITY rows — the reference's
    ``_MultiModalPrompt`` shape (types/prompt.py:12-117: texts + images +
    files in ONE payload,
    base_online_request_processor.py:114-166) as a single Arrow pass:
    each row carries transcript + audio bytes + image bytes, and BOTH
    binary payloads decode inside the same ``mapInPandas`` batch, so the
    media crosses the JVM→Python socket exactly once per row.

    Per-MODALITY quarantine: a row whose audio codec needs an external
    decoder still yields its image features (``audio_ok=false,
    image_ok=true``) and vice versa — modal failures are independent,
    never row-fatal, never task-fatal. Text features (n_chars/n_words)
    are computed in Catalyst BEFORE this stage and carried through, so
    the transcript string itself never enters the Python worker."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..scoring import image as image_scoring

    cols = [f.split()[0] for f in MM_FEATURES_SCHEMA.split(", ")]

    def _fused(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                out = {
                    "row_id": r.row_id,
                    "n_chars": None if pd.isna(r.n_chars) else int(r.n_chars),
                    "n_words": None if pd.isna(r.n_words) else int(r.n_words),
                }
                try:
                    pcm = audio_scoring.decode(bytes(r.bytes), str(r.codec), int(r.sr_hz))
                    f = audio_scoring.features(pcm, int(r.sr_hz), int(r.dur_ms))
                    out.update(
                        rms_db=f["rms_db"],
                        silence_ratio=f["silence_ratio"],
                        audio_ok=True,
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    out.update(
                        rms_db=float("nan"), silence_ratio=1.0, audio_ok=False
                    )
                try:
                    f = image_scoring.decode_features(
                        bytes(r.image), str(r.img_fmt), int(r.width), int(r.height)
                    )
                    out.update(
                        mean_lum=f["mean_lum"],
                        contrast=f["contrast"],
                        image_ok=True,
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    out.update(mean_lum=None, contrast=None, image_ok=False)
                rows.append(out)
            yield pd.DataFrame(rows, columns=cols)

    withtext = df.select(
        "row_id",
        F.length(F.coalesce("transcript", F.lit(""))).cast("int").alias("n_chars"),
        F.size(
            F.filter(
                F.split(F.coalesce("transcript", F.lit("")), " ", -1),
                lambda w: w != F.lit(""),
            )
        ).cast("int").alias("n_words"),
        "bytes", "sr_hz", "dur_ms", "codec",
        "image", "img_fmt", "width", "height",
    )
    return withtext.mapInPandas(_fused, schema=MM_FEATURES_SCHEMA)


def multimodal_row_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query for the mixed-modality row op (round-3 VERDICT task #2):
    one table carrying transcript + audio + image per row, one fused
    decode stage emitting features from all three modalities. Full
    value-hash oracle: scoring/mm_sql.py composes the proven audio PCM
    decode (audio_sql) with the integer milli-luminance pixel decode
    (image_sql) over the deterministic fixture. The fixture's seeded
    external-codec rows (synth/mmrows.py) exercise the per-modality
    quarantine AT the gate."""
    from ..synth import mmrows

    df = mmrows.generate_mm_rows(spark, 200, 4)
    feats = multimodal_row_stage(df)
    # rounding stays JVM-side (F.round, matching the oracle's SQL round)
    # — Python's banker's round would diverge on exact .5 boundaries
    return feats.select(
        "row_id", "n_chars", "n_words",
        F.round("rms_db", 6).alias("rms_db"),
        F.round("silence_ratio", 6).alias("silence_ratio"),
        F.round("mean_lum", 6).alias("mean_lum"),
        F.round("contrast", 6).alias("contrast"),
        "audio_ok", "image_ok",
    ).orderBy("row_id")


# multimodal keep/drop rule set: (predicate over the fused features,
# reason tag). Order is the reasons-string order on both engines.
MM_RULES_DOC = """audio_decode | image_decode | words_min (n_words<5) |
silence (silence_ratio>0.6) | quiet (rms_db<-35) | flat_image (contrast<10)"""


def mm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop decision over MIXED-MODALITY rows — the quality-filter
    face (F4) of the `_MultiModalPrompt` family: a row survives only if
    every modality decoded AND passes its quality rule (text length,
    audio silence/level, image flatness). Emits the audit-friendly
    (row_id, keep, reasons) shape the reference's keep/drop idiom uses
    (doc_quality_filter is the text-only twin).

    All rules are pure Catalyst over the fused stage's output — one
    MapInPandas (the decode), then codegen predicates. Threshold
    comparisons happen on the SAME round(x, 6) values on both engines,
    so boundary behavior is identical by construction. Quarantined
    modalities short-circuit their feature rules (audio_ok/image_ok
    guards — a NULL feature never reaches a comparison that could
    diverge)."""
    from ..synth import mmrows

    feats = multimodal_row_stage(mmrows.generate_mm_rows(spark, 200, 4))
    r = [
        (~F.col("audio_ok"), "audio_decode"),
        (~F.col("image_ok"), "image_decode"),
        (F.col("n_words") < 5, "words_min"),
        (F.col("audio_ok") & (F.round("silence_ratio", 6) > 0.6), "silence"),
        (F.col("audio_ok") & (F.round("rms_db", 6) < -35.0), "quiet"),
        (F.col("image_ok") & (F.round("contrast", 6) < 10.0), "flat_image"),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(tag)) for cond, tag in r]),
        lambda x: x.isNotNull(),
    )
    return (
        feats.select(
            "row_id",
            (F.size(reasons) == 0).alias("keep"),
            F.concat_ws("|", reasons).alias("reasons"),
        )
        .orderBy("row_id")
    )


AUDIO_QF_SCHEMA = (
    "clip_id string, snr_db double, kept_ms int, n_frames int, "
    "r100 double, r300 double, r700 double, r1500 double, decode_ok boolean"
)

# audio keep/drop rule set (reasons-string order on both engines):
AUDIO_QF_RULES_DOC = """decode | snr_low (snr_db NULL or <5dB) |
mostly_silence (active span <60% of clip) | high_band (dominant 1500Hz)"""


def audio_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop decision over AUDIO-ONLY quality features — the F4 face
    of the audio family, composing the three feature ops this round added
    (decile SNR, trim bounds, spectral band ratios) into one decision:
    a clip survives only if it decoded, its SNR clears 5 dB, its active
    span covers >=60% of the clip, and its spectrum is not hiss-dominant
    (1500 Hz probe band). Emits the audit-friendly (clip_id, keep,
    reasons) shape (`mm_quality_filter` is the mixed-modality twin,
    `doc_quality_filter` the text twin).

    ONE fused decode ``MapInPandas`` computes all nine features per clip
    (the 20 ms frame energies are shared by the SNR and trim rules);
    every threshold compares 6-decimal-ROUNDED doubles or pure integers
    (``kept_ms·10 < n_frames·120`` ⇔ active span < 60%), so the engines
    cannot diverge at boundaries. Full oracle: one SQL chain reusing the
    proven frame/decile/DFT pieces (audio_sql.audio_quality_filter_sql).

    Reference analog: quality keep/drop filter (SURVEY.md §2.3 F4)."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import clips

    cols = [f.split()[0] for f in AUDIO_QF_SCHEMA.split(", ")]

    def _feats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for b, c, sr, cid in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["clip_id"]):
                try:
                    pcm = audio_scoring.decode(bytes(b), c, int(sr))
                    s = audio_scoring.snr_stats(pcm, int(sr))
                    t = audio_scoring.trim_bounds(pcm, int(sr))
                    r = audio_scoring.band_ratios(pcm, int(sr))
                    rows.append(
                        {"clip_id": cid, "snr_db": s["snr_db"],
                         "kept_ms": t["kept_ms"], "n_frames": t["n_frames"],
                         **r, "decode_ok": True}
                    )
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append(
                        {"clip_id": cid, "snr_db": None, "kept_ms": None,
                         "n_frames": None, "r100": None, "r300": None,
                         "r700": None, "r1500": None, "decode_ok": False}
                    )
            yield pd.DataFrame(rows, columns=cols)

    feats = (
        clips.generate_clips(spark, 200, 4)
        .mapInPandas(_feats, schema=AUDIO_QF_SCHEMA)
        .select(
            "clip_id",
            F.round(_nan_to_null("snr_db"), 6).alias("snr_db"),
            "kept_ms", "n_frames",
            F.round(_nan_to_null("r100"), 6).alias("r100"),
            F.round(_nan_to_null("r300"), 6).alias("r300"),
            F.round(_nan_to_null("r700"), 6).alias("r700"),
            F.round(_nan_to_null("r1500"), 6).alias("r1500"),
            "decode_ok",
        )
    )
    r1, r2, r3, r4 = (F.col(c) for c in ("r100", "r300", "r700", "r1500"))
    dominant = F.when(
        r1.isNotNull(),
        F.when((r1 >= r2) & (r1 >= r3) & (r1 >= r4), F.lit(100))
        .when((r2 >= r3) & (r2 >= r4), F.lit(300))
        .when(r3 >= r4, F.lit(700))
        .otherwise(F.lit(1500)),
    )
    ok = F.col("decode_ok")
    rules = [
        (~ok, "decode"),
        (ok & (F.col("snr_db").isNull() | (F.col("snr_db") < 5.0)), "snr_low"),
        (ok & (F.col("kept_ms") * 10 < F.col("n_frames") * 120), "mostly_silence"),
        (ok & (dominant == 1500), "high_band"),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(tag)) for cond, tag in rules]),
        lambda x: x.isNotNull(),
    )
    return (
        feats.select(
            "clip_id",
            (F.size(reasons) == 0).alias("keep"),
            F.concat_ws("|", reasons).alias("reasons"),
        )
        .orderBy("clip_id")
    )


def pii_scrub_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standalone PII/toxicity scrub over the clip transcripts — the
    north rule's "compiled-regex PII/toxicity scrubbing" surfaced as a
    first-class audit query instead of a hidden pipeline stage: per clip,
    the fully scrubbed transcript plus WHICH pattern fired how often
    (email/ssn/phone/tox). Pure Catalyst ``regexp_replace`` chain
    (stages.scrub_detail_stage) — zero Python in the hot path; the only
    exchange is the output ordering. Full value-hash oracle: the DuckDB
    side replays the identical chain with RE2 ``regexp_replace(...,'g')``
    + ``regexp_extract_all`` counts (scoring/pipeline_sql.py), so the
    scrubbed STRING itself is hash-compared per row — stronger than the
    flagship's rolled-up hit totals.

    Reference analog: per-row transform + structured audit output
    (SURVEY.md §2.2 M7, §2.5 A5)."""
    from .. import stages
    from ..synth import clips

    df = clips.generate_clips(spark, 300, 4).select("clip_id", "transcript")
    return (
        stages.scrub_detail_stage(df)
        .select(
            "clip_id", "scrubbed_transcript",
            "email_hits", "ssn_hits", "phone_hits", "tox_hits",
        )
        .orderBy("clip_id")
    )


def clip_keep_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete north-rule DAG (decode -> langid+ppl -> rules -> scrub
    -> keep/drop) over a deterministic seeded clip batch, rolled up per
    (lang, keep). Full value-hash oracle: scoring/pipeline_sql.py replays
    the ENTIRE DAG in DuckDB (audio decode, langid/LM weights, scrub
    chain, rules) — plus per-clip label parity vs the pure-Python oracle
    in tests/test_scoring_core.py and tests/test_stage_parity.py."""
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


AUGMENT_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, achieved_snr_db double, post_mix_clip_ratio double, "
    "decode_ok boolean"
)


def augment_mix_stage(df: DataFrame, target_snr_db: float = 20.0) -> DataFrame:
    """Noise augmentation at a target SNR over the clip table — emits rows
    in the SAME schema the curation pipeline ingests (clip_id suffixed
    ``_aug``, mixed audio re-encoded PCM16 WAV, transcript carried), so the
    augmented corpus feeds the identical decode→score→rules DAG
    downstream (asserted in tests/test_multimodal_row.py). One fused
    MapInPandas: decode + seeded noise + re-encode inside the Arrow batch —
    bytes cross the socket once each way, nothing fans out. The noise is
    a pure function of clip_id (scoring/audio.mix_noise_at_snr), so the
    augmentation is deterministic under any partitioning or resume.
    Malformed payloads quarantine (decode_ok=false, bytes=NULL) like every
    other media stage.

    Reference analog: the media-payload transform face of M6
    (SURVEY.md §2.2) — the reference transports payloads
    (types/prompt.py:21-103); a training pipeline also perturbs them."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import audiogen

    cols = [f.split()[0] for f in AUGMENT_SCHEMA.split(", ")]

    def _aug(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                base = {
                    "clip_id": f"{r.clip_id}_aug",
                    "sr_hz": _opt_int(r.sr_hz),
                    "dur_ms": _opt_int(r.dur_ms),
                    "codec": "pcm_s16le",
                    "transcript": r.transcript,
                }
                try:
                    pcm = audio_scoring.decode(bytes(r.bytes), r.codec, int(r.sr_hz))
                    mixed, stats = audio_scoring.mix_noise_at_snr(
                        pcm, str(r.clip_id), target_snr_db
                    )
                    rows.append({
                        **base,
                        "bytes": audiogen.pcm16_to_wav(mixed, int(r.sr_hz)),
                        "achieved_snr_db": stats["achieved_snr_db"],
                        "post_mix_clip_ratio": stats["post_mix_clip_ratio"],
                        "decode_ok": True,
                    })
                except Exception:  # noqa: BLE001 - quarantine semantics
                    rows.append({
                        **base,
                        "bytes": None,
                        "achieved_snr_db": None,
                        "post_mix_clip_ratio": None,
                        "decode_ok": False,
                    })
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_aug, schema=AUGMENT_SCHEMA)


def speed_perturb_stage(
    df: DataFrame, factors: tuple[tuple[int, int], ...] = ((9, 10), (11, 10))
) -> DataFrame:
    """Speed perturbation — the other standard speech augmentation
    (Kaldi's 0.9x/1.1x staple): each clip re-emitted once per factor,
    resampled by the EXACT integer ratio p/q (``resample_nn`` index
    selection — speed p/q at an unchanged sample rate is precisely a
    p→q resample of the sample sequence), so the augmented waveform is a
    deterministic pure function of the input with no float resampling
    kernel to disagree about. Output rows use the input schema
    (clip_id suffixed ``_sp<p><q>``, PCM16 WAV, dur_ms rescaled), so the
    perturbed corpus feeds the same curation DAG, like
    :func:`augment_mix_stage`. One fused MapInPandas; quarantine
    semantics as everywhere."""
    from collections.abc import Iterator

    import pandas as pd

    from ..scoring import audio as audio_scoring
    from ..synth import audiogen

    cols = [f.split()[0] for f in AUGMENT_SCHEMA.split(", ")]

    def _sp(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                for p, q in factors:
                    base = {
                        "clip_id": f"{r.clip_id}_sp{p}{q}",
                        "sr_hz": _opt_int(r.sr_hz),
                        "codec": "pcm_s16le",
                        "transcript": r.transcript,
                    }
                    try:
                        pcm = audio_scoring.decode(bytes(r.bytes), r.codec, int(r.sr_hz))
                        out = audio_scoring.resample_nn(pcm, p, q)
                        n_out = int(out.shape[0])
                        rows.append({
                            **base,
                            "bytes": audiogen.pcm16_to_wav(out, int(r.sr_hz)),
                            "dur_ms": round(n_out * 1000 / int(r.sr_hz)),
                            "achieved_snr_db": None,   # no noise added
                            "post_mix_clip_ratio": float(
                                (abs(out) > audio_scoring.CLIP_AMPLITUDE).sum() / n_out
                            ) if n_out else 0.0,
                            "decode_ok": True,
                        })
                    except Exception:  # noqa: BLE001 - quarantine semantics
                        rows.append({
                            **base,
                            "bytes": None,
                            "dur_ms": _opt_int(r.dur_ms),
                            "achieved_snr_db": None,
                            "post_mix_clip_ratio": None,
                            "decode_ok": False,
                        })
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(_sp, schema=AUGMENT_SCHEMA)
