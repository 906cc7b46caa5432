"""Spark-stage vs DuckDB-oracle parity on ADVERSARIAL rows the seeded
fixtures never contain: NULL sr_hz, NULL dur_ms, empty payloads, NULL
payloads. The gate fixtures are fully healthy, so these input classes are
exactly where the two engines could silently drift apart — every Spark
audio kernel quarantines on ``int(sr_hz)`` (and the features path on
``int(dur_ms)``), and the SQL oracles must reproduce that decode_ok
boundary plus the zero-sample feature constants."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from curator_spark import stages
from curator_spark.ops import multimodal
from curator_spark.scoring import audio_sql
from curator_spark.synth import clips


@pytest.fixture(scope="module")
def adversarial_path(tmp_path_factory):
    base = clips.clips_pandas(8)
    pdf = base.copy()
    # find one decodable payload per codec to clone into poisoned rows
    ulaw_i = next(i for i in range(len(pdf)) if pdf["codec"][i] == "ulaw")
    # row poisons (metadata NULLs keep an otherwise-decodable payload so
    # the quarantine decision is driven by the metadata alone)
    pdf.loc[2, "codec"] = "ulaw"
    pdf.loc[2, "bytes"] = pdf["bytes"][ulaw_i]
    pdf.loc[2, "sr_hz"] = None          # NULL sample rate
    pdf.loc[3, "dur_ms"] = None         # NULL duration
    pdf.loc[4, "codec"] = "ulaw"
    pdf.loc[4, "bytes"] = b""           # EMPTY payload: decodes to 0 samples
    pdf.loc[5, "bytes"] = None          # NULL payload
    pdf["sr_hz"] = pdf["sr_hz"].astype("Int32")
    pdf["dur_ms"] = pdf["dur_ms"].astype("Int32")
    path = str(tmp_path_factory.mktemp("adv") / "clips.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return path


def _vals_equal(a, b) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a))
    b_null = b is None or (isinstance(b, float) and math.isnan(b))
    if a_null or b_null:
        # decode-failure rows: Spark NaN ≙ oracle NaN, Spark None ≙ NULL;
        # NaN-vs-None is NOT equal (the features path uses NaN, the other
        # kernels use NULL — the oracle must match each exactly)
        return (
            (a is None and b is None)
            or (a_null and b_null and not (a is None or b is None))
        )
    if isinstance(a, float) or isinstance(b, float):
        return abs(float(a) - float(b)) < 1e-9
    return a == b


def _assert_frames_match(spark_pdf, oracle_pdf, keys):
    spark_pdf = spark_pdf.sort_values(keys).reset_index(drop=True)
    oracle_pdf = oracle_pdf.sort_values(keys).reset_index(drop=True)
    assert list(spark_pdf.columns) == list(oracle_pdf.columns)
    assert len(spark_pdf) == len(oracle_pdf)
    for col in spark_pdf.columns:
        # boolean-typed columns have no NaN value — a NULL bool surfaces
        # as None (Spark object col) or NaN (duckdb float col) depending
        # on the engine's pandas conversion; normalize BOTH to None. For
        # float feature columns NaN stays distinct from None (the
        # features path genuinely emits NaN, the others NULL).
        is_boolish = any(
            str(f[col].dtype) in ("object", "bool", "boolean")
            for f in (spark_pdf, oracle_pdf)
            if not col.startswith("clip_id")
        ) and not col.startswith("clip_id")
        for i in range(len(spark_pdf)):
            a = spark_pdf[col][i]
            b = oracle_pdf[col][i]
            a = a.item() if hasattr(a, "item") else a
            b = b.item() if hasattr(b, "item") else b
            if a is pd.NA or (is_boolish and isinstance(a, float) and pd.isna(a)):
                a = None
            if b is pd.NA or (is_boolish and isinstance(b, float) and pd.isna(b)):
                b = None
            assert _vals_equal(a, b), (col, i, a, b, spark_pdf[col].tolist(), oracle_pdf[col].tolist())


def test_decode_features_parity_on_adversarial_rows(spark, adversarial_path):
    """decode_stage quarantines NULL sr_hz AND NULL dur_ms (int() inside
    the try); the oracle's decode_ok must draw the identical boundary and
    use the zero-sample constants for the empty-payload clip."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(adversarial_path)
    got = (
        stages.decode_stage(df)
        .select(
            "clip_id",
            "codec",
            F.round("rms_db", 6).alias("rms_db"),
            F.round("silence_ratio", 6).alias("silence_ratio"),
            F.round("clip_ratio", 6).alias("clip_ratio"),
            "decode_ok",
        )
        .toPandas()
    )
    want = duckdb.sql(audio_sql.audio_decode_features_sql(adversarial_path)).df()
    _assert_frames_match(got, want, ["clip_id"])
    by_id = got.set_index("clip_id")
    assert not by_id.loc["clip_000000000002", "decode_ok"]  # NULL sr
    assert not by_id.loc["clip_000000000003", "decode_ok"]  # NULL dur
    assert by_id.loc["clip_000000000004", "decode_ok"]      # empty payload
    assert by_id.loc["clip_000000000004", "rms_db"] == -120.0
    assert not by_id.loc["clip_000000000005", "decode_ok"]  # NULL payload


def test_loudness_parity_on_adversarial_rows(spark, adversarial_path):
    """loudness_stage never touches dur_ms, so NULL dur stays decode_ok;
    NULL sr quarantines; the empty-payload clip gets the n==0 constants
    (-120 dB rms, target+120 gain) on BOTH engines."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(adversarial_path)
    got = (
        multimodal.loudness_stage(df)
        .select(
            "clip_id",
            F.round("rms_db", 6).alias("rms_db"),
            F.round("gain_db", 6).alias("gain_db"),
            F.round("post_gain_clip_ratio", 6).alias("post_gain_clip_ratio"),
            "decode_ok",
        )
        .toPandas()
    )
    want = duckdb.sql(audio_sql.loudness_normalize_sql(adversarial_path)).df()
    _assert_frames_match(got, want, ["clip_id"])
    by_id = got.set_index("clip_id")
    assert not by_id.loc["clip_000000000002", "decode_ok"]  # NULL sr
    assert by_id.loc["clip_000000000003", "decode_ok"]      # NULL dur: unused here
    row4 = by_id.loc["clip_000000000004"]                   # empty payload
    assert row4["decode_ok"] and row4["rms_db"] == -120.0 and row4["gain_db"] == 100.0


def test_window_decode_parity_on_adversarial_rows(spark, adversarial_path):
    """window_decode_stage maps NULL dur_ms to ONE zero-length window; the
    oracle's COALESCE(dur_ms, 0) must reproduce that exactly instead of
    fabricating a live 0-500ms window via NULL-ignoring LEAST/GREATEST."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(adversarial_path)
    got = (
        multimodal.window_decode_stage(df)
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
        .toPandas()
    )
    want = duckdb.sql(audio_sql.window_decode_features_sql(adversarial_path)).df()
    _assert_frames_match(got, want, ["clip_id", "win_idx"])
    nulldur = got[got["clip_id"] == "clip_000000000003"]
    assert len(nulldur) == 1  # exactly one zero-length window
    r = nulldur.iloc[0]
    assert (r["start_ms"], r["end_ms"], r["n_windows"]) == (0, 0, 1)
    assert bool(r["decode_ok"]) and r["rms_db"] == -120.0 and r["silence_ratio"] == 1.0


def _write_tiny_images(tmp_path_factory):
    """Two 2x2 images whose aHash bands 1 and 3 are structurally EMPTY
    (height < 8 leaves 8x8-grid rows unused) and whose non-empty band
    keys DIFFER — the pair is discoverable ONLY through the empty bands'
    shared key 0, and the packed fingerprint must show b1 = b3 = 0 (not
    NULL) on both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def px(hot_rc):
        a = np.full((2, 2, 3), 100, dtype=np.uint8)
        a[hot_rc[0], hot_rc[1], :] = 220
        return a

    rows = [
        {"image_id": 1, "fmt": "rgb8_raw", "width": 2, "height": 2,
         "data": px((0, 0)).tobytes()},
        {"image_id": 2, "fmt": "rgb8_raw", "width": 2, "height": 2,
         "data": px((1, 0)).tobytes()},
    ]
    path = str(tmp_path_factory.mktemp("tinyimg") / "images.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False), path)
    return path


def test_image_fingerprint_empty_bands_pack_zero(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from curator_spark.scoring import image_sql

    path = _write_tiny_images(tmp_path_factory)
    df = spark.read.parquet(path)
    fp = multimodal.image_fingerprint_stage(df)
    got = (
        fp.select(
            "image_id", "fmt", "width", "height", "b0", "b1", "b2", "b3",
            F.round("mean_lum", 6).alias("mean_lum"), "decode_ok",
        )
        .toPandas()
    )
    want = duckdb.sql(image_sql.image_fingerprints_sql(path)).df()
    _assert_frames_match(got, want, ["image_id"])
    by_id = got.set_index("image_id")
    # empty bands pack 0 (NULL would poison hamming / drop candidates)
    assert (by_id.loc[1, ["b1", "b3"]] == 0).all()
    assert by_id.loc[1, "b0"] != by_id.loc[2, "b0"]  # non-empty bands differ

    # the pair is found ONLY via the empty bands' key-0 buckets — on the
    # Spark op AND the oracle (the old sparse-blocks candidate join had
    # no rows for empty bands and silently missed it)
    spark_pairs = (
        multimodal._image_dup_pair_edges(fp.filter(F.col("decode_ok")))
        .toPandas()
    )
    oracle_pairs = duckdb.sql(image_sql.image_dup_pairs_sql(path)).df()
    assert len(spark_pairs) == 1 and len(oracle_pairs) == 1
    assert (
        int(spark_pairs["hamming"][0]) == int(oracle_pairs["hamming"][0]) == 2
    )


def test_video_fingerprint_empty_bands_pack_zero(spark, tmp_path_factory):
    """Video twin: 2-frame clips leave time slices 2,3,6,7 empty → vhash
    bands 1 and 3 empty; same discovery-only-via-empty-bands shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from curator_spark.scoring import video_sql
    from curator_spark.synth import videogen

    def clip(hot):
        frames = np.full((2, 8, 8), 100, dtype=np.uint8)
        f, r0, c0 = hot
        frames[f, r0 : r0 + 4, c0 : c0 + 2] = 220  # one 4x2 spatial block
        return frames

    rows = []
    for vid, hot in ((1, (0, 0, 0)), (2, (1, 0, 0))):
        frames = clip(hot)
        rows.append(
            {"video_id": vid, "fmt": "gray8_seq", "width": 8, "height": 8,
             "n_frames": 2, "fps": videogen.FPS,
             "data": videogen.encode_gray8_seq(frames)}
        )
    path = str(tmp_path_factory.mktemp("tinyvid") / "videos.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False), path)

    df = spark.read.parquet(path)
    fp = multimodal.video_fingerprint_stage(df)
    got = (
        fp.select(
            "video_id", "fmt", "width", "height", "n_frames",
            "b0", "b1", "b2", "b3",
            F.round("mean_lum", 6).alias("mean_lum"), "decode_ok",
        )
        .toPandas()
    )
    want = duckdb.sql(video_sql.video_fingerprints_sql(path)).df()
    _assert_frames_match(got, want, ["video_id"])
    by_id = got.set_index("video_id")
    assert (by_id.loc[1, ["b1", "b3"]] == 0).all()
    assert by_id.loc[1, "b0"] != by_id.loc[2, "b0"]

    spark_pairs = (
        multimodal._video_dup_pair_edges(fp.filter(F.col("decode_ok")))
        .toPandas()
    )
    oracle_pairs = duckdb.sql(video_sql.video_dup_pairs_sql(path)).df()
    assert len(spark_pairs) == 1 and len(oracle_pairs) == 1
    assert (
        int(spark_pairs["hamming"][0]) == int(oracle_pairs["hamming"][0]) == 2
    )


AUDIO_OP_ORACLES = [
    # (op name in ops.multimodal, oracle builder in scoring.audio_sql)
    ("audio_zcr", "audio_zcr_sql"),
    ("pitch_estimate", "pitch_estimate_sql"),
    ("audio_snr_estimate", "audio_snr_sql"),
    ("trim_silence", "trim_silence_sql"),
    ("spectral_band_ratios", "spectral_band_ratios_sql"),
    ("audio_level_stats", "audio_level_stats_sql"),
    ("cepstral_features", "cepstral_features_sql"),
    ("audio_resample_stats", "audio_resample_stats_sql"),
    ("audio_segments", "audio_segments_sql"),
    ("speech_rate", "speech_rate_sql"),
    ("audio_fingerprints", "audio_fingerprints_sql"),
    ("clip_windows", "clip_windows_sql"),
    ("duration_batches", "duration_batches_sql"),
    ("audio_quality_filter", "audio_quality_filter_sql"),
]


@pytest.mark.parametrize("op_name,sql_name", AUDIO_OP_ORACLES)
def test_audio_op_oracle_parity_on_adversarial_rows(
    spark, adversarial_path, monkeypatch, op_name, sql_name
):
    """Run the REAL gate op (its in-query generator monkeypatched to the
    adversarial table) against the REAL oracle SQL over the same parquet:
    the decode_ok boundary (NULL sr quarantines everywhere; NULL dur only
    where the kernel reads it) and the Python zero-sample returns (None
    vs 0-valued, kernel-specific) must agree engine-for-engine."""
    adv = spark.read.parquet(adversarial_path)
    monkeypatch.setattr(clips, "generate_clips", lambda s, n, p=None: adv)
    got = getattr(multimodal, op_name)(spark, "unused_sf_dir").toPandas()
    want = duckdb.sql(getattr(audio_sql, sql_name)(adversarial_path)).df()
    keys = {
        "clip_windows": ["clip_id", "win_idx"],
        "duration_batches": ["batch_id"],
    }.get(op_name, ["clip_id"])
    _assert_frames_match(got, want, keys)
    if "decode_ok" in got.columns and "win_idx" not in got.columns:
        ok = got.set_index("clip_id")["decode_ok"]
        assert not ok.loc["clip_000000000002"]  # NULL sr quarantines everywhere
        assert not ok.loc["clip_000000000005"]  # NULL payload
        assert ok.loc["clip_000000000004"]      # empty payload still decodes


@pytest.fixture(scope="module")
def adversarial_images_path(tmp_path_factory):
    """Image rows the seeded generator never emits: NULL dims, truncated
    payload, NULL/empty payload."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from curator_spark.synth import imagegen

    rows = [imagegen.make_image(0), imagegen.make_image(1), imagegen.make_image(2)]
    rows[2] = {**rows[2], "data": rows[2]["data"][:-1]}       # truncated
    rows.append({**imagegen.make_image(3), "width": None})    # NULL width
    rows.append({**imagegen.make_image(4), "height": None})   # NULL height
    rows.append({**imagegen.make_image(5), "data": None})     # NULL payload
    rows.append({**imagegen.make_image(6), "data": b""})      # empty payload
    pdf = pd.DataFrame(rows)
    pdf["width"] = pdf["width"].astype("Int32")
    pdf["height"] = pdf["height"].astype("Int32")
    path = str(tmp_path_factory.mktemp("advimg") / "images.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return path


@pytest.fixture(scope="module")
def adversarial_videos_path(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from curator_spark.synth import videogen

    def mk(i):  # skip external-codec stub ids
        r = videogen.make_video(i)
        assert r["fmt"] == "gray8_seq"
        return r

    rows = [mk(0), mk(1), {**mk(2), "data": mk(2)["data"][:-1]}]  # truncated
    rows.append({**mk(3), "width": None})
    rows.append({**mk(4), "n_frames": None})
    rows.append({**mk(6), "fps": None})   # stages coerce int(fps) in-try
    rows.append({**mk(7), "data": None})
    pdf = pd.DataFrame(rows)
    for c in ("width", "height", "n_frames", "fps"):
        pdf[c] = pdf[c].astype("Int32")
    path = str(tmp_path_factory.mktemp("advvid") / "videos.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return path


IMAGE_OP_ORACLES = [
    ("image_decode_features", "image_decode_features_sql", "generate_images"),
    ("image_fingerprints", "image_fingerprints_sql", "generate_images_with_near_dups"),
    ("image_dup_pairs", "image_dup_pairs_sql", "generate_images_with_near_dups"),
]

VIDEO_OP_ORACLES = [
    ("video_frame_features", "video_frame_features_sql", "generate_videos"),
    ("video_fingerprints", "video_fingerprints_sql", "generate_videos_with_near_dups"),
    ("video_dup_pairs", "video_dup_pairs_sql", "generate_videos_with_near_dups"),
]


@pytest.mark.parametrize("op_name,sql_name,gen_name", IMAGE_OP_ORACLES)
def test_image_op_oracle_parity_on_adversarial_rows(
    spark, adversarial_images_path, monkeypatch, op_name, sql_name, gen_name
):
    from curator_spark.scoring import image_sql

    adv = spark.read.parquet(adversarial_images_path)
    monkeypatch.setattr(multimodal, gen_name, lambda s, *a, **k: adv)
    got = getattr(multimodal, op_name)(spark, "unused").toPandas()
    want = duckdb.sql(getattr(image_sql, sql_name)(adversarial_images_path)).df()
    keys = ["img_a", "img_b"] if "pairs" in op_name else ["image_id"]
    _assert_frames_match(got, want, keys)
    if "pairs" not in op_name:
        ok = got.set_index("image_id")["decode_ok"]
        assert not ok.loc[2] and not ok.loc[3] and not ok.loc[4] and not ok.loc[5]
        assert ok.loc[0] and ok.loc[1]


@pytest.mark.parametrize("op_name,sql_name,gen_name", VIDEO_OP_ORACLES)
def test_video_op_oracle_parity_on_adversarial_rows(
    spark, adversarial_videos_path, monkeypatch, op_name, sql_name, gen_name
):
    from curator_spark.scoring import video_sql

    adv = spark.read.parquet(adversarial_videos_path)
    monkeypatch.setattr(multimodal, gen_name, lambda s, *a, **k: adv)
    got = getattr(multimodal, op_name)(spark, "unused").toPandas()
    want = duckdb.sql(getattr(video_sql, sql_name)(adversarial_videos_path)).df()
    keys = ["vid_a", "vid_b"] if "pairs" in op_name else (
        ["video_id", "frame_idx"] if "frame" in op_name else ["video_id"]
    )
    _assert_frames_match(got, want, keys)
    if "pairs" not in op_name and "frame" not in op_name:
        ok = got.set_index("video_id")["decode_ok"]
        for bad in (2, 3, 4, 6, 7):
            assert not ok.loc[bad], bad
        assert ok.loc[0] and ok.loc[1]


@pytest.fixture(scope="module")
def adversarial_mm_path(tmp_path_factory):
    """Mixed-modality rows with per-modality poisons: NULL audio metadata
    with a healthy image (and vice versa), NULL/truncated payloads on one
    side only — the per-modality quarantine (audio_ok / image_ok
    independent) must agree engine-for-engine."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from curator_spark.synth import mmrows

    rows = [mmrows.mm_row(i) for i in range(1, 9)]  # skip the i=0 opus stub
    rows[2] = {**rows[2], "sr_hz": None}          # audio poisoned, image fine
    rows[3] = {**rows[3], "dur_ms": None}
    rows[4] = {**rows[4], "bytes": None}
    rows[5] = {**rows[5], "width": None}          # image poisoned, audio fine
    rows[6] = {**rows[6], "image": rows[6]["image"][:-1]}
    rows[7] = {**rows[7], "image": None}
    pdf = pd.DataFrame(rows)
    pdf["clip_id"] = pdf["row_id"]  # audio_sql._samples_cte keys on clip_id
    for c in ("sr_hz", "dur_ms", "width", "height"):
        pdf[c] = pdf[c].astype("Int32")
    path = str(tmp_path_factory.mktemp("advmm") / "mm.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return path


@pytest.mark.parametrize(
    "op_name,sql_name",
    [
        ("multimodal_row_features", "multimodal_row_features_sql"),
        ("mm_quality_filter", "mm_quality_filter_sql"),
    ],
)
def test_mm_op_oracle_parity_on_adversarial_rows(
    spark, adversarial_mm_path, monkeypatch, op_name, sql_name
):
    from curator_spark.scoring import mm_sql
    from curator_spark.synth import mmrows

    adv = spark.read.parquet(adversarial_mm_path)
    monkeypatch.setattr(mmrows, "generate_mm_rows", lambda s, *a, **k: adv)
    got = getattr(multimodal, op_name)(spark, "unused").toPandas()
    want = duckdb.sql(getattr(mm_sql, sql_name)(adversarial_mm_path)).df()
    _assert_frames_match(got, want, ["row_id"])
    if op_name == "multimodal_row_features":
        by_id = got.set_index("row_id")
        ids = sorted(by_id.index)
        # rows 2-4 (0-indexed in fixture): audio poisoned, image fine
        for i in (2, 3, 4):
            assert not by_id.loc[ids[i], "audio_ok"], ids[i]
            assert by_id.loc[ids[i], "image_ok"], ids[i]
        # rows 5-7: image poisoned, audio fine
        for i in (5, 6, 7):
            assert by_id.loc[ids[i], "audio_ok"], ids[i]
            assert not by_id.loc[ids[i], "image_ok"], ids[i]


def test_clip_keep_summary_parity_on_adversarial_rows(
    spark, adversarial_path, monkeypatch
):
    """The FLAGSHIP composed query (decode → langid+ppl → rules → scrub →
    keep/drop rollup) over the adversarial table: the pipeline oracle's
    decode_ok must draw the same NULL-sr/NULL-dur boundary as
    stages.decode_stage, or keep counts and group means diverge."""
    from curator_spark.scoring import pipeline_sql

    adv = spark.read.parquet(adversarial_path)
    monkeypatch.setattr(clips, "generate_clips", lambda s, n, p=None: adv)
    got = multimodal.clip_keep_summary(spark, "unused").toPandas()
    want = duckdb.sql(pipeline_sql.clip_keep_summary_sql(adversarial_path)).df()
    _assert_frames_match(got, want, ["lang", "keep"])
    # the four poisoned rows must all be drops on both engines
    assert int(got[~got["keep"]]["n"].sum()) >= 4
