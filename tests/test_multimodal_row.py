"""Mixed-modality row op: fused decode, per-modality quarantine, parity.

Reference analog: the ``_MultiModalPrompt`` payload (types/prompt.py:12-117)
— one row carrying text + audio + image, decoded lazily per modality.
"""

from __future__ import annotations

import math

import pytest

from curator_spark.ops import multimodal
from curator_spark.scoring import audio as audio_scoring
from curator_spark.scoring import image as image_scoring
from curator_spark.synth import mmrows

N = 60


@pytest.fixture(scope="module")
def mm_result(spark):
    df = mmrows.generate_mm_rows(spark, N, 4)
    rows = multimodal.multimodal_row_stage(df).orderBy("row_id").collect()
    return {r["row_id"]: r for r in rows}


def _nanish(v) -> bool:
    """Quarantined doubles surface as NULL after the Arrow boundary
    (pyarrow folds pandas NaN into the validity mask) — accept either."""
    return v is None or (isinstance(v, float) and math.isnan(v))


def test_per_modality_quarantine_is_independent(mm_result):
    """A stub audio codec must not poison the image features and vice
    versa; row 0 trips BOTH stubs (0 % 17 == 0 % 23 == 0)."""
    both_bad = mm_result["clip_000000000000"]
    assert not both_bad["audio_ok"] and not both_bad["image_ok"]
    assert _nanish(both_bad["rms_db"]) and both_bad["silence_ratio"] == 1.0
    assert both_bad["mean_lum"] is None and both_bad["contrast"] is None

    audio_bad = mm_result[f"clip_{17:012d}"]  # 17 % 23 != 0
    assert not audio_bad["audio_ok"] and audio_bad["image_ok"]
    assert audio_bad["mean_lum"] is not None

    image_bad = mm_result[f"clip_{23:012d}"]  # 23 % 17 != 0
    assert image_bad["audio_ok"] and not image_bad["image_ok"]
    assert not _nanish(image_bad["rms_db"])


def test_parity_vs_pure_python(mm_result):
    """Stage output must equal the single-node recompute row for row."""
    for i in (1, 2, 5, 35):  # healthy rows (not divisible by 17 or 23)
        raw = mmrows.mm_row(i)
        got = mm_result[raw["row_id"]]
        pcm = audio_scoring.decode(raw["bytes"], raw["codec"], raw["sr_hz"])
        af = audio_scoring.features(pcm, raw["sr_hz"], raw["dur_ms"])
        imf = image_scoring.decode_features(
            raw["image"], raw["img_fmt"], raw["width"], raw["height"]
        )
        assert got["audio_ok"] and got["image_ok"]
        assert got["rms_db"] == pytest.approx(af["rms_db"], abs=1e-12)
        assert got["silence_ratio"] == pytest.approx(af["silence_ratio"], abs=1e-12)
        assert got["mean_lum"] == pytest.approx(imf["mean_lum"], abs=1e-12)
        assert got["contrast"] == pytest.approx(imf["contrast"], abs=1e-12)
        words = [w for w in raw["transcript"].split(" ") if w]
        assert got["n_words"] == len(words)
        assert got["n_chars"] == len(raw["transcript"])


def test_partitioning_invariance(spark, mm_result):
    """Same rows through 1 partition == through 4 (no partition-dependent
    state in the fused stage)."""
    one = (
        multimodal.multimodal_row_stage(mmrows.generate_mm_rows(spark, N, 1))
        .orderBy("row_id")
        .collect()
    )
    assert len(one) == N == len(mm_result)
    for r in one:
        base = mm_result[r["row_id"]]
        for c in r.asDict():
            a, b = r[c], base[c]
            if _nanish(a) or _nanish(b):
                assert _nanish(a) and _nanish(b), (r["row_id"], c, a, b)
            else:
                assert a == b, (r["row_id"], c, a, b)


def test_gate_query_schema_and_rows(spark):
    df = multimodal.multimodal_row_features(spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "row_id", "n_chars", "n_words", "rms_db", "silence_ratio",
        "mean_lum", "contrast", "audio_ok", "image_ok",
    ]
    rows = df.limit(5).collect()
    assert len(rows) == 5


def test_mm_quality_filter_semantics(spark):
    """The multimodal keep/drop: quarantined modalities always drop with
    the decode reason; keeps have every modality ok and no rule reason;
    reason composition matches a per-row recompute."""
    rows = {
        r["row_id"]: r
        for r in multimodal.mm_quality_filter(spark, "/root/testdata/sf0.001").collect()
    }
    assert len(rows) == 200
    both_bad = rows["clip_000000000000"]
    assert not both_bad["keep"]
    assert "audio_decode" in both_bad["reasons"] and "image_decode" in both_bad["reasons"]
    kept = [r for r in rows.values() if r["keep"]]
    dropped = [r for r in rows.values() if not r["keep"]]
    assert kept and dropped  # thresholds actually split the fixture
    assert all(r["reasons"] == "" for r in kept)
    assert all(r["reasons"] != "" for r in dropped)


def test_augment_mix_stage_snr_and_pipeline_composition(spark, workdir):
    """Noise augmentation: achieved SNR hits the target on clean clips
    (clipping only ever spends noise power, so achieved >= target),
    augmentation is deterministic, and the augmented output — same
    schema as the input table — feeds the full curation pipeline."""
    import os

    import numpy as np

    from curator_spark.catalog import ParquetCatalog
    from curator_spark.config import PipelineConfig
    from curator_spark.pipeline import Pipeline
    from curator_spark.synth import clips

    df = clips.generate_clips(spark, 80, 4)
    out = multimodal.augment_mix_stage(df, target_snr_db=20.0)
    rows = {r["clip_id"]: r for r in out.collect()}
    ok = [r for r in rows.values() if r["decode_ok"]]
    assert len(ok) >= 70  # the seeded batch is almost all decodable
    snrs = np.array([r["achieved_snr_db"] for r in ok if r["achieved_snr_db"] is not None])
    assert (snrs >= 19.99).all() and np.median(snrs) == pytest.approx(20.0, abs=0.2)
    # deterministic: a second run produces byte-identical audio
    again = {r["clip_id"]: r for r in multimodal.augment_mix_stage(df, 20.0).collect()}
    some = next(r for r in ok if r["bytes"] is not None)
    assert bytes(again[some["clip_id"]]["bytes"]) == bytes(some["bytes"])
    # re-decode one mixed clip: SNR vs the original PCM matches the stats
    orig = {r["clip_id"]: r for r in df.collect()}
    src = orig[some["clip_id"].removesuffix("_aug")]
    pcm0 = audio_scoring.decode(bytes(src["bytes"]), src["codec"], src["sr_hz"])
    pcm1 = audio_scoring.decode(bytes(some["bytes"]), "pcm_s16le", some["sr_hz"])
    resid = pcm1 - pcm0
    meas = 10 * math.log10(float(pcm0 @ pcm0) / float(resid @ resid))
    # PCM16 quantization of the mix adds ~1e-4 noise; tolerance covers it
    assert meas == pytest.approx(some["achieved_snr_db"], abs=0.5)

    # composition: the augmented corpus runs through the SAME pipeline
    aug_path = os.path.join(workdir, "aug_clips")
    out.filter("decode_ok").drop(
        "achieved_snr_db", "post_mix_clip_ratio", "decode_ok"
    ).write.parquet(aug_path)
    cfg = PipelineConfig(n_partitions=4, commit_batches=1)
    pipe = Pipeline(spark, ParquetCatalog(spark, os.path.join(workdir, "aug_wh")), cfg)
    pipe.run(aug_path)
    labeled = pipe.output()
    assert labeled.count() == len([r for r in ok if r["bytes"] is not None])
    assert labeled.filter("decode_ok").count() == labeled.count()


def test_speed_perturb_stage_exact_lengths(spark):
    """Speed perturbation: one output per factor, exact integer-ratio
    lengths ((n*q)//p samples), samples equal the local recompute, and
    the schema matches the augmentation family (pipeline-composable)."""
    import numpy as np

    from curator_spark.synth import clips

    df = clips.generate_clips(spark, 40, 4)
    out = multimodal.speed_perturb_stage(df)
    rows = {r["clip_id"]: r for r in out.collect()}
    ok = [r for r in rows.values() if r["decode_ok"]]
    assert len(rows) == 80 and len(ok) >= 70
    assert out.schema == multimodal.augment_mix_stage(df).schema

    orig = {r["clip_id"]: r for r in df.collect()}
    checked = 0
    for r in ok[:6]:
        cid, tag = r["clip_id"].rsplit("_sp", 1)
        p, q = int(tag[:-2]), int(tag[-2:])
        src = orig[cid]
        pcm = audio_scoring.decode(bytes(src["bytes"]), src["codec"], src["sr_hz"])
        want = audio_scoring.resample_nn(pcm, p, q)
        got = audio_scoring.decode(bytes(r["bytes"]), "pcm_s16le", r["sr_hz"])
        assert got.shape[0] == (pcm.shape[0] * q) // p
        # PCM16 round-trip quantizes to 1/32767 steps
        assert np.abs(got - want).max() < 1e-4
        checked += 1
    assert checked == 6


def test_stages_quarantine_null_metadata(spark):
    """A NULL/NaN metadata value (sr_hz, dur_ms, width, ...) must degrade
    to a decode_ok=false row, never fail the Spark task: the carried-
    metadata dict is built BEFORE the quarantine try/except, so the
    coercion there has to be NULL-safe (ops/multimodal._opt_int)."""
    from pyspark.sql import functions as F

    from curator_spark.synth import clips

    df = clips.generate_clips(spark, 8, 2)
    bad_id = df.orderBy("clip_id").first()["clip_id"]
    poisoned = df.withColumn(
        "sr_hz",
        F.when(F.col("clip_id") == bad_id, F.lit(None)).otherwise(F.col("sr_hz")),
    ).withColumn(
        "dur_ms",
        F.when(F.col("clip_id") == bad_id, F.lit(None)).otherwise(F.col("dur_ms")),
    )
    for stage in (
        lambda d: multimodal.augment_mix_stage(d, 20.0),
        multimodal.speed_perturb_stage,
    ):
        rows = stage(poisoned).collect()  # must not raise
        bad = [r for r in rows if r["clip_id"].startswith(bad_id)]
        assert bad and all(not r["decode_ok"] for r in bad)
        assert all(r["sr_hz"] is None and r["bytes"] is None for r in bad)

    img = multimodal.generate_images(spark, 8, 2).withColumn(
        "width", F.when(F.col("image_id") == 0, F.lit(None)).otherwise(F.col("width"))
    )
    irows = multimodal.image_fingerprint_stage(img).collect()
    ibad = [r for r in irows if r["image_id"] == 0]
    assert len(ibad) == 1 and not ibad[0]["decode_ok"] and ibad[0]["width"] is None

    vid = multimodal.generate_videos(spark, 6, 2).withColumn(
        "n_frames",
        F.when(F.col("video_id") == 0, F.lit(None)).otherwise(F.col("n_frames")),
    )
    vrows = multimodal.video_fingerprint_stage(vid).collect()
    vbad = [r for r in vrows if r["video_id"] == 0]
    assert len(vbad) == 1 and not vbad[0]["decode_ok"] and vbad[0]["n_frames"] is None

    # the MAIN pipeline decode stage + the other per-clip audio kernels
    # share the same contract (decode_features coerces inside its try)
    from curator_spark import stages

    drows = stages.decode_stage(poisoned).collect()
    dbad = [r for r in drows if r["clip_id"] == bad_id]
    assert len(dbad) == 1 and not dbad[0]["decode_ok"]

    frows = multimodal.audio_fingerprint_stage(poisoned).collect()
    fbad = [r for r in frows if r["clip_id"] == bad_id]
    assert len(fbad) == 1 and not fbad[0]["decode_ok"] and fbad[0]["sr_hz"] is None

    wrows = multimodal.window_decode_stage(poisoned).collect()
    wbad = [r for r in wrows if r["clip_id"] == bad_id]
    assert len(wbad) == 1 and not wbad[0]["decode_ok"]
