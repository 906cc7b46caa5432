"""Structured Streaming face: exactly-once file-stream curation + windowed
rollup. Streaming labels must be bit-identical to the batch stages — the
same guarantee the reference's batch resume gives (SURVEY §2.8 T4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from curator_spark import stages, streaming
from curator_spark.config import PipelineConfig
from curator_spark.synth import clips

N = 240


def _land_clips(spark, path: str, n: int, files: int) -> None:
    clips.generate_clips(spark, n, files).repartition(files).write.mode(
        "overwrite"
    ).parquet(path)


def test_stream_pipeline_matches_batch(spark, workdir):
    cfg = PipelineConfig(n_partitions=8)
    inp = os.path.join(workdir, "landing")
    out = os.path.join(workdir, "labeled")
    ckpt = os.path.join(workdir, "ckpt")
    _land_clips(spark, inp, N, 4)

    q = streaming.stream_pipeline(spark, inp, out, ckpt, cfg, max_files_per_trigger=2)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    want = (
        stages.apply_all(
            spark.read.parquet(inp).withColumn(
                "part_key", F.pmod(F.xxhash64("clip_id"), F.lit(8)).cast("int")
            ),
            cfg.rules,
        )
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    assert len(got) == N
    for col in ["keep", "lang", "ppl", "scrubbed_transcript"]:
        assert (got[col] == want[col]).all(), col


def test_stream_pipeline_exactly_once_on_restart(spark, workdir):
    """Restarting the query over the same checkpoint must not rescore
    already-processed files; new files are picked up incrementally."""
    cfg = PipelineConfig(n_partitions=8)
    inp = os.path.join(workdir, "landing")
    out = os.path.join(workdir, "labeled")
    ckpt = os.path.join(workdir, "ckpt")
    _land_clips(spark, inp, N, 4)

    q = streaming.stream_pipeline(spark, inp, out, ckpt, cfg)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == N

    # restart with no new files → no duplicates
    q = streaming.stream_pipeline(spark, inp, out, ckpt, cfg)
    q.awaitTermination(120)
    df = spark.read.parquet(out)
    assert df.count() == N
    assert df.select("clip_id").distinct().count() == N


def test_stream_hourly_metrics(spark, workdir):
    cfg = PipelineConfig(n_partitions=8)
    inp = os.path.join(workdir, "landing")
    out = os.path.join(workdir, "labeled")
    _land_clips(spark, inp, N, 4)
    q = streaming.stream_pipeline(spark, inp, out, os.path.join(workdir, "ck1"), cfg)
    q.awaitTermination(120)

    q2 = streaming.stream_hourly_metrics(
        spark, out, os.path.join(workdir, "ck2"), query_name="hm_test"
    )
    q2.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hm_test").collect()
    assert sum(r["n"] for r in rows) == N
    batch_keep_rate = (
        spark.read.parquet(out).agg(F.avg(F.col("keep").cast("double"))).head()[0]
    )
    total = sum(r["n"] for r in rows)
    stream_rate = sum(r["keep_rate"] * r["n"] for r in rows) / total
    assert abs(stream_rate - batch_keep_rate) < 1e-9


def test_stream_hourly_metrics_durable_restart(spark, workdir):
    """The durable sink must let the rollup RESTART from its checkpoint:
    window state recovers, so rows labeled before the stop are still
    counted in the window after new rows arrive — not recounted, not
    forgotten. (The memory sink cannot do this; it has no recoverable
    output.)"""
    cfg = PipelineConfig(n_partitions=8)
    inp = os.path.join(workdir, "landing")
    out = os.path.join(workdir, "labeled")
    mdir = os.path.join(workdir, "metrics")
    ck_m = os.path.join(workdir, "ck_m")
    _land_clips(spark, inp, N, 2)

    q = streaming.stream_pipeline(spark, inp, out, os.path.join(workdir, "ck_p"), cfg)
    q.awaitTermination(120)
    q2 = streaming.stream_hourly_metrics(spark, out, ck_m, output_dir=mdir)
    q2.awaitTermination(120)
    first = streaming.read_hourly_metrics(spark, mdir)
    assert first.agg(F.sum("n")).head()[0] == N

    # second wave lands AFTER the metrics query stopped; restart from the
    # same checkpoint must fold it into the recovered window state
    extra = 60
    clips.generate_clips(spark, N + extra, 2).filter(
        ~F.col("clip_id").isin([r["clip_id"] for r in spark.read.parquet(inp).select("clip_id").collect()])
    ).write.mode("append").parquet(inp)
    q = streaming.stream_pipeline(spark, inp, out, os.path.join(workdir, "ck_p"), cfg)
    q.awaitTermination(120)
    n_labeled = spark.read.parquet(out).count()

    q3 = streaming.stream_hourly_metrics(spark, out, ck_m, output_dir=mdir)
    q3.awaitTermination(120)
    final = streaming.read_hourly_metrics(spark, mdir)
    # every labeled row counted exactly once across the restart
    assert final.agg(F.sum("n")).head()[0] == n_labeled > N


def test_stream_exact_dedup_state_across_microbatches(spark, workdir):
    """applyInPandasWithState custom stateful operator: a digest seen in an
    earlier micro-batch must not be re-emitted by a later one, and each
    distinct digest is emitted exactly once with its min clip_id."""
    import pandas as pd

    inp = os.path.join(workdir, "landing")
    ckpt = os.path.join(workdir, "ck_dedup")
    # 3 files with heavy duplication: clip i and i+40 and i+80 share the
    # transcript of generate index i % 40 → 40 distinct digests over 120 rows
    base = clips.clips_pandas(40)
    os.makedirs(inp, exist_ok=True)
    for f in range(3):
        pdf = base.copy()
        pdf["clip_id"] = [f"clip_{f * 40 + i:012d}" for i in range(40)]
        spark.createDataFrame(pdf, schema=streaming.CLIPS_SCHEMA).coalesce(1).write.mode(
            "append" if f else "overwrite"
        ).parquet(inp)

    q = streaming.stream_exact_dedup(spark, inp, ckpt, query_name="sd_test")
    q.awaitTermination(120)

    got = spark.sql("SELECT * FROM sd_test").toPandas()
    assert len(got) == 40  # one row per distinct transcript digest
    assert got["digest"].is_unique
    # with maxFilesPerTrigger=1 the first-landed file wins; regardless of
    # file order, every canonical id must be the min clip_id of its digest
    all_rows = spark.read.parquet(inp).withColumn("digest", F.md5("transcript")).toPandas()
    merged = got.set_index("digest")["canonical_id"]
    # canonical is the min within the FIRST micro-batch that saw the
    # digest; file landing order is not guaranteed, so assert each
    # canonical id really belongs to its digest group rather than racing
    # on which file was batch 0
    for dg, cid in merged.items():
        assert cid in set(all_rows[all_rows["digest"] == dg]["clip_id"])


def test_stream_exact_dedup_state_survives_restart(spark, workdir):
    """The state store must recover across query RESTARTS (same
    checkpoint): digests emitted before a stop are not re-emitted when new
    files arrive after a restart — the exactly-once contract the batch
    pipeline gets from its checkpoint table, in streaming form."""
    import pandas as pd

    inp = os.path.join(workdir, "landing2")
    ckpt = os.path.join(workdir, "ck_dedup2")
    base = clips.clips_pandas(30)
    os.makedirs(inp, exist_ok=True)

    def land(file_no: int) -> None:
        pdf = base.copy()
        pdf["clip_id"] = [f"clip_{file_no * 30 + i:012d}" for i in range(30)]
        spark.createDataFrame(pdf, schema=streaming.CLIPS_SCHEMA).coalesce(1).write.mode(
            "append" if file_no else "overwrite"
        ).parquet(inp)

    out = os.path.join(workdir, "dedup_out")
    land(0)
    q = streaming.stream_exact_dedup(spark, inp, ckpt, output_dir=out)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == 30  # every digest new in run 1

    land(1)  # 30 duplicates of run 1's transcripts
    q2 = streaming.stream_exact_dedup(spark, inp, ckpt, output_dir=out)
    q2.awaitTermination(120)
    final = spark.read.parquet(out).toPandas()
    # restart recovered the seen-set: nothing re-emitted for known digests
    assert len(final) == 30 and final["digest"].is_unique


def test_stream_audio_features_matches_batch(spark, workdir):
    """The streaming audio-feature extractor must emit bit-identical
    features to the batch decode stage over the same clips."""
    inp = os.path.join(workdir, "af_landing")
    out = os.path.join(workdir, "af_out")
    ckpt = os.path.join(workdir, "af_ckpt")
    _land_clips(spark, inp, N, 4)

    q = streaming.stream_audio_features(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got = (
        spark.read.option("basePath", out).parquet(out)
        .drop("batch_id")
        .orderBy("clip_id")
        .toPandas()
    )
    want = (
        stages.decode_stage(spark.read.parquet(inp).drop("transcript"))
        .orderBy("clip_id")
        .toPandas()
    )
    assert len(got) == N
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(want.columns)
    assert got[cols].reset_index(drop=True).equals(want[cols].reset_index(drop=True))


def test_stream_audio_features_exactly_once_on_restart(spark, workdir):
    """Restart over the same checkpoint must not re-decode consumed
    files; newly landed files are picked up incrementally."""
    inp = os.path.join(workdir, "af_landing2")
    out = os.path.join(workdir, "af_out2")
    ckpt = os.path.join(workdir, "af_ckpt2")
    _land_clips(spark, inp, N, 4)

    q = streaming.stream_audio_features(spark, inp, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.option("basePath", out).parquet(out).count() == N

    # restart with no new files -> nothing re-emitted
    q = streaming.stream_audio_features(spark, inp, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.option("basePath", out).parquet(out).count() == N

    # a second wave lands; only it is processed on the next restart
    clips.generate_clips(spark, N // 2, 2).withColumn(
        "clip_id", F.concat(F.lit("wave2_"), F.col("clip_id"))
    ).repartition(2).write.mode("append").parquet(inp)
    q = streaming.stream_audio_features(spark, inp, out, ckpt)
    q.awaitTermination(120)
    df = spark.read.option("basePath", out).parquet(out)
    assert df.count() == N + N // 2
    assert df.select("clip_id").distinct().count() == N + N // 2


def test_stream_scrub_matches_batch_and_restarts_exactly_once(spark, workdir):
    """The streaming scrub must emit the identical scrubbed strings and
    per-rule counts as the batch stage over the same clips, and a
    restart over the same checkpoint must not re-scrub consumed files."""
    inp = os.path.join(workdir, "sc_landing")
    out = os.path.join(workdir, "sc_out")
    ckpt = os.path.join(workdir, "sc_ckpt")
    _land_clips(spark, inp, N, 4)

    q = streaming.stream_scrub_transcripts(spark, inp, out, ckpt)
    q.awaitTermination(120)

    got = (
        spark.read.option("basePath", out).parquet(out)
        .drop("batch_id")
        .orderBy("clip_id")
        .toPandas()
    )
    want = (
        stages.scrub_detail_stage(
            spark.read.parquet(inp).select("clip_id", "transcript")
        )
        .drop("transcript")
        .orderBy("clip_id")
        .toPandas()
    )
    assert len(got) == N
    # the RAW transcript must never reach the compliance sink — writing it
    # next to scrubbed_transcript would leak the PII the stream removes
    assert "transcript" not in got.columns
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    assert got[cols].reset_index(drop=True).equals(want[cols].reset_index(drop=True))
    assert int(got[["email_hits", "ssn_hits", "phone_hits", "tox_hits"]].sum().sum()) > 0

    # restart with no new files -> nothing re-emitted
    q = streaming.stream_scrub_transcripts(spark, inp, out, ckpt)
    q.awaitTermination(120)
    assert spark.read.option("basePath", out).parquet(out).count() == N


def test_stream_exact_dedup_tolerates_null_clip_ids(spark, workdir):
    """A digest group whose rows carry NULL clip_ids must not crash the
    state function (str-vs-None comparison) nor emit the literal string
    'None': all-null groups emit canonical_id NULL (batch dedup_exact's
    min(clip_id) semantics); mixed groups pick the min NON-NULL id."""
    import pandas as pd

    inp = os.path.join(workdir, "landing_null")
    ckpt = os.path.join(workdir, "ck_dedup_null")
    base = clips.clips_pandas(6)
    pdf = base.copy()
    ids = list(pdf["clip_id"])
    ids[0] = None               # transcript 0: null + non-null holder below
    pdf["clip_id"] = ids
    dup = base.iloc[[0, 1]].copy()
    dup["clip_id"] = [None, None]  # transcript 1 gains an all-null twin set
    out = pd.concat([pdf, dup], ignore_index=True)
    only_null = base.iloc[[2]].copy()
    only_null["clip_id"] = [None]
    only_null["transcript"] = ["null-only transcript"]  # its OWN digest
    out = pd.concat([out, only_null], ignore_index=True)
    spark.createDataFrame(out, schema=streaming.CLIPS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(inp)

    q = streaming.stream_exact_dedup(spark, inp, ckpt, query_name="sd_null")
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sd_null").toPandas()
    assert len(got) == 7  # 6 base digests + the null-only transcript
    by_digest = got.set_index("digest")["canonical_id"]
    import hashlib

    d_null_only = hashlib.md5("null-only transcript".encode()).hexdigest()
    assert pd.isna(by_digest[d_null_only])  # NULL, not the string 'None'
    d0 = hashlib.md5(base["transcript"].iloc[0].encode()).hexdigest()
    assert pd.isna(by_digest[d0])  # transcript 0's only holder is null
    d1 = hashlib.md5(base["transcript"].iloc[1].encode()).hexdigest()
    assert by_digest[d1] == base["clip_id"].iloc[1]  # min NON-NULL wins
