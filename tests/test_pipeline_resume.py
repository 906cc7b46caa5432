"""Checkpoint / resume / cache / audit semantics.

Analog of the reference's kill-and-resume integration tests
(``tests/integrations/test_all.py:36-49,193-210``: SIGALRM Timeout
mid-flight, re-run, assert cached count) and the request/response count
reconciliation (``base_request_processor.py:452-465``).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from curator_spark import oracle
from curator_spark.catalog import ParquetCatalog
from curator_spark.config import PipelineConfig
from curator_spark.pipeline import AUDIT_STAGES, Pipeline
from curator_spark.synth import clips

N = 400


@pytest.fixture()
def env(spark, workdir):
    inp = os.path.join(workdir, "clips_in")
    clips.write_clips(spark, N, inp)
    cfg = PipelineConfig(n_partitions=16, commit_batches=4)
    cat = ParquetCatalog(spark, os.path.join(workdir, "wh"))
    return spark, inp, cfg, cat


def test_kill_resume_identical_to_uninterrupted(env, workdir):
    spark, inp, cfg, cat = env

    # uninterrupted run in a separate warehouse → the golden output
    cat2 = ParquetCatalog(spark, os.path.join(workdir, "wh2"))
    Pipeline(spark, cat2, cfg).run(inp)
    golden = {r["clip_id"]: (r["keep"], r["scrubbed_transcript"])
              for r in cat2.read("clips_labeled").collect()}

    pipe = Pipeline(spark, cat, cfg)
    with pytest.raises(RuntimeError, match="failpoint"):
        pipe.run(inp, failpoint_after_groups=2)

    from curator_spark.catalog import dir_snapshot_id

    committed = pipe.committed_keys(cfg.fingerprint(dir_snapshot_id(inp)))
    assert 0 < len(committed) < cfg.n_partitions

    # audit snapshot of committed groups — must not change on resume
    audit_before = cat.read("audit").toPandas().sort_values(
        ["partition_key", "stage"]).reset_index(drop=True)

    res = pipe.run(inp)
    assert res.partitions_skipped >= len(committed)
    assert res.partitions_run == cfg.n_partitions - len(committed)

    audit_after = cat.read("audit").toPandas()
    merged = audit_after.merge(
        audit_before, on=["run_fingerprint", "partition_key", "stage"], suffixes=("", "_b"),
        how="right")
    # previously committed partitions were not recomputed: their audit rows
    # are unchanged (same wall_ms, same counts) and not duplicated
    assert (merged["wall_ms"] == merged["wall_ms_b"]).all()
    assert len(audit_after) == cfg.n_partitions * len(AUDIT_STAGES)

    got = {r["clip_id"]: (r["keep"], r["scrubbed_transcript"])
           for r in cat.read("clips_labeled").collect()}
    assert got == golden


def test_dedup_stage_drops_reingested_duplicate(env, workdir):
    """With cfg.dedup_exact, a re-ingested copy of an existing clip is
    labeled keep=false with 'duplicate' appended to reasons, while the
    canonical (min clip_id) row keeps its original decision — the
    pipeline face of the exact-dedup family (≙ the reference's
    content-identity cache skip, F5)."""
    spark, inp, cfg, cat = env

    # duplicate one clip's transcript under a strictly LARGER clip_id, and
    # re-ingest ANOTHER clip verbatim (same clip_id — the identical-file
    # re-landing case), by appending a two-row parquet file
    src = spark.read.parquet(inp)
    first2 = src.orderBy("clip_id").limit(2).collect()
    victim, exact = first2[0], first2[1]
    dup_row = src.filter(F.col("clip_id") == victim["clip_id"]).withColumn(
        "clip_id", F.concat(F.col("clip_id"), F.lit("_copy"))
    )
    exact_row = src.filter(F.col("clip_id") == exact["clip_id"])
    # grain-collapse case: ONE clip_id holding TWO distinct transcripts —
    # a dup of the victim's content plus a corrected (unique) transcript.
    # Marks must be (id, digest)-keyed: an id-only mark would drop the
    # corrected content along with the dup (silent data loss).
    mixed = src.filter(F.col("clip_id") == victim["clip_id"]).withColumn(
        "clip_id", F.concat(F.col("clip_id"), F.lit("_mixed"))
    )
    mixed_fixed = mixed.withColumn(
        "transcript", F.concat(F.col("transcript"), F.lit(" corrected"))
    )
    dup_row.unionByName(exact_row).unionByName(mixed).unionByName(
        mixed_fixed
    ).coalesce(1).write.mode("append").parquet(inp)

    cfg = PipelineConfig(
        n_partitions=cfg.n_partitions, commit_batches=cfg.commit_batches, dedup_exact=True
    )
    pipe = Pipeline(spark, cat, cfg)
    pipe.run(inp)
    rows = pipe.output().collect()
    out = {}
    for r in rows:
        out.setdefault(r["clip_id"], []).append(r)

    copy_id = victim["clip_id"] + "_copy"
    (copy_row,) = out[copy_id]
    assert copy_row["keep"] is False and "duplicate" in copy_row["reasons"]
    (victim_row,) = out[victim["clip_id"]]
    assert "duplicate" not in victim_row["reasons"]  # canonical wins
    # same-id re-ingest: exactly ONE of the two identical rows survives —
    # the content must not vanish (both-marked would be data loss)
    exact_rows = out[exact["clip_id"]]
    assert len(exact_rows) == 2
    dup_flags = sorted("duplicate" in r["reasons"] for r in exact_rows)
    assert dup_flags == [False, True]
    # mixed id: the duped transcript is marked, the corrected one survives
    mixed_rows = out[victim["clip_id"] + "_mixed"]
    assert len(mixed_rows) == 2
    by_fixed = {r["transcript"].endswith(" corrected"): r for r in mixed_rows}
    assert "duplicate" not in by_fixed[True]["reasons"]
    assert "duplicate" in by_fixed[False]["reasons"]
    # nothing else is touched by the stage
    n_dup_labeled = sum("duplicate" in r["reasons"] for r in rows)
    assert n_dup_labeled == 3 and len(rows) == N + 4


def test_export_dataset_card(env, workdir):
    """S5 export sink: curated parquet + generated dataset card. The card
    metadata must reconcile with the exported table exactly."""
    import json

    from curator_spark.export import export_dataset

    spark, inp, cfg, cat = env
    pipe = Pipeline(spark, cat, cfg)
    pipe.run(inp)
    out = os.path.join(workdir, "export")
    info = export_dataset(pipe, out)

    kept = pipe.kept().count()
    total = pipe.output().count()
    assert info["n_rows"] == kept == spark.read.parquet(os.path.join(out, "data")).count()
    # keep_rate is the curation stat over the FULL labeled run, not the
    # tautological 1.0 of the kept-only export
    assert info["labeled_rows"] == total
    assert info["keep_rate"] == round(kept / total, 6) < 1.0
    on_disk = json.load(open(os.path.join(out, "dataset_info.json")))
    assert on_disk == info
    card = open(os.path.join(out, "README.md")).read()
    assert info["run_fingerprint"] in card and f"| rows | {kept} |" in card
    assert sum(info["languages"].values()) == kept


def test_ingest_coercion(spark, workdir):
    """S1 iterable→Dataset ingest: str / list[str] / generator / list[dict]
    / pandas / path all coerce to DataFrames (≙ llm/llm.py:304-325)."""
    import pandas as pd
    import pytest as _pytest

    from curator_spark import ingest

    assert ingest.to_dataframe(spark, "hello").collect()[0]["prompt"] == "hello"
    assert ingest.to_dataframe(spark, ["a", "b"]).count() == 2
    assert ingest.to_dataframe(spark, (f"p{i}" for i in range(5))).count() == 5
    d = ingest.to_dataframe(spark, [{"x": 1, "y": "u"}, {"x": 2, "y": "v"}])
    assert set(d.columns) == {"x", "y"} and d.count() == 2
    pdf = pd.DataFrame({"k": [1, 2, 3]})
    assert ingest.to_dataframe(spark, pdf).count() == 3
    path = os.path.join(workdir, "ing.parquet")
    ingest.to_dataframe(spark, pdf).write.parquet(path)
    assert ingest.to_dataframe(spark, path).count() == 3
    df = ingest.to_dataframe(spark, ["z"])
    assert ingest.to_dataframe(spark, df) is df
    # a bare dict is one row-shaped mapping, not an iterable of its keys
    one = ingest.to_dataframe(spark, {"prompt": "hi", "temperature": 0.2})
    assert one.count() == 1 and set(one.columns) == {"prompt", "temperature"}
    with _pytest.raises(ValueError):
        ingest.to_dataframe(spark, [])
    with _pytest.raises(TypeError):
        ingest.to_dataframe(spark, b"raw bytes")  # iterating yields ints


def test_ingest_jsonl_csv_paths(spark, workdir):
    """S1 path dispatch by extension: .jsonl and .csv read back the same
    rows parquet does; an explicit schema skips type inference."""
    import pandas as pd

    from curator_spark import ingest

    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c x"]})
    src = ingest.to_dataframe(spark, pdf)

    jp = os.path.join(workdir, "ing.jsonl")
    src.coalesce(1).write.mode("overwrite").json(jp)
    got_j = ingest.to_dataframe(spark, jp, schema="doc_id long, text string")
    assert {(r["doc_id"], r["text"]) for r in got_j.collect()} == {
        (1, "a"), (2, "b"), (3, "c x")
    }

    cp = os.path.join(workdir, "ing.csv")
    src.coalesce(1).write.mode("overwrite").option("header", True).csv(cp)
    got_c = ingest.to_dataframe(spark, cp)  # inferred types
    assert {(r["doc_id"], r["text"]) for r in got_c.collect()} == {
        (1, "a"), (2, "b"), (3, "c x")
    }
    assert dict(got_c.dtypes)["doc_id"] in ("int", "bigint")


def test_export_dataset_formats(env, workdir):
    """S5 export sink in its jsonl/csv renderings: same rows as parquet,
    card stats measured from the read-back of what was written."""
    from curator_spark.export import export_dataset

    spark, inp, cfg, cat = env
    pipe = Pipeline(spark, cat, cfg)
    pipe.run(inp)
    base = export_dataset(pipe, os.path.join(workdir, "exp_parquet"))
    jl = export_dataset(pipe, os.path.join(workdir, "exp_jsonl"), data_format="jsonl")
    cv = export_dataset(pipe, os.path.join(workdir, "exp_csv"), data_format="csv")
    assert jl["n_rows"] == cv["n_rows"] == base["n_rows"]
    assert jl["data_format"] == "jsonl" and cv["data_format"] == "csv"
    assert jl["languages"] == base["languages"] == cv["languages"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        export_dataset(pipe, os.path.join(workdir, "exp_bad"), data_format="orc2")


def test_full_cache_hit(env):
    spark, inp, cfg, cat = env
    pipe = Pipeline(spark, cat, cfg)
    r1 = pipe.run(inp)
    assert r1.partitions_run == cfg.n_partitions and not r1.cached
    r2 = pipe.run(inp)
    assert r2.cached and r2.partitions_run == 0


def test_config_change_invalidates_cache(env):
    spark, inp, cfg, cat = env
    Pipeline(spark, cat, cfg).run(inp)
    cfg2 = PipelineConfig(
        n_partitions=cfg.n_partitions, commit_batches=cfg.commit_batches,
    )
    assert Pipeline(spark, cat, cfg2).run(inp).cached  # identical config ⇒ hit
    from curator_spark.config import RuleThresholds
    cfg3 = PipelineConfig(
        rules=RuleThresholds(ppl_max=999.0),
        n_partitions=cfg.n_partitions, commit_batches=cfg.commit_batches,
    )
    r = Pipeline(spark, cat, cfg3).run(inp)
    assert not r.cached and r.partitions_run == cfg.n_partitions


def test_audit_reconciliation_and_output(env):
    spark, inp, cfg, cat = env
    pipe = Pipeline(spark, cat, cfg)
    pipe.run(inp)
    aud = cat.read("audit")
    assert aud.filter(F.col("rows_in") != F.col("rows_out")).count() == 0
    out = pipe.output()
    assert out.count() == N
    assert out.select("clip_id").distinct().count() == N
    # labels match oracle through the full checkpointed path
    got = out.toPandas().sort_values("clip_id").reset_index(drop=True)
    gold = oracle.golden_labels(N).sort_values("clip_id").reset_index(drop=True)
    assert (got["keep"] == gold["keep"]).all()
    assert (got["scrubbed_transcript"] == gold["scrubbed_transcript"]).all()
    # kept view row count
    assert pipe.kept().count() == int(gold["keep"].sum())


def test_prepartitioned_input_prunes_and_matches(spark, workdir):
    """Inputs already laid out by part_key (hive parquet / Iceberg bucket
    partition) must (a) be read with real partition pruning per commit
    group — no full-table re-scan per group — and (b) produce identical
    labels to the computed-key path."""
    inp = os.path.join(workdir, "clips_flat")
    clips.write_clips(spark, N, inp)
    cfg = PipelineConfig(n_partitions=16, commit_batches=4)

    # re-lay the same clips out hive-partitioned by part_key
    part_inp = os.path.join(workdir, "clips_by_key")
    (
        spark.read.parquet(inp)
        .withColumn("part_key", F.pmod(F.xxhash64("clip_id"), F.lit(16)).cast("int"))
        .write.mode("overwrite")
        .partitionBy("part_key")
        .parquet(part_inp)
    )

    # (a) pruning: a one-group filter over the partitioned layout shows a
    # partition filter and scans only that group's files
    pruned = spark.read.parquet(part_inp).filter(F.col("part_key").isin([0, 4, 8, 12]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "part_key" in plan.split("PartitionFilters")[1][:200]

    # (b) same labels via the pipeline
    cat_a = ParquetCatalog(spark, os.path.join(workdir, "wh_flat"))
    cat_b = ParquetCatalog(spark, os.path.join(workdir, "wh_part"))
    Pipeline(spark, cat_a, cfg).run(inp)
    res = Pipeline(spark, cat_b, cfg).run(part_inp)
    assert res.partitions_run == cfg.n_partitions

    a = {r["clip_id"]: (r["keep"], r["scrubbed_transcript"])
         for r in cat_a.read("clips_labeled").collect()}
    b = {r["clip_id"]: (r["keep"], r["scrubbed_transcript"])
         for r in cat_b.read("clips_labeled").collect()}
    assert a == b


def test_runs_table_enumerates_and_dedupes(env):
    """≙ the reference's runs metadata DB (db.py:59-131): one queryable row
    per run fingerprint; re-running (cache hit) appends nothing; a config
    change creates a second, distinct row."""
    spark, inp, cfg, cat = env
    p1 = Pipeline(spark, cat, cfg)
    p1.run(inp)
    fp1 = p1.last_fingerprint
    p1.run(inp)  # cache hit — must dedupe
    from curator_spark.config import RuleThresholds

    cfg2 = PipelineConfig(
        n_partitions=16, commit_batches=4, rules=RuleThresholds(len_min=21)
    )
    p2 = Pipeline(spark, cat, cfg2)
    p2.run(inp)
    rows = {r["run_fingerprint"]: r for r in p1.runs().collect()}
    assert set(rows) == {fp1, p2.last_fingerprint} and len(rows) == 2
    assert rows[fp1]["config_json"] == cfg.canonical_json()
    assert rows[p2.last_fingerprint]["config_json"] == cfg2.canonical_json()
    assert rows[fp1]["input_path"] == inp and rows[fp1]["finished_at"] is not None


def test_mismatched_part_key_layout_recomputed_not_dropped(spark, workdir):
    """An input laid out with a DIFFERENT partition count than the current
    config (part_key values outside range(n_partitions)) must not silently
    drop the out-of-range rows: the pipeline validates the layout and
    recomputes part_key from clip_id, labeling every row."""
    inp = os.path.join(workdir, "clips_flat")
    clips.write_clips(spark, N, inp)
    cfg = PipelineConfig(n_partitions=16, commit_batches=4)

    # lay out with 64 keys — 3/4 of them outside range(16)
    part_inp = os.path.join(workdir, "clips_by_wrong_key")
    (
        spark.read.parquet(inp)
        .withColumn("part_key", F.pmod(F.xxhash64("clip_id"), F.lit(64)).cast("int"))
        .write.mode("overwrite")
        .partitionBy("part_key")
        .parquet(part_inp)
    )

    cat = ParquetCatalog(spark, os.path.join(workdir, "wh_wrong"))
    with pytest.warns(UserWarning, match="recomputing part_key"):
        res = Pipeline(spark, cat, cfg).run(part_inp)
    assert res.scan_mode == "column"
    out = cat.read("clips_labeled")
    assert out.count() == N  # every row labeled, none dropped
    assert out.select(F.max("part_key")).head()[0] < cfg.n_partitions


def test_corrupt_audio_quarantined_not_fatal(spark, workdir):
    """Malformed audio payloads (truncated WAV chunks, garbage, unknown
    codec) must be quarantined — keep=false with an audio reason, counted
    in audit rows_error — never kill the task (≙ the reference's bounded
    retry → permanent-failure path, SURVEY §2.8 T2)."""
    import pandas as pd

    inp = os.path.join(workdir, "clips_bad")
    good = clips.clips_pandas(20)
    bad = pd.DataFrame(
        [
            {"clip_id": "bad_trunc", "bytes": b"RIFF\x00\x00\x00\x00WAVEfmt \x20\x00\x00\x00",
             "sr_hz": 16000, "dur_ms": 500, "codec": "pcm_s16le", "transcript": "truncated chunk"},
            {"clip_id": "bad_garbage", "bytes": b"not audio at all",
             "sr_hz": 16000, "dur_ms": 500, "codec": "pcm_s16le", "transcript": "garbage"},
            {"clip_id": "bad_codec", "bytes": b"\x00\x01\x02",
             "sr_hz": 44100, "dur_ms": 500, "codec": "mp3", "transcript": "unsupported codec"},
        ]
    )
    spark.createDataFrame(pd.concat([good, bad], ignore_index=True)).write.parquet(inp)

    cfg = PipelineConfig(n_partitions=4, commit_batches=2)
    cat = ParquetCatalog(spark, os.path.join(workdir, "wh_bad"))
    res = Pipeline(spark, cat, cfg).run(inp)
    assert res.partitions_run == 4

    out = {r["clip_id"]: r for r in cat.read("clips_labeled").collect()}
    assert len(out) == 23
    for cid in ("bad_trunc", "bad_garbage", "bad_codec"):
        assert out[cid]["decode_ok"] is False
        assert out[cid]["keep"] is False
        assert "audio_rms" in out[cid]["reasons"]
    aud = cat.read("audit")
    n_err = aud.filter(F.col("stage") == "decode").agg(F.sum("rows_error")).head()[0]
    assert n_err == 3


def test_extra_columns_take_column_path_and_survive(spark, workdir):
    """Inputs with columns beyond the clip schema must fall back to the
    column scan (the manifest reader materializes exactly the clip schema)
    and carry the extra columns through to the labeled output."""
    inp = os.path.join(workdir, "clips_extra")
    base = os.path.join(workdir, "clips_base")
    clips.write_clips(spark, 60, base)
    spark.read.parquet(base).withColumn("source_url", F.concat(F.lit("s3://x/"), F.col("clip_id"))).write.parquet(inp)

    cfg = PipelineConfig(n_partitions=4, commit_batches=1)
    cat = ParquetCatalog(spark, os.path.join(workdir, "wh_extra"))
    res = Pipeline(spark, cat, cfg).run(inp)
    assert res.scan_mode == "column"
    out = cat.read("clips_labeled")
    assert "source_url" in out.columns
    assert out.filter(F.col("source_url").startswith("s3://x/clip_")).count() == 60


def test_audit_jsonl_export_import_roundtrip(spark, workdir):
    """S3/S5 (SURVEY §2.1): the audit log exports to JSONL and re-imports
    with an explicit schema — the reference's response-file interchange
    (create_dataset_files) re-expressed as schema'd spark.read.json."""
    inp = os.path.join(workdir, "clips_in")
    clips.write_clips(spark, 60, inp)
    cfg = PipelineConfig(n_partitions=4, commit_batches=1)
    cat = ParquetCatalog(spark, os.path.join(workdir, "wh"))
    Pipeline(spark, cat, cfg).run(inp)

    aud = cat.read("audit")
    jl = os.path.join(workdir, "audit_jsonl")
    aud.coalesce(1).write.json(jl)
    back = spark.read.schema(
        "run_fingerprint string, partition_key int, stage string, rows_in long, "
        "rows_out long, rows_error long, wall_ms long, metrics map<string,double>"
    ).json(jl)
    assert back.count() == aud.count()
    a = {(r["partition_key"], r["stage"]): r["rows_out"] for r in aud.collect()}
    b = {(r["partition_key"], r["stage"]): r["rows_out"] for r in back.collect()}
    assert a == b


def test_two_runs_same_warehouse_are_isolated(spark, workdir):
    """Two different-fingerprint runs into ONE warehouse must not bleed
    partitions into each other's output or audit (run_fp isolation)."""
    inp_a = os.path.join(workdir, "in_a")
    inp_b = os.path.join(workdir, "in_b")
    clips.write_clips(spark, 120, inp_a)
    # different input → different fingerprint; fewer rows so some keys
    # would have been left stale without isolation
    clips.write_clips(spark, 40, inp_b)

    cfg = PipelineConfig(n_partitions=8, commit_batches=2)
    cat = ParquetCatalog(spark, os.path.join(workdir, "wh_shared"))
    pa_ = Pipeline(spark, cat, cfg)
    ra = pa_.run(inp_a)
    out_a = pa_.output().count()
    pb = Pipeline(spark, cat, cfg)
    rb = pb.run(inp_b)
    assert ra.fingerprint != rb.fingerprint
    assert pb.output().count() == 40          # run B sees ONLY its rows
    assert pa_.output(ra.fingerprint).count() == out_a == 120  # A intact
    # audit rows of B reconcile against B's input, not A's leftovers
    aud_b = cat.read("audit").filter(F.col("run_fingerprint") == rb.fingerprint)
    assert aud_b.filter(F.col("rows_in") != F.col("rows_out")).count() == 0


def test_pipeline_labels_invariant_across_partitionings(spark, workdir):
    """The two-cluster-size F1 gate at pipeline level: the same input run
    with different partition-key counts and commit groupings (the local
    stand-in for different executor counts) must produce identical labels
    — F1 between the two runs is exactly 1.0."""
    inp = os.path.join(workdir, "clips_in")
    clips.write_clips(spark, 300, inp)

    outs = []
    for n_parts, groups in ((4, 1), (16, 4)):
        cfg = PipelineConfig(n_partitions=n_parts, commit_batches=groups)
        cat = ParquetCatalog(spark, os.path.join(workdir, f"wh_{n_parts}"))
        pipe = Pipeline(spark, cat, cfg)
        pipe.run(inp)
        outs.append({
            r["clip_id"]: (r["keep"], r["lang"], r["ppl"], r["scrubbed_transcript"])
            for r in pipe.output().collect()
        })
    assert outs[0] == outs[1]
    assert len(outs[0]) == 300


def test_publish_dataset_hub_layout(env, workdir):
    """Hub-style publish (the reference's push_to_hub analog): shard
    naming, split partition, checksum manifest, and leakage-safe
    membership that matches the standalone split expression."""
    import hashlib
    import json

    from pyspark.sql import functions as F

    from curator_spark.export import publish_dataset
    from curator_spark.ops.text import _split_expr

    spark, inp, cfg, cat = env
    pipe = Pipeline(spark, cat, cfg)
    pipe.run(inp)
    repo = os.path.join(workdir, "hub_repo")
    info = publish_dataset(pipe, repo)

    # shard naming + split row counts reconcile with the labeled table
    data = os.path.join(repo, "data")
    shards = sorted(os.listdir(data))
    assert all(
        s.split("-")[0] in ("train", "val", "test") and s.endswith(".parquet")
        for s in shards
    )
    want = {
        r["split"]: r["n"]
        for r in pipe.kept()
        .withColumn("split", _split_expr(0.1, 0.1, id_col="clip_id"))
        .groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    assert info["splits"] == {s: want.get(s, 0) for s in ("train", "val", "test")}
    assert sum(info["splits"].values()) == pipe.kept().count()

    # checksum manifest verifies against the bytes on disk
    for line in open(os.path.join(repo, "SHA256SUMS")):
        digest, rel = line.split()
        h = hashlib.sha256(open(os.path.join(repo, rel), "rb").read()).hexdigest()
        assert h == digest, rel

    # card front-matter carries the split sizes; info JSON round-trips
    on_disk = json.load(open(os.path.join(repo, "dataset_info.json")))
    assert on_disk == info
    assert json.dumps(info["splits"]) in open(os.path.join(repo, "README.md")).read()

    # split membership is disjoint and covers every published row
    pub = spark.read.parquet(os.path.join(data, "*.parquet"))
    assert pub.count() == sum(info["splits"].values())
    assert pub.select("clip_id").distinct().count() == pub.count()

    # re-publish with checksums=False: the PREVIOUS run's SHA256SUMS must
    # not survive to describe shards that no longer exist, and the README
    # must stop advertising a manifest that is not there
    publish_dataset(pipe, repo, checksums=False)
    assert not os.path.exists(os.path.join(repo, "SHA256SUMS"))
    assert "SHA256SUMS" not in open(os.path.join(repo, "README.md")).read()


def test_export_csv_preserves_embedded_newlines(spark, workdir):
    """CSV export must round-trip string fields containing newlines and
    quotes: without escape='"' + multiLine=True on the read-back, a
    transcript with '\\n' splits into garbage rows and the card stats
    describe a corrupted table."""
    from curator_spark.config import PipelineConfig
    from curator_spark.export import export_dataset

    labeled = spark.createDataFrame(
        [
            ("c0", 'line one\nline "two"', "en", 120.5, 0.9, 0, True, []),
            ("c1", "plain", "en", 80.0, 0.8, 1, True, ["pii"]),
            ("c2", "dropped\nrow", "de", 900.0, 0.4, 0, False, ["ppl"]),
        ],
        "clip_id string, scrubbed_transcript string, lang string, "
        "ppl double, lang_conf double, scrub_hits int, keep boolean, "
        "reasons array<string>",
    )

    class _FakePipe:
        def __init__(self):
            self.spark = spark
            self.cfg = PipelineConfig(n_partitions=2, commit_batches=1)
            self.last_fingerprint = "csvtest"

        def output(self, fingerprint=None):
            return labeled

    out_dir = os.path.join(workdir, "exp_csv_nl")
    info = export_dataset(_FakePipe(), out_dir, data_format="csv")
    assert info["n_rows"] == 2  # kept_only: c2 dropped, NOT split rows
    assert info["languages"] == {"en": 2}
    back = (
        spark.read.schema(
            "clip_id string, scrubbed_transcript string, lang string, "
            "ppl double, lang_conf double, scrub_hits int, keep boolean, "
            "reasons string"
        )
        .option("header", True).option("escape", '"').option("multiLine", True)
        .csv(os.path.join(out_dir, "data"))
    )
    got = {r["clip_id"]: r["scrubbed_transcript"] for r in back.collect()}
    assert got == {"c0": 'line one\nline "two"', "c1": "plain"}


def test_dir_snapshot_ignores_crashed_writer_junk(spark, workdir):
    """A crashed writer's _temporary subtree (and dotfiles) must not
    change the input fingerprint: os.walk has to be consumed lazily for
    the dirs[:] pruning to take effect — a sorted(os.walk(...)) wrapper
    materializes the walk first and silently hashes the junk, so a
    resume after a crash would recompute the whole run."""
    from curator_spark.catalog import dir_snapshot_id

    inp = os.path.join(workdir, "snap_in")
    clips.write_clips(spark, 10, inp)
    before = dir_snapshot_id(inp)
    junk = os.path.join(inp, "_temporary", "0")
    os.makedirs(junk)
    with open(os.path.join(junk, "part-0.parquet"), "wb") as fh:
        fh.write(b"garbage")
    with open(os.path.join(inp, ".hidden.crc"), "wb") as fh:
        fh.write(b"crc")
    assert dir_snapshot_id(inp) == before
    # a REAL data change must still move it
    with open(os.path.join(inp, "extra.parquet"), "wb") as fh:
        fh.write(b"x")
    assert dir_snapshot_id(inp) != before


def test_src_file_spelling_matches_manifest_reader(spark, workdir):
    """The dedup (clip_id, digest, src_file) join requires ONE path
    spelling on both sides: input_file_name() percent-encodes (space →
    %20) while the manifest reader records the raw OS path. The
    normalized marks expression must reproduce the manifest spelling
    even for paths with spaces and '+'."""
    from curator_spark import manifest
    from curator_spark.pipeline import _src_file_expr

    inp = os.path.join(workdir, "odd dir+name")
    clips.write_clips(spark, 6, inp)
    man_files = set(manifest.list_parquet_files(inp))
    assert man_files  # the generator wrote at least one part file
    spark_files = {
        r["src_file"]
        for r in spark.read.parquet(inp)
        .select(_src_file_expr().alias("src_file"))
        .distinct()
        .collect()
    }
    # the manifest may additionally list EMPTY part files (no row carries
    # their name through input_file_name); every row-bearing file must
    # match the manifest spelling exactly — space and '+' intact
    assert spark_files and spark_files <= man_files
    assert all("odd dir+name" in p for p in spark_files)
    # relative input path: the manifest side must still record absolute
    rel = os.path.relpath(inp)
    assert set(manifest.list_parquet_files(rel)) == man_files


def test_cost_report_reconciles_with_audit(env):
    """The measured cost face (round-5, SURVEY §2.5 A1 completion) must
    price exactly what the audit table records: per stage, usd =
    rows_in/1e6·row_rate + (sum of wall_ms)/n_stages/3.6e6·cpu_rate —
    recomputed here with plain Python over the collected audit rows."""
    from curator_spark.cost import STAGES, RateCard

    spark, inp, cfg, cat = env
    pipe = Pipeline(spark, cat, cfg)
    pipe.run(inp)
    rates = RateCard(
        usd_per_1m_rows=(("decode", 2.0), ("score", 0.5)),
        usd_per_cpu_hour=3.6,  # 0.001 usd/sec — easy mental arithmetic
    )
    got = {r["stage"]: r for r in pipe.cost_report(rates).collect()}
    assert set(got) == set(STAGES)
    aud = cat.read("audit").filter(
        F.col("run_fingerprint") == pipe.last_fingerprint
    ).collect()
    for stage in STAGES:
        rows_in = sum(r["rows_in"] for r in aud if r["stage"] == stage)
        wall_share = sum(
            r["wall_ms"] / len(STAGES) for r in aud if r["stage"] == stage
        )
        want = rows_in / 1e6 * dict(rates.usd_per_1m_rows).get(stage, 0.0) + (
            wall_share / 3_600_000.0 * rates.usd_per_cpu_hour
        )
        assert got[stage]["rows_in"] == rows_in
        assert abs(got[stage]["usd"] - round(want, 8)) < 1e-9, stage
    # the budget face prices the same stages from pure content counts
    # and stays strictly positive on a non-empty table
    from curator_spark.cost import estimate_stage_costs

    est = {r["stage"]: r["est_usd"] for r in
           estimate_stage_costs(spark, "/root/testdata/sf0.001").collect()}
    assert set(est) == set(STAGES) and all(v > 0 for v in est.values())
