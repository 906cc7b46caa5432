"""Spark pipeline vs single-node oracle — the correctness gates.

Gates per BASELINE.md: keep/drop F1 >= 0.99 (we assert exact), exact
scrubbed-transcript match, decoded-PCM SNR >= 30 dB, exact transcript
pass-through. Analog of the reference's golden-hash integration layer
(``tests/integrations/test_all.py:22-23,54-58``).
"""

from __future__ import annotations

import numpy as np

from curator_spark import oracle, stages
from curator_spark.config import PipelineConfig
from curator_spark.scoring import audio as audio_scoring
from curator_spark.synth import clips

N = 300


def _f1(pred: np.ndarray, true: np.ndarray) -> float:
    tp = int(np.sum(pred & true))
    fp = int(np.sum(pred & ~true))
    fn = int(np.sum(~pred & true))
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)


def test_labels_match_oracle(spark):
    cfg = PipelineConfig()
    df = clips.generate_clips(spark, N, 8)
    out = stages.apply_all(df, cfg.rules).toPandas().sort_values("clip_id").reset_index(drop=True)
    gold = oracle.golden_labels(N).sort_values("clip_id").reset_index(drop=True)

    assert _f1(out["keep"].to_numpy(), gold["keep"].to_numpy()) >= 0.99
    assert (out["keep"] == gold["keep"]).all()
    assert (out["lang"] == gold["lang"]).all()
    assert (out["scrubbed_transcript"] == gold["scrubbed_transcript"]).all()
    assert all(list(a) == list(b) for a, b in zip(out["reasons"], gold["reasons"]))
    for col in ["lang_conf", "ppl", "silence_ratio", "clip_ratio"]:
        assert (out[col].to_numpy() == gold[col].to_numpy()).all(), col
    a, b = out["rms_db"].to_numpy(), gold["rms_db"].to_numpy()
    assert ((a == b) | (np.isnan(a) & np.isnan(b))).all()


def test_transcript_passthrough_and_pcm_snr(spark):
    """Per-row invariant (BASELINE.json input_hint): decoded PCM of the
    table bytes vs the oracle's regenerated decode, SNR >= 30 dB; transcript
    byte-equality through the pipeline."""
    df = clips.generate_clips(spark, 50, 4)
    rows = {r["clip_id"]: r for r in df.collect()}
    for i in range(50):
        cid = f"clip_{i:012d}"
        ref_row = clips.clip_row(i)
        got = rows[cid]
        assert got["transcript"] == ref_row["transcript"]
        ref_pcm = audio_scoring.decode(ref_row["bytes"], ref_row["codec"], ref_row["sr_hz"])
        got_pcm = audio_scoring.decode(bytes(got["bytes"]), got["codec"], got["sr_hz"])
        err = float(np.sum((ref_pcm - got_pcm) ** 2))
        snr = float("inf") if err == 0 else 10 * np.log10(float(np.sum(ref_pcm**2)) / err)
        assert snr >= 30.0


def test_scoring_invariant_to_partitioning(spark):
    """Determinism across cluster sizes: the same rows scored under 2 vs 8
    partitions (different Arrow batch boundaries) produce identical labels —
    the property that makes the two-cluster-size F1 gate hold."""
    cfg = PipelineConfig()
    a = (
        stages.apply_all(clips.generate_clips(spark, 120, 2), cfg.rules)
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    b = (
        stages.apply_all(clips.generate_clips(spark, 120, 8), cfg.rules)
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    for col in ["keep", "lang", "lang_conf", "ppl", "scrubbed_transcript"]:
        assert (a[col] == b[col]).all(), col


def test_fused_decode_score_equals_chained(spark):
    """The fused single-pass decode+score stage (one Arrow round-trip) is
    column-for-column identical to the chained decode→score stages."""
    df = clips.generate_clips(spark, 120, 4)
    fused = (
        stages.decode_score_stage(df)
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    chained = (
        stages.score_stage(stages.decode_stage(df))
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    assert list(fused.columns) == list(chained.columns)
    for col in fused.columns:
        a, b = fused[col].to_numpy(), chained[col].to_numpy()
        if a.dtype.kind == "f":
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), col
        else:
            assert (a == b).all(), col


def test_manifest_scan_equals_column_scan(spark, tmp_path):
    """The Python-native manifest scan (pyarrow row-group reads inside the
    workers) must produce bit-identical scores to the column scan that
    ships bytes through the JVM Arrow path."""
    from curator_spark import manifest as M

    inp = str(tmp_path / "clips")
    clips.write_clips(spark, 200, inp)

    man = M.build_manifest(inp, 16)
    assert sum(man.rows_per_key.values()) == 200
    got = (
        M.decode_score_splits(spark, man.splits)
        .drop("part_key")
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    want = (
        stages.decode_score_stage(spark.read.parquet(inp))
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    assert sorted(got.columns) == sorted(want.columns)
    for col in want.columns:
        a, b = got[col].to_numpy(), want[col].to_numpy()
        if a.dtype.kind == "f":
            assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), col
        else:
            assert (a == b).all(), col


def test_manifest_lpt_balances_skewed_files(spark, tmp_path):
    """LPT assignment keeps per-key byte loads balanced under a skewed
    file-size distribution (the straggler-avoidance property)."""
    import pyarrow.parquet as pq

    from curator_spark import manifest as M

    inp = str(tmp_path / "skewed")
    # skewed layout: one big file + many small ones
    clips.generate_clips(spark, 300, 2).coalesce(1).write.parquet(inp + "/big")
    clips.generate_clips(spark, 100, 8).repartition(8).write.parquet(inp + "/small")

    man = M.build_manifest(inp, 4)
    sizes = dict.fromkeys(range(4), 0)
    for path, grp in man.splits.groupby("path"):
        meta = pq.ParquetFile(path).metadata
        nbytes = sum(meta.row_group(g).total_byte_size for g in range(meta.num_row_groups))
        sizes[int(grp["part_key"].iloc[0])] += nbytes
    per_file = {}
    for path, grp in man.splits.groupby("path"):
        meta = pq.ParquetFile(path).metadata
        per_file[path] = sum(
            meta.row_group(g).total_byte_size for g in range(meta.num_row_groups)
        )
    loads = sorted(sizes.values())
    mean = sum(loads) / len(loads)
    # classic LPT bound: max load <= mean + largest indivisible item
    assert loads[-1] <= mean + max(per_file.values())
    # the one oversized file monopolizes its key; the small files spread
    # across the remaining keys instead of piling onto it
    big_key = {int(grp["part_key"].iloc[0]) for path, grp in man.splits.groupby("path")
               if per_file[path] == max(per_file.values())}.pop()
    assert man.splits.groupby("part_key")["path"].nunique()[big_key] == 1
    assert sum(man.rows_per_key.values()) == 400


def test_unicode_and_null_transcripts_match_oracle(spark):
    """Java (?U) regex classes must agree with Python's Unicode-default
    classes on realistic non-ASCII transcripts (NBSP, accents, unicode
    digits), and NULL transcripts must normalize to '' (dropped with
    recorded reasons, zero scrub_hits) instead of poisoning Catalyst
    arithmetic."""
    import pandas as pd

    base = clips.clips_pandas(6)
    texts = [
        "café bücher straße the and of to is a café again and again the end",
        "nbsp separated words the of and to a longer transcript body here",
        "digits ٣٤٥ mixed with ssn 123-45-6789 the and of to a filler",
        "email x@y.com plus   weird spaces  the and of to a filler text",
        None,
        "plain ascii control transcript the and of to a perfectly normal row",
    ]
    pdf = base.copy()
    pdf["transcript"] = texts
    cfg = PipelineConfig()
    df = spark.createDataFrame(pdf, schema=streaming_schema())
    got = (
        stages.apply_all(df, cfg.rules)
        .toPandas()
        .sort_values("clip_id")
        .reset_index(drop=True)
    )
    for i, r in got.iterrows():
        row = dict(pdf.iloc[i])
        row["transcript"] = row["transcript"] if isinstance(row["transcript"], str) else ""
        want = oracle.label_row(row, cfg)
        assert r["scrubbed_transcript"] == want["scrubbed_transcript"], texts[i]
        assert r["scrub_hits"] == want["scrub_hits"] and r["tox_hits"] == want["tox_hits"]
        assert r["keep"] == want["keep"] and list(r["reasons"]) == list(want["reasons"])
    # the null row: normalized, not poisoned
    null_row = got.iloc[4]
    assert null_row["scrub_hits"] == 0 and null_row["keep"] is not None
    assert "len_min" in list(null_row["reasons"])


def streaming_schema():
    from curator_spark.streaming import CLIPS_SCHEMA

    return CLIPS_SCHEMA


def test_scrub_detail_per_rule_counts_match_python(spark):
    """scrub_detail_stage's per-rule hit columns and scrubbed string must
    equal Python scrub()'s subn counts on adversarial inputs: chained PII
    (an SSN-shaped string inside an email is consumed by the EMAIL step),
    NULL transcripts, and multi-hit rows."""
    import pandas as pd

    from curator_spark.scoring.scrub import scrub

    texts = [
        "reach ada.lovelace1@example.com or 555-123-4567 ssn 123-45-6789",
        "frak this smeg gorram mess frak",                  # 4 tox hits
        "digits 123-45-6789 then 987-65-4321 two ssns",
        "overlap 123-45-67890 is not an ssn (5-digit tail)",
        None,
        "plain row with nothing to scrub at all",
    ]
    pdf = pd.DataFrame({"clip_id": [f"c{i}" for i in range(len(texts))],
                        "transcript": texts})
    df = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None))
    got = (
        stages.scrub_detail_stage(df)
        .toPandas().sort_values("clip_id").reset_index(drop=True)
    )
    for i, r in got.iterrows():
        want_text, hits = scrub(texts[i] or "")
        assert r["scrubbed_transcript"] == want_text, texts[i]
        for rid in ("email", "ssn", "phone", "tox"):
            assert r[f"{rid}_hits"] == hits[rid], (texts[i], rid)
