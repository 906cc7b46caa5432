"""Ops vs DuckDB oracle parity inside pytest (sf0.001 for speed) +
semantic sanity for the rows-only operators.

The driver runs the full harness at sf0.01; this keeps `pytest -x -q`
self-sufficient.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tools.verify_oracles import TABLES, norm, value_hash

SF_DIR = "/root/testdata/sf0.001"

# the cheap exact-oracle subset (full set covered by tools/verify_oracles.py)
PARITY = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "resume_anti_join",
    "running_window",
    "events_hourly",
    "json_extract_props",
    "dedup_exact",
    "minhash_signatures",
    "minhash_dup_pairs",
    "ngram_jaccard_pairs",
    "cross_doc_dup_spans",
    "minhash_signatures_fast",
    "ann_cosine_topk",
    "embedding_near_dups",
    "token_count",
    "quality_scores",
    "doc_fingerprint",
    "curation_final_selection",
    "events_spike_detection",
    "events_funnel",
    "retention_cohorts",
    "daily_type_pivot",
    "heavy_hitters_sample",
    "events_cube",
    "weighted_sample_docs",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", PARITY)
def test_query_matches_duckdb(spark, ddb, name):
    got = norm(entrymod.queries()[name](spark, SF_DIR).toPandas())
    exp = norm(ddb.sql(entrymod.oracle_sql()[name]).df())
    assert len(got) == len(exp)
    assert sorted(got.columns) == sorted(exp.columns)
    assert value_hash(got) == value_hash(exp)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"lang", "n_clips", "n_keep", "mean_ppl", "mean_lang_conf", "sum_scrub_hits"}


def test_simhash_near_pairs_semantics(spark):
    from curator_spark.ops import dedup

    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash_fingerprints(spark, SF_DIR).collect()}
    pairs = dedup.simhash_near_pairs(spark, SF_DIR, max_hamming=3).collect()
    mask = (1 << 64) - 1
    for p in pairs:
        a, b = fps[p["doc_a"]] & mask, fps[p["doc_b"]] & mask
        assert bin(a ^ b).count("1") == p["hamming"] <= 3
        assert p["doc_a"] < p["doc_b"]


def test_ivf_topk_oracle_parity(spark, ddb, monkeypatch):
    """ivf_topk's full-algorithm oracle (assign→probe→cosine with inlined
    %.6e centroids) must hash-match at this SF too — the generator is
    pointed at sf0.001 via SPARK_GRAFT_ORACLE_SF_DIR (the driver default
    is the sf0.01 oracle table)."""
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    sql = entrymod.oracle_sql()["ivf_topk"]
    got = norm(entrymod.queries()["ivf_topk"](spark, SF_DIR).toPandas())
    exp = norm(ddb.sql(sql).df())
    assert len(got) == len(exp)
    assert value_hash(got) == value_hash(exp)


def test_ivf_recall_vs_brute_force(spark):
    from curator_spark.ops import similarity

    exact = [r["vec_id"] for r in similarity.ann_cosine_topk(spark, SF_DIR, k=10).collect()]
    approx = [r["vec_id"] for r in similarity.ivf_topk(spark, SF_DIR, k=10, n_probe=8).collect()]
    # probing half the cells must recover most of the true top-10
    assert len(set(exact) & set(approx)) >= 6
    assert exact[0] == approx[0] == 0  # the query vector itself


def test_xxhash64_replica_matches_spark(spark):
    """The pure-Python xxhash64 replica that ivf_oracle_params uses for
    sample selection on >2048-row tables must match Spark's expression
    bit-for-bit (signed result, seed 42) across edge values."""
    from pyspark.sql import functions as F

    from curator_spark.ops.similarity import _xxhash64_long

    vals = [0, 1, -1, 42, 2**31, -(2**31), 2**62, -(2**62), 2**63 - 1, -(2**63),
            10_000_000, -12345678901234]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    rows = df.select("v", F.xxhash64("v").alias("h")).collect()
    for r in rows:
        assert _xxhash64_long(r["v"]) == r["h"], r["v"]


def test_ivf_index_partition_pruning(spark, workdir):
    """The materialized IVF index must (a) return exactly the same top-k
    as the in-flight ivf_topk (same trained centroids, same probe) and
    (b) physically read ONLY the probed cell directories — partition
    pruning, asserted from the files actually opened."""
    import os

    from pyspark.sql import functions as F

    from curator_spark.ops import similarity

    idx = os.path.join(workdir, "ivf_idx")
    cent = similarity.build_ivf_index(spark, SF_DIR, idx)
    assert len(cent) >= 1

    qv = similarity.query_vector(spark, SF_DIR, 0)
    got = similarity.ivf_topk_indexed(spark, idx, qv, k=10, n_probe=4).collect()
    want = similarity.ivf_topk(spark, SF_DIR, k=10, n_probe=4).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [
        (r["vec_id"], r["cos_sim"]) for r in want
    ]

    import numpy as np

    vecs = spark.read.parquet(os.path.join(idx, "vectors"))
    all_cells = {r["cell"] for r in vecs.select("cell").distinct().collect()}
    probe = np.argsort(((cent - np.asarray(qv)) ** 2).sum(axis=1))[:4].tolist()
    scan = vecs.filter(F.col("cell").isin([int(c) for c in probe]))
    touched = {
        int(f.split("cell=")[1].split("/")[0])
        for (f,) in scan.select(F.input_file_name()).distinct().collect()
    }
    # only the probed cell directories were physically opened
    assert touched <= set(probe) and len(touched) <= 4 < len(all_cells)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # the filter reached the scan as pruning


def test_embedding_near_dups_pure_by_default(spark):
    """The operator itself must be a pure function of the embeddings table
    (ADVICE r2): no fabricated fixture ids in its output. This table has
    no natural near-dups at 0.9, so the pure run finds exactly nothing."""
    from curator_spark.ops import dedup

    rows = dedup.embedding_near_dups(spark, SF_DIR).collect()
    assert rows == []
    groups = dedup.embedding_dup_groups(spark, SF_DIR).collect()
    assert groups == []


def test_embedding_near_dups_planted_recall(spark):
    """Every deterministically-planted near-dup (cos ~0.9998) must be
    recalled by the 4x16-bit banded LSH, and every reported cosine must
    match a numpy brute-force recompute."""
    import numpy as np

    from curator_spark.ops import dedup

    df = dedup.embedding_near_dups_fixture(spark, SF_DIR)
    rows = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in df.collect()}
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in dedup.load(spark, SF_DIR, "embeddings").collect()
    }
    planted = sorted(v for v in emb if v % dedup.EMB_PLANT_MOD == 0)
    assert planted, "fixture should plant at least one near-dup"
    for v in planted:
        assert (v, v + dedup.EMB_PLANT_OFFSET) in rows  # 100% planted recall
    for (a, b), cs in rows.items():
        va = emb[a % dedup.EMB_PLANT_OFFSET].copy()
        vb = emb[b % dedup.EMB_PLANT_OFFSET].copy()
        if a >= dedup.EMB_PLANT_OFFSET:
            va[0] += dedup.EMB_PLANT_DELTA
        if b >= dedup.EMB_PLANT_OFFSET:
            vb[0] += dedup.EMB_PLANT_DELTA
        ref = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert abs(cs - ref) < 1e-5 and cs >= 0.9 and a < b


def test_token_count_bpe_spark_matches_local(spark):
    """The distributed BPE count must be bit-equal to a single-node
    application of the same trained merges (partitioning invariance), and
    the merges must actually compress the corpus."""
    import numpy as np

    from curator_spark.ops import dedup, text as text_ops
    from curator_spark.scoring import bpe

    df = text_ops.token_count_bpe(spark, SF_DIR).toPandas().sort_values("doc_id")
    docs = (
        dedup.load(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .toPandas()
        .sort_values("doc_id")
    )
    local = bpe.count_batch(list(docs["text"]))
    assert np.array_equal(df["n_bpe_tokens"].to_numpy(), local)
    assert df["n_bpe_tokens"].sum() < sum(len(t) for t in docs["text"])
    assert (df["n_bpe_tokens"] >= df["n_words"]).all()


def test_audio_segments_parity_and_bounds(spark):
    """The Spark VAD segmentation must be bit-equal to the pure-numpy
    oracle applied per clip, and structurally sane (ratios in [0,1],
    longest runs bounded by the clip, zero segments only when no frame is
    active)."""
    from curator_spark.ops import multimodal
    from curator_spark.scoring import audio
    from curator_spark.synth import clips

    got = {r["clip_id"]: r for r in multimodal.audio_segments(spark, SF_DIR).collect()}
    assert len(got) == 200
    pdf = clips.clips_pandas(200)
    for row in pdf.itertuples(index=False):
        g = got[row.clip_id]
        try:
            pcm = audio.decode(bytes(row.bytes), row.codec, int(row.sr_hz))
        except Exception:
            assert g["decode_ok"] is False
            continue
        want = audio.segments(pcm, int(row.sr_hz))
        assert g["decode_ok"] is True
        assert g["n_speech_segments"] == want["n_speech_segments"]
        assert abs(g["speech_ratio"] - round(want["speech_ratio"], 6)) < 1e-12
        assert g["longest_speech_ms"] == round(want["longest_speech_ms"], 6)
        assert g["longest_silence_ms"] == round(want["longest_silence_ms"], 6)
        assert 0.0 <= g["speech_ratio"] <= 1.0
        assert (g["n_speech_segments"] == 0) == (g["speech_ratio"] == 0.0)
        dur_ms = len(pcm) / row.sr_hz * 1000
        assert g["longest_speech_ms"] <= dur_ms + audio.FRAME_MS


def test_dup_groups_matches_union_find(spark):
    """Connected components via iterative min-label propagation must equal
    a single-node union-find over the same candidate-pair graph."""
    sf_dir = "/root/testdata/sf0.001"
    from curator_spark.ops import dedup

    pairs = [(r["doc_a"], r["doc_b"]) for r in dedup.minhash_dup_pairs(spark, sf_dir).collect()]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for node in parent:
        want.setdefault(find(node), set()).add(node)
    want_groups = {min(v): v for v in want.values()}

    got = {}
    for r in dedup.dup_groups(spark, sf_dir).collect():
        got.setdefault(r["group_id"], set()).add(r["doc_id"])
    assert got == want_groups


def test_audio_dup_groups_planted_structure(spark):
    """The audio dedup DAG's composed decision: every planted re-encode
    (``dup_clip_…``) must land in its base clip's component with the base
    as canonical; every un-planted clip must be a singleton canonical."""
    from curator_spark.ops import multimodal

    rows = multimodal.audio_dup_groups(spark, SF_DIR).collect()
    by_id = {r["clip_id"]: r for r in rows}
    assert len(rows) == 210  # 200 base + 10 planted re-encodes
    for i in range(0, 200, 20):
        base, dup = f"clip_{i:012d}", f"dup_clip_{i:012d}"
        assert by_id[dup]["group_id"] == base
        assert not by_id[dup]["is_canonical"]
        assert by_id[base]["group_id"] == base and by_id[base]["is_canonical"]
    singles = [r for r in rows if r["clip_id"].startswith("clip_") and int(r["clip_id"][5:]) % 20]
    assert all(r["is_canonical"] and r["group_id"] == r["clip_id"] for r in singles)


def test_clip_windows_tiling(spark):
    """Windows must tile each clip in order without gaps or overlap; a
    dropped tail is strictly shorter than min_tail_ms; a sub-window clip is
    exactly one whole-clip window."""
    from curator_spark.ops import multimodal
    from curator_spark.synth import clips as clips_mod

    win, tail_min = 500, 100
    rows = multimodal.clip_windows(spark, SF_DIR, win, tail_min).collect()
    durs = {clips_mod.clip_row(i)["clip_id"]: clips_mod.clip_row(i)["dur_ms"] for i in range(200)}
    per_clip: dict[str, list] = {}
    for r in rows:
        per_clip.setdefault(r["clip_id"], []).append(r)
    assert set(per_clip) == set(durs)
    for cid, ws in per_clip.items():
        ws.sort(key=lambda r: r["win_idx"])
        dur = durs[cid]
        assert [w["win_idx"] for w in ws] == list(range(len(ws)))
        assert all(w["n_windows"] == len(ws) for w in ws)
        assert ws[0]["start_ms"] == 0
        for prev, nxt in zip(ws, ws[1:]):
            assert nxt["start_ms"] == prev["end_ms"]  # gapless, no overlap
        covered = ws[-1]["end_ms"]
        assert covered <= dur and dur - covered < tail_min
        if dur <= win:
            assert len(ws) == 1 and ws[0]["end_ms"] == dur
        for w in ws:
            assert 0 < w["end_ms"] - w["start_ms"] <= win


def test_window_features_match_pcm_slices(spark):
    """Per-window rms/silence must equal the pure-numpy slice of the
    clip's full decode, and the window set must equal clip_windows'."""
    import numpy as np

    from curator_spark.ops import multimodal
    from curator_spark.scoring import audio as audio_scoring
    from curator_spark.synth import clips as clips_mod

    rows = [r for r in multimodal.window_decode_features(spark, SF_DIR).collect()]
    tiling = {(r["clip_id"], r["win_idx"]): (r["start_ms"], r["end_ms"], r["n_windows"])
              for r in multimodal.clip_windows(spark, SF_DIR).collect()}
    assert {(r["clip_id"], r["win_idx"]) for r in rows} == set(tiling)
    for r in rows[:80]:
        assert tiling[(r["clip_id"], r["win_idx"])] == (
            r["start_ms"], r["end_ms"], r["n_windows"]
        )
        i = int(r["clip_id"].split("_")[1])
        c = clips_mod.clip_row(i)
        pcm = audio_scoring.decode(c["bytes"], c["codec"], c["sr_hz"])
        s0 = min(r["start_ms"] * c["sr_hz"] // 1000, pcm.shape[0])
        s1 = min(r["end_ms"] * c["sr_hz"] // 1000, pcm.shape[0])
        seg = pcm[s0:s1]
        assert seg.shape[0] > 0
        want_rms = 20.0 * np.log10(max(float(np.sqrt(np.dot(seg, seg) / len(seg))), 1e-6))
        assert abs(r["rms_db"] - want_rms) < 1e-5
        assert abs(r["silence_ratio"] - np.count_nonzero(np.abs(seg) < 0.01) / len(seg)) < 1e-5


def test_duration_batches_prefix_sum_and_packing(spark):
    """The distributed prefix sum must equal the single-node cumsum over
    the same total order, every batch's duration stays within cap + one
    clip (overflow packing), and duration-sorted packing beats the
    pad-to-longest cost of id-ordered packing."""
    from curator_spark.ops import multimodal
    from curator_spark.synth import clips as clips_mod

    cap = 4000
    rows = multimodal.duration_batches(spark, SF_DIR, cap).collect()
    durs = sorted(
        (clips_mod.clip_row(i)["dur_ms"], clips_mod.clip_row(i)["clip_id"]) for i in range(200)
    )
    want: dict[int, list[int]] = {}
    cum = 0
    for d, _ in durs:
        want.setdefault(cum // cap, []).append(d)
        cum += d
    got = {r["batch_id"]: r for r in rows}
    assert set(got) == set(want)
    for bid, ds in want.items():
        r = got[bid]
        assert r["n_clips"] == len(ds) and r["total_ms"] == sum(ds)
        assert r["max_ms"] == max(ds)
        assert r["padding_ms"] == max(ds) * len(ds) - sum(ds)
        assert r["total_ms"] < cap + max(ds)
    sorted_pad = sum(r["padding_ms"] for r in rows)
    unsorted: dict[int, list[int]] = {}
    cum = 0
    for d, _ in sorted(durs, key=lambda t: t[1]):  # id order = random durations
        unsorted.setdefault(cum // cap, []).append(d)
        cum += d
    unsorted_pad = sum(max(ds) * len(ds) - sum(ds) for ds in unsorted.values())
    assert sorted_pad < unsorted_pad / 4  # packing by length pays for itself


def test_quota_sample_shortfall_no_duplicates(spark):
    """When a language's hash-cutoff survivors fall short of the quota,
    the exact fallback must not re-admit its cut-survivors (a duplicated
    doc would double-count against the quota). Adversarial input: every
    doc of the short language hashes ABOVE the 8x cutoff."""
    import hashlib

    import pandas as pd

    from curator_spark.ops.text import _quota_sample

    quota, n = 5, 1000
    cut = f"{min(0xFFFFFFFF, int(min(1.0, 8.0 * quota / n) * 0x100000000)):08x}"
    ids, i = [], 0
    while len(ids) < n:  # ~96% of ints land above the 4% cutoff
        if hashlib.md5(str(i).encode()).hexdigest()[:8] >= cut:
            ids.append(i)
        i += 1
    # one healthy language alongside the adversarial short one
    pdf = pd.DataFrame(
        {"doc_id": ids + list(range(10_000, 10_400)),
         "lang": ["short"] * n + ["ok"] * 400}
    )
    out = _quota_sample(spark.createDataFrame(pdf), quota).collect()
    per_lang: dict[str, list] = {}
    for r in out:
        per_lang.setdefault(r["lang"], []).append(r)
    assert len(per_lang["short"]) == quota and len(per_lang["ok"]) == quota
    for rows in per_lang.values():
        assert len({r["doc_id"] for r in rows}) == len(rows)  # no duplicates
        assert sorted(r["rk"] for r in rows) == list(range(1, quota + 1))
    # exact global definition: the quota smallest md5 keys per language
    for lang, pool in (("short", ids), ("ok", list(range(10_000, 10_400)))):
        want = sorted(pool, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[:quota]
        assert sorted(r["doc_id"] for r in per_lang[lang]) == sorted(want)


def test_quota_sample_high_lang_cardinality(spark):
    """The joined-cutoff rewrite must stay bounded at ~5k distinct
    languages (the old driver-built OR-chain made the Catalyst tree
    itself the bottleneck) and still satisfy the exact global
    definition: the quota smallest md5 keys per language."""
    import hashlib
    import time

    import pandas as pd

    from curator_spark.ops.text import _quota_sample

    n_langs, per_lang, quota = 5000, 4, 2
    pdf = pd.DataFrame(
        {
            "doc_id": range(n_langs * per_lang),
            "lang": [f"l{i % n_langs:04d}" for i in range(n_langs * per_lang)],
        }
    )
    t0 = time.monotonic()
    df = _quota_sample(spark.createDataFrame(pdf), quota)
    df.queryExecution if False else df._jdf.queryExecution().executedPlan()  # force planning
    planned = time.monotonic() - t0
    out = df.toPandas()
    assert planned < 60, f"planning took {planned:.1f}s"
    assert (out.groupby("lang").size() == quota).all()
    assert len(out) == n_langs * quota
    # spot-check the exact definition on a handful of languages
    for lang in ("l0000", "l2500", "l4999"):
        pool = pdf.loc[pdf.lang == lang, "doc_id"]
        want = sorted(pool, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[:quota]
        assert sorted(out.loc[out.lang == lang, "doc_id"]) == sorted(want)


def test_bigram_self_ppl_invariants(spark):
    """ppl must be 2^h_bits row-by-row, h positive and bounded by
    log2(V + max unigram count) (Laplace floor), and byte-identical docs
    must score byte-identical perplexity."""
    import math

    import duckdb

    from curator_spark.ops import text as text_ops

    rows = text_ops.bigram_self_ppl(spark, SF_DIR).collect()
    con = duckdb.connect()
    vocab, = con.sql(
        f"SELECT COUNT(DISTINCT tok) FROM (SELECT unnest(list_filter("
        f"string_split(text, ' '), x -> x <> '')) AS tok FROM '{SF_DIR}/documents.parquet')"
    ).fetchone()
    dup_texts = con.sql(
        f"SELECT list(doc_id) FROM '{SF_DIR}/documents.parquet' "
        "GROUP BY text HAVING COUNT(*) > 1"
    ).fetchall()
    by_id = {r["doc_id"]: r for r in rows}
    for r in rows:
        if r["n_bigrams"] == 0:
            assert r["h_bits"] is None and r["ppl"] is None
            continue
        assert 0 < r["h_bits"] <= math.log2(vocab * 2)
        assert abs(r["ppl"] - 2 ** r["h_bits"]) <= 1e-4 * r["ppl"]
    for (ids,) in dup_texts:  # if the corpus has exact dups, scores agree
        vals = {by_id[i]["ppl"] for i in ids if i in by_id}
        assert len(vals) == 1


def test_salted_skew_join_parity(spark):
    """Explicit salting for skewed join keys (the north rule's named
    technique): one hot key dominating the fact side is salted into S
    sub-keys, the dim side exploded across the salt range; result must be
    identical to the plain join."""
    import pandas as pd
    from pyspark.sql import functions as F

    n, hot = 20000, 7
    fact = spark.createDataFrame(pd.DataFrame({
        "k": [hot] * (n // 2) + [i % 50 for i in range(n // 2)],
        "v": list(range(n)),
    }))
    dim = spark.createDataFrame(pd.DataFrame({"k": list(range(50)), "name": [f"d{i}" for i in range(50)]}))

    S = 8
    salted_fact = fact.withColumn("salt", (F.pmod(F.xxhash64("v"), F.lit(S))).cast("int"))
    salted_dim = dim.withColumn("salt", F.explode(F.array(*[F.lit(s) for s in range(S)])))
    got = (
        salted_fact.join(salted_dim, ["k", "salt"])
        .groupBy("name").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    )
    want = fact.join(dim, "k").groupBy("name").agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
    g = {r["name"]: (r["n"], r["sv"]) for r in got.collect()}
    w = {r["name"]: (r["n"], r["sv"]) for r in want.collect()}
    assert g == w
    assert g["d7"][0] == n // 2 + (n // 2) // 50  # the hot key really is hot


def test_clear_session_cache_drops_persisted_buckets(spark):
    """bench.py calls this between repeats — a signature change in the
    cache key must not break the unpersist sweep."""
    from curator_spark.ops import dedup

    dedup.minhash_dup_pairs(spark, SF_DIR).count()
    app = spark.sparkContext.applicationId
    assert any(k[0] == app for k in dedup._STACKED_CACHE)
    dedup.clear_session_cache(spark)
    assert not any(k[0] == app for k in dedup._STACKED_CACHE)


def test_lang_quota_sample_equals_naive_window(spark):
    """The scale-shaped plan (count agg + hash-cutoff pre-filter + window
    over survivors, exact fallback on shortfall) must equal the naive
    global window definition exactly — including when quota exceeds a
    language's population (frac >= 1 keeps everything)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from curator_spark.ops import load, text

    for quota in (7, 10_000):  # pre-filtered path; frac>=1 keep-all path
        got = text.lang_quota_sample(spark, SF_DIR, quota=quota).toPandas()
        docs = load(spark, SF_DIR, "documents").select(
            "doc_id", "lang", F.md5(F.col("doc_id").cast("string")).alias("sample_key")
        )
        w = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
        want = (
            docs.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= quota)
            .orderBy("lang", "rk")
            .toPandas()
        )
        assert got.reset_index(drop=True).equals(want.reset_index(drop=True)), quota


def test_near_dup_clip_ids_match_full_generator(spark):
    """The Catalyst-only id universe must equal the full generator's ids
    exactly — a naming drift would silently desync audio_dup_groups'
    singleton left join from the edge frame."""
    from curator_spark.synth import clips

    full = {r["clip_id"] for r in
            clips.generate_clips_with_near_dups(spark, 60, 20, 2).select("clip_id").collect()}
    fast = {r["clip_id"] for r in clips.near_dup_clip_ids(spark, 60, 20, 2).collect()}
    assert fast == full


def test_quota_sample_empty_input(spark):
    """Empty documents frame → typed empty result, not filter(None)."""
    from pyspark.sql import functions as F

    from curator_spark.ops import text

    empty = spark.createDataFrame([], "doc_id long, lang string")
    out = text._quota_sample(empty, quota=5)
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang", "sample_key", "rk"]


def test_dataset_split_deterministic_and_balanced(spark):
    """Assignment is a pure function of doc_id: identical across runs and
    parallelism (no sampling state), with fractions near the requested
    ratios."""
    from curator_spark.ops import text

    a = text.dataset_split(spark, SF_DIR).toPandas()
    b = text.dataset_split(spark, SF_DIR).repartition(7).orderBy("doc_id").toPandas()
    assert a[["doc_id", "split"]].equals(b[["doc_id", "split"]].reset_index(drop=True))
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac.get("test", 0) - 0.1) < 0.05
    assert abs(frac.get("val", 0) - 0.1) < 0.05
    assert frac.get("train", 0) > 0.7


def test_cmvn_features_zero_mean_unit_var(spark):
    """z-scored features have ~zero mean and ~unit variance over the
    corpus (exactly the CMVN contract); constant features map to 0."""
    import numpy as np

    from curator_spark.ops import multimodal

    z = multimodal.cmvn_features(spark, SF_DIR).toPandas()
    for c in ("rms_db_z", "silence_ratio_z", "clip_ratio_z"):
        v = z[c].to_numpy()
        assert abs(v.mean()) < 1e-4
        assert v.std() < 1e-4 or abs(v.std() - 1.0) < 1e-3


def test_curation_final_selection_composition(spark):
    """The terminal decision must (a) never select a non-canonical dup,
    (b) respect the per-language quota, (c) assign the same split
    dataset_split would assign to the same doc."""
    from curator_spark.ops import dedup, text

    sel = text.curation_final_selection(spark, SF_DIR, quota=40).toPandas()
    groups = dedup.dup_groups(spark, SF_DIR).toPandas()
    non_canonical = set(groups.loc[groups.group_id != groups.doc_id, "doc_id"])
    assert not (set(sel.doc_id) & non_canonical)
    assert (sel.groupby("lang").size() <= 40).all()
    split_map = dict(
        zip(*(lambda d: (d.doc_id, d.split))(text.dataset_split(spark, SF_DIR).toPandas()))
    )
    assert all(split_map[d] == s for d, s in zip(sel.doc_id, sel.split))


def test_semantic_dedup_cell_locality(spark):
    """SemDeDup invariants: every group lives entirely inside ONE
    k-means cell; the grouping refines the cell-blind embedding dedup
    (each semantic group sits inside one global group); and it is pure
    over the natural table (no fixture ids without planting)."""
    from curator_spark.ops import dedup

    sem = dedup.semantic_dedup_groups_fixture(spark, SF_DIR).toPandas()
    assert len(sem) > 0
    assert (sem.groupby("group_id")["cell"].nunique() == 1).all()
    glob = dedup.embedding_dup_groups_fixture(spark, SF_DIR).toPandas()
    gmap = dict(zip(glob.vec_id, glob.group_id))
    # refinement: all members of a semantic group share a global group
    for _, grp in sem.groupby("group_id"):
        assert len({gmap.get(v) for v in grp.vec_id}) == 1
    assert dedup.semantic_dedup_groups(spark, SF_DIR).count() == 0  # pure


def test_remove_dup_spans_semantics(spark, workdir):
    """Keep-first-occurrence excision on a constructed corpus: the min
    doc_id holder keeps its text verbatim; a later holder with the same
    66-char body behind a stride-aligned 10-char prefix loses every
    shared window (merged into ONE cut) and keeps exactly the prefix;
    within-doc-only repetition is never removed."""
    import os

    import pandas as pd

    from curator_spark.ops import dedup

    body = "the quick brown fox jumps over the lazy dog again and again today"  # 65
    within = ("z" * 50 + "y" * 10) * 2  # within-doc repeat only, 120 chars
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [body, "PREFIX10__" + body, within],
        }
    )
    sf = os.path.join(workdir, "rds_sf")
    os.makedirs(sf, exist_ok=True)
    df.to_parquet(os.path.join(sf, "documents.parquet"))

    out = {r["doc_id"]: r for r in dedup.remove_dup_spans(spark, sf).collect()}
    assert out[1]["n_removed_spans"] == 0 and out[1]["cleaned_text"] == body
    # doc 2: windows at 11/21 share doc 1's grams at 1/11 → one merged
    # cut [11, 71) over chars 11..70; the prefix and the 5-char tail
    # beyond the last 50-wide window survive (pos 1's gram —
    # prefix+body[:40] — is unique to doc 2)
    assert out[2]["n_removed_spans"] == 2
    assert out[2]["cleaned_text"] == "PREFIX10__" + body[60:]
    assert out[2]["cleaned_len"] == 15
    # within-doc repetition alone is out of scope (cross-doc op)
    assert out[3]["n_removed_spans"] == 0 and out[3]["cleaned_text"] == within
    """The materialized keep-list index must serve EXACTLY the in-flight
    composition's selection, and the index-served plan must not contain
    the MinHash UDF stage (the whole point is not re-deriving the dedup
    DAG per consumer)."""
    import os
    import shutil

    from curator_spark.ops import dedup, text

    # force a fresh build so the marker-file protocol is exercised
    idx = dedup.ensure_dedup_index(spark, SF_DIR)
    shutil.rmtree(os.path.dirname(idx))
    idx = dedup.ensure_dedup_index(spark, SF_DIR)
    assert os.path.exists(os.path.join(os.path.dirname(idx), "_BUILT"))

    want = text.curation_final_selection(spark, SF_DIR).toPandas()
    got = text.curation_from_index(spark, SF_DIR).toPandas()
    assert got.equals(want)
    # second call reuses the cached index (marker mtime unchanged)
    m = os.path.getmtime(os.path.join(os.path.dirname(idx), "_BUILT"))
    text.curation_from_index(spark, SF_DIR).count()
    assert os.path.getmtime(os.path.join(os.path.dirname(idx), "_BUILT")) == m
    # the index-served plan never runs the Python minhash/banding stage
    plan = text.curation_from_index(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_lsh_topk_candidates_and_recall(spark):
    """Multi-probe LSH ANN: the query always retrieves itself (identical
    band keys), results are a subset of the table ranked by exact cosine,
    recall@10 vs brute force clears 0.5 on this worst-case near-random
    table (measured 0.6 at sf0.001; the round-4 single-probe family sat
    at 0.2-0.3), and the probe stays a genuine subset — the candidate
    set must NOT degenerate to a full scan."""
    from curator_spark.ops import similarity

    exact = [r["vec_id"] for r in similarity.ann_cosine_topk(spark, SF_DIR, k=10).collect()]
    lsh = similarity.lsh_topk(spark, SF_DIR, k=10).collect()
    ids = [r["vec_id"] for r in lsh]
    assert ids[0] == exact[0] == 0  # the query vector itself
    assert len(set(exact) & set(ids)) >= 5
    sims = [r["cos_sim"] for r in lsh]
    assert sims == sorted(sims, reverse=True)
    n_cand = similarity.lsh_candidates(spark, SF_DIR).count()
    n_total = similarity.load(spark, SF_DIR, "embeddings").count()
    assert 10 <= n_cand < 0.6 * n_total  # pruned, not a full scan


def test_lsh_probe_keys_deterministic_and_bounded(spark):
    """The shared probe kernel (Spark path == oracle path by
    construction) emits the base bucket of every band, stays within the
    per-band budget, and is deterministic across calls."""
    import numpy as np

    from curator_spark.ops import similarity

    qv = np.array(
        [np.float32(v) for v in similarity.query_vector(spark, SF_DIR, 0)],
        dtype=np.float64,
    )
    pairs = similarity.lsh_probe_keys(qv)
    assert pairs == similarity.lsh_probe_keys(qv)  # deterministic
    by_band = {}
    for b, key in pairs:
        assert 0 <= key < (1 << similarity.ANN_LSH_BITS)
        by_band.setdefault(b, set()).add(key)
    assert set(by_band) == set(range(similarity.ANN_LSH_BANDS))
    bits = (qv @ similarity.ANN_PLANES.T) > 0
    for b, keys in by_band.items():
        base = sum(
            int(bits[b * similarity.ANN_LSH_BITS + j]) << j
            for j in range(similarity.ANN_LSH_BITS)
        )
        assert base in keys  # the unperturbed bucket is always probed
        assert len(keys) <= 1 + similarity.ANN_MULTIPROBE


def test_lsh_index_partition_pruning(spark, workdir):
    """The materialized LSH index must (a) return exactly the same top-k
    as the in-flight lsh_topk and (b) physically open ONLY hive
    directories whose (band, bgrp) appears in the multi-probe set — the
    exact-bkey residue is pruned inside a group by parquet row-group
    statistics, asserted via PushedFilters in the formatted plan."""
    import os
    import re

    import numpy as np
    from pyspark.sql import functions as F

    from curator_spark.ops import similarity

    idx = os.path.join(workdir, "lsh_idx")
    similarity.build_lsh_index(spark, SF_DIR, idx)

    qv = similarity.query_vector(spark, SF_DIR, 0)
    got = similarity.lsh_topk_indexed(spark, idx, qv, k=10).collect()
    want = similarity.lsh_topk(spark, SF_DIR, k=10).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in got] == [
        (r["vec_id"], r["cos_sim"]) for r in want
    ]

    pairs = similarity.lsh_probe_keys(
        np.array([np.float32(v) for v in qv], dtype=np.float64)
    )
    expect_grps = {(b, key >> similarity.ANN_LSH_BGRP_SHIFT) for b, key in pairs}
    vecs = spark.read.parquet(os.path.join(idx, "vectors"))
    by_band = {}
    for b, key in pairs:
        by_band.setdefault(b, []).append(key)
    probe = None
    for b, keys in by_band.items():
        grps = sorted({k >> similarity.ANN_LSH_BGRP_SHIFT for k in keys})
        cond = (F.col("band") == b) & F.col("bgrp").isin(grps) & F.col("bkey").isin(keys)
        probe = cond if probe is None else (probe | cond)
    filtered = vecs.filter(probe)
    touched = {
        tuple(int(x) for x in re.search(r"band=(\d+)/bgrp=(\d+)", f).groups())
        for (f,) in filtered.select(F.input_file_name()).distinct().collect()
    }
    n_dirs = vecs.select("band", "bgrp").distinct().count()
    # only probed (band, bgrp) directories were physically opened, and
    # the probe is a strict subset of the index layout
    assert touched <= expect_grps and len(touched) < n_dirs
    # the exact-bkey residue reaches the parquet scan (row-group pruning)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bkey" in plan.split("PushedFilters", 1)[1][:400]


def test_events_spike_detection_semantics(spark):
    """Early hours (no full trailing day) carry NULL z and are never
    flagged; every flagged hour clears the z threshold."""
    from curator_spark.ops import relational

    df = relational.events_spike_detection(spark, SF_DIR).toPandas()
    head = df.head(24)
    assert head["z"].isna().all()
    assert not head["spike"].any()
    flagged = df[df["spike"]]
    assert (flagged["z"] >= 3.0).all()
    # every scored hour had a full trailing day (zero-var windows may drop out)
    assert len(df["z"].dropna()) <= len(df) - 24

def test_events_funnel_stage_monotonicity(spark):
    """A later funnel stage can never exceed an earlier one, and the
    single-pass HOF implementation's totals match direct per-stage
    counting (first-signup users) on the raw table."""
    from pyspark.sql import functions as F

    from curator_spark.ops import relational

    df = relational.events_funnel(spark, SF_DIR).toPandas()
    assert (df["n_signup"] >= df["n_click"]).all()
    assert (df["n_click"] >= df["n_purchase"]).all()
    assert df["click_rate"].between(0, 1).all()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_signup_users = (
        ev.filter(F.col("event_type") == "signup").select("user_id").distinct().count()
    )
    assert int(df["n_signup"].sum()) == n_signup_users


def test_retention_cohorts_day0_full(spark):
    """Offset-0 retention is exactly 1.0 and no offset exceeds it; the
    sum of each cohort's day-0 size equals the distinct-user count."""
    from curator_spark.ops import relational

    df = relational.retention_cohorts(spark, SF_DIR).toPandas()
    day0 = df[df["offset_days"] == 0]
    assert (day0["retention"] == 1.0).all()
    assert (df["n_active"] <= df["cohort_size"]).all()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert int(day0["cohort_size"].sum()) == ev.select("user_id").distinct().count()


def test_daily_type_pivot_row_sums(spark):
    """Wide counts re-sum to the raw per-day totals (pivot loses nothing)."""
    from pyspark.sql import functions as F

    from curator_spark.ops import relational

    df = relational.daily_type_pivot(spark, SF_DIR).toPandas()
    wide_total = int(df[[c for c in df.columns if c.startswith("n_")]].sum().sum())
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert wide_total == ev.count()
    assert set(df.columns) == {"day", "n_click", "n_error", "n_purchase", "n_signup", "n_view"}


def test_events_cube_marginals_consistent(spark):
    """The grand total equals the table count; each marginal's subtotal
    set re-sums to the same grand total (grouping sets lose nothing)."""
    from curator_spark.ops import relational

    df = relational.events_cube(spark, SF_DIR).toPandas()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    grand = df[(df["is_day_total"] == 1) & (df["is_type_total"] == 1)]
    assert len(grand) == 1 and int(grand["n"].iloc[0]) == n
    type_tot = df[(df["is_day_total"] == 1) & (df["is_type_total"] == 0)]
    day_tot = df[(df["is_day_total"] == 0) & (df["is_type_total"] == 1)]
    assert int(type_tot["n"].sum()) == n and int(day_tot["n"].sum()) == n


def test_heavy_hitters_sample_estimator(spark):
    """Top-k is exact-ordered with deterministic ties; estimates are
    non-negative multiples of the 4x scale-up."""
    from curator_spark.ops import relational

    df = relational.heavy_hitters_sample(spark, SF_DIR).toPandas()
    assert len(df) == 10
    assert (df["n_exact"].diff().dropna() <= 0).all()
    assert (df["n_est"] % 4 == 0).all() and (df["n_est"] >= 0).all()


def test_weighted_sample_docs_certainty_and_subset(spark):
    """Docs at/above the 2000-char cap are kept with certainty; every
    sampled doc satisfies the integer threshold predicate (recomputed
    locally), so the sample is a pure deterministic function of doc_id."""
    import hashlib

    from curator_spark.ops import text as text_ops

    df = text_ops.weighted_sample_docs(spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "n_chars").toPandas()
    cap = set(docs[docs["n_chars"] >= 2000]["doc_id"])
    assert cap <= set(df["doc_id"])
    for row in df.itertuples():
        h = int(hashlib.md5(str(row.doc_id).encode()).hexdigest()[:15], 16)
        assert h < min(row.n_chars, 2000) * text_ops.WSAMPLE_UNIT


def test_require_utc_guard(spark):
    """Day-bucketing ops refuse to run under a DST-observing session zone
    rather than silently diverging from the oracle's wall-clock days."""
    from curator_spark.ops import relational

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone=UTC"):
            relational.events_funnel(spark, SF_DIR)
        with pytest.raises(ValueError, match="timeZone=UTC"):
            relational.events_cube(spark, SF_DIR)
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    relational.events_funnel(spark, SF_DIR)  # restored zone works again


def test_quota_sample_null_lang_is_a_group_not_poison(spark):
    """A NULL lang is a legitimate group key: under three-valued logic a
    plain == / isin comparison against it evaluates to NULL, which
    (before the eqNullSafe/coalesce guards) silently dropped EVERY row —
    including all healthy languages — whenever a NULL-lang group hit the
    shortfall fallback."""
    import hashlib

    import pandas as pd

    from curator_spark.ops.text import _quota_sample

    quota = 5
    # adversarial NULL-lang docs: all hash above the 8x cutoff, forcing
    # the NULL group through the shortfall fallback
    cut = f"{min(0xFFFFFFFF, int(min(1.0, 8.0 * quota / 200) * 0x100000000)):08x}"
    ids, i = [], 0
    while len(ids) < 200:
        if hashlib.md5(str(i).encode()).hexdigest()[:8] >= cut:
            ids.append(i)
        i += 1
    pdf = pd.DataFrame(
        {
            "doc_id": ids + list(range(10_000, 10_400)),
            "lang": pd.array([None] * 200 + ["ok"] * 400, dtype="string"),
        }
    )
    out = _quota_sample(spark.createDataFrame(pdf), quota).collect()
    null_rows = [r for r in out if r["lang"] is None]
    ok_rows = [r for r in out if r["lang"] == "ok"]
    assert len(null_rows) == quota  # the NULL group samples its quota
    assert len(ok_rows) == quota    # ...and does not erase the others
    want = sorted(ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))[:quota]
    assert sorted(r["doc_id"] for r in null_rows) == sorted(want)


def _write_events_fixture(spark, tmp_path, rows):
    """Write a tiny events.parquet shaped like the testdata table and
    return the sf_dir the ops load from."""
    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        f"{sf_dir}/events.parquet"
    )
    return sf_dir


def test_events_funnel_incomplete_dropoff(spark, tmp_path):
    """Mid-funnel drop-off must COUNT as drop-off, not crash: under
    Spark 4's default ANSI mode element_at(empty, 1) throws, so a user
    with no later click/purchase used to kill the whole query. (Both sf
    fixtures coincidentally convert 100%, hence this dedicated case.)"""
    from curator_spark.ops import relational

    rows = [
        # user 1: full funnel
        (1, "2024-01-01 10:00:00", 1, "signup", 1.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "click", None, "{}"),
        (3, "2024-01-01 12:00:00", 1, "purchase", 9.0, "{}"),
        # user 2: signup only — the ANSI crash case
        (4, "2024-01-01 10:30:00", 2, "signup", 1.0, "{}"),
        # user 3: signup + click, no purchase
        (5, "2024-01-02 09:00:00", 3, "signup", 1.0, "{}"),
        (6, "2024-01-02 09:05:00", 3, "click", None, "{}"),
        # user 4: click BEFORE signup only — ordered funnel must not count it
        (7, "2024-01-02 08:00:00", 4, "click", None, "{}"),
        (8, "2024-01-02 09:30:00", 4, "signup", 1.0, "{}"),
        # user 5: never signs up — excluded from every cohort
        (9, "2024-01-01 10:00:00", 5, "purchase", 3.0, "{}"),
    ]
    sf_dir = _write_events_fixture(spark, tmp_path, rows)
    df = (
        relational.events_funnel(spark, sf_dir)
        .toPandas()
        .set_index("cohort_day")
    )
    d1, d2 = df.loc["2024-01-01"], df.loc["2024-01-02"]
    assert (d1["n_signup"], d1["n_click"], d1["n_purchase"]) == (2, 1, 1)
    assert (d2["n_signup"], d2["n_click"], d2["n_purchase"]) == (2, 1, 0)
    assert d2["purchase_rate"] == 0.0


def test_events_asof_join_null_value_purchase(spark, tmp_path):
    """The matched (most recent) purchase must supply BOTH the value and
    the timestamp — a newest purchase with NULL value yields NULL
    last_purchase_value with ITS OWN lag, never an older purchase's value
    paired with the newer timestamp (DuckDB's ASOF JOIN semantics)."""
    from curator_spark.ops import relational

    rows = [
        (1, "2024-01-01 10:00:00", 1, "purchase", 5.0, "{}"),
        (2, "2024-01-01 11:00:00", 1, "purchase", None, "{}"),
        (3, "2024-01-01 12:00:00", 1, "click", 0.5, "{}"),
        # user 2: click with no prior purchase at all
        (4, "2024-01-01 12:00:00", 2, "click", 0.5, "{}"),
    ]
    sf_dir = _write_events_fixture(spark, tmp_path, rows)
    out = {
        r["event_id"]: r
        for r in relational.events_asof_join(spark, sf_dir).collect()
    }
    r3 = out[3]
    assert r3["last_purchase_value"] is None  # matched row's NULL, not 5.0
    assert r3["asof_lag_us"] == 3_600_000_000  # lag to 11:00, not 10:00
    r4 = out[4]
    assert r4["last_purchase_value"] is None and r4["asof_lag_us"] is None


def test_curation_split_independent_of_selection(spark):
    """The train/val/test hash is domain-separated from the quota-sample
    ranking key: unsalted, the selected (smallest-md5) docs all landed
    below the test/val cutoffs and 'train' starved to zero."""
    from curator_spark.ops import text

    sel = text.curation_final_selection(spark, SF_DIR).toPandas()
    counts = sel["split"].value_counts()
    assert counts.get("train", 0) > 0.5 * len(sel)
    assert set(counts.index) <= {"train", "val", "test"}


def test_lang_alpha_sample_allocation(spark):
    """Alpha-sampling invariants: integer-exact quota ∝ sqrt(cnt) with a
    floor of 1 (recomputed here in plain Python), per-language row count
    = min(quota, cnt), selection = the quota smallest md5 keys, and the
    boost property — a low-resource language's share of the sample
    strictly exceeds its share of the corpus (that is alpha<1's point)."""
    import hashlib
    import math

    from curator_spark.ops.text import lang_alpha_sample

    sf = "/root/testdata/sf0.001"
    out = lang_alpha_sample(spark, sf, target_total=120).toPandas()
    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "lang").toPandas()
    cnts = docs.groupby("lang", dropna=False).size().to_dict()
    w = {l: math.floor(math.sqrt(c) * 1e6) for l, c in cnts.items()}
    W = sum(w.values())
    want_q = {l: max(1, (120 * wv) // W) for l, wv in w.items()}
    got_q = dict(out.drop_duplicates("lang")[["lang", "lang_quota"]].values)
    assert {k: int(v) for k, v in got_q.items()} == {
        k: v for k, v in want_q.items() if k in got_q
    }
    for lang, grp in out.groupby("lang", dropna=False):
        assert len(grp) == min(want_q[lang], cnts[lang])
        pool = docs.loc[docs.lang == lang, "doc_id"]
        want = sorted(
            pool, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )[: want_q[lang]]
        assert sorted(grp["doc_id"]) == sorted(want)
    # boost: smallest language overrepresented vs its corpus share
    smallest = min(cnts, key=cnts.get)
    corpus_share = cnts[smallest] / len(docs)
    sample_share = (out.lang == smallest).mean()
    assert sample_share > corpus_share


def test_indexed_ann_twins_equal_inflight(spark):
    """The gate-facing ensure-wrapper paths (ivf/lsh_topk_from_index)
    must return row-identical results to the in-flight queries — that
    identity is why they share oracles in __spark_entry__."""
    from curator_spark.ops import similarity as sim

    sf = "/root/testdata/sf0.001"
    assert sim.ivf_topk_from_index(spark, sf).collect() == sim.ivf_topk(
        spark, sf
    ).collect()
    assert sim.lsh_topk_from_index(spark, sf).collect() == sim.lsh_topk(
        spark, sf
    ).collect()
