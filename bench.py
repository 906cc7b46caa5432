"""Benchmark harness — prints ONE JSON line for the driver.

Headline numbers:
- ``clip_pipeline``: the north-rule metric — end-to-end langid + perplexity
  + rules + scrub over the clips table at this SF (clips/sec reported in
  ``extra``). Clips are generated once per SF into a cache dir (generation
  is excluded from the timed run; the pipeline runs against a fresh
  warehouse every time so nothing is served from checkpoints).
- representative testdata queries (scan-agg, join, dedup, ANN, text).

Drift robustness (this sandbox VM's throughput swings 2-3x minute to
minute — verified round 2 by interleaved A/B of identical code): repeats
are INTERLEAVED round-robin across all workloads (so a slow minute taxes
every query equally instead of whichever one it landed on), the reported
per-query time is the MEDIAN of ``REPEATS`` rounds, and a fixed
calibration workload runs each round — its per-round times ship in
``extra.calib_sec`` so cross-round comparisons can be normalized against
machine weather instead of guessed at.

Env: ``SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1),
``SPARK_GRAFT_CPUS`` (default all cores), ``SPARK_GRAFT_BENCH_REPEATS``
(default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CLIPS_PER_SF = 1_000_000  # sf0.1 → 100k clips (FIXTURES.md tiers)


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    return float(base.replace("sf", "")) if base.startswith("sf") else 0.1


def ensure_clips(spark, sf: float, cache_root: str = "/tmp/curator_bench") -> str:
    from curator_spark.synth import clips

    n = max(100, int(CLIPS_PER_SF * sf))
    path = os.path.join(cache_root, f"clips_sf{sf}")
    marker = os.path.join(path, "_GENERATED")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        clips.write_clips(spark, n, path)
        open(marker, "w").write(str(n))
    return path


def calibrate() -> float:
    """Fixed CPU workload (seeded, allocation-free steady loop) timed per
    round: a pure VM-weather gauge. ~0.15s at full speed; 2-3x that when
    the sandbox throttles. Reported, never subtracted — the normalization
    is the READER'S tool for comparing rounds recorded in different
    weather."""
    import numpy as np

    a = np.random.RandomState(0).rand(384, 384)
    t0 = time.monotonic()
    for _ in range(60):
        a @ a
    return time.monotonic() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if cpus == "*":  # session layer accepts '*'; arithmetic below needs an int
        cpus = str(os.cpu_count() or 8)
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    sf = sf_of(sf_dir)

    from curator_spark.catalog import ParquetCatalog
    from curator_spark.config import PipelineConfig
    from curator_spark.ops import dedup, relational, similarity, text
    from curator_spark.pipeline import Pipeline
    from curator_spark.session import build_session
    from curator_spark.synth import clips as clips_mod  # noqa: F401 (import check)
    from curator_spark.warmup import warmup

    spark = build_session(master=f"local[{cpus}]", app_name="curator_spark_bench")

    clips_path = ensure_clips(spark, sf)
    n_clips = int(open(os.path.join(clips_path, "_GENERATED")).read())
    wh = f"/tmp/curator_bench/wh_{os.getpid()}"
    cfg = PipelineConfig(n_partitions=int(cpus) * 2, commit_batches=1)
    # pay CPU-ramp + codegen + Python-worker cold-start before ANY timing
    # (see curator_spark/warmup.py and the sandbox notes above)
    warmup(spark, clips_path, cfg.rules)

    def run_clip_pipeline() -> int:
        shutil.rmtree(wh, ignore_errors=True)
        pipe = Pipeline(spark, ParquetCatalog(spark, wh), cfg)
        pipe.run(clips_path)
        return n_clips

    bench_queries = {
        "q1_pricing_summary": relational.q1_pricing_summary,
        "q3_top_revenue": relational.q3_top_revenue,
        "running_window": relational.running_window,
        "dedup_exact": dedup.dedup_exact,
        "minhash_dup_pairs": dedup.minhash_dup_pairs,
        "simhash_fingerprints": dedup.simhash_fingerprints,
        "ann_cosine_topk": similarity.ann_cosine_topk,
        "token_count": text.token_count,
        # round-2 families: vector near-dup (banded SRP-LSH + verify) and
        # the Gopher repetition rule
        "embedding_near_dups": dedup.embedding_near_dups_fixture,
        "dup_ngram_fraction": text.dup_ngram_fraction,
        # round-3 family: cross-document exact-substring spans (Lee et al.)
        "cross_doc_dup_spans": dedup.cross_doc_dup_spans,
        # round-3 additions: eval-set decontamination (broadcast semi-join
        # membership) and the corpus-trained bigram LM scoring pass
        "decontaminate_ngrams": dedup.decontaminate_ngrams,
        "bigram_self_ppl": text.bigram_self_ppl,
        # round-3 additions: per-doc TF-IDF keywords (explode + two partial
        # aggs + broadcast df join) — the heaviest new text pass
        "tfidf_top_terms": text.tfidf_top_terms,
        # round-4 addition: the terminal composed curation decision
        # (LSH dedup keep-list ∘ per-language quota ∘ hash split)
        "curation_final_selection": text.curation_final_selection,
        # round-4 additions: the event-warehouse quartet's two heaviest
        # shapes — single-pass HOF funnel and collect_set+window retention
        "events_funnel": relational.events_funnel,
        "retention_cohorts": relational.retention_cohorts,
    }

    # the FROZEN round-1 workload: bench totals across rounds mix different
    # query sets, so extra.common_total_sec sums only these nine — directly
    # comparable against the same sum re-derived from BENCH_r01..r03
    common_set = (
        "clip_pipeline", "q1_pricing_summary", "q3_top_revenue",
        "running_window", "dedup_exact", "minhash_dup_pairs",
        "simhash_fingerprints", "ann_cosine_topk", "token_count",
    )

    samples: dict[str, list[float]] = {n: [] for n in ["clip_pipeline", *bench_queries]}
    calib: list[float] = []
    rows_out: dict[str, int] = {}
    for _ in range(repeats):
        calib.append(round(calibrate(), 3))
        t0 = time.monotonic()
        run_clip_pipeline()
        samples["clip_pipeline"].append(time.monotonic() - t0)
        for name, fn in bench_queries.items():
            dedup.clear_session_cache(spark)  # each repeat does FULL work
            t0 = time.monotonic()
            rows_out[name] = fn(spark, sf_dir).count()
            samples[name].append(time.monotonic() - t0)
    shutil.rmtree(wh, ignore_errors=True)

    # retrieval-quality artifact (round-3 VERDICT task #8): recall@10 of
    # the IVF path vs exact brute-force cosine at this SF — the oracle
    # proves the IVF plan exact, this records what the approximation
    # actually retrieves. One untimed run outside the sample loop.
    exact_ids = [r["vec_id"] for r in similarity.ann_cosine_topk(spark, sf_dir, k=10).collect()]
    recalls = {}
    for n_probe in (4, 8):  # default probe + half the 16 cells
        approx = [
            r["vec_id"]
            for r in similarity.ivf_topk(spark, sf_dir, k=10, n_probe=n_probe).collect()
        ]
        recalls[n_probe] = len(set(exact_ids) & set(approx)) / max(len(exact_ids), 1)
    lsh_ids = [r["vec_id"] for r in similarity.lsh_topk(spark, sf_dir, k=10).collect()]
    lsh_recall = len(set(exact_ids) & set(lsh_ids)) / max(len(exact_ids), 1)

    # north-rule gauge (keep/drop F1 >= 0.99 vs reference labels): the
    # engine's labels vs the pure-Python oracle over a fixed 2000-clip
    # slice — machine-readable alongside the per-round timing record.
    # One untimed run; tests/test_stage_parity.py asserts full equality.
    from curator_spark import oracle, stages

    n_f1 = 2000
    got = (
        stages.apply_all(clips_mod.generate_clips(spark, n_f1, 16), cfg.rules)
        .select("clip_id", "keep")
        .toPandas()
    )
    gold = oracle.golden_labels(n_f1, cfg)[["clip_id", "keep"]]
    m = got.merge(gold, on="clip_id", suffixes=("", "_gold"))
    tp = int((m["keep"] & m["keep_gold"]).sum())
    fp = int((m["keep"] & ~m["keep_gold"]).sum())
    fn = int((~m["keep"] & m["keep_gold"]).sum())
    keep_f1 = 2 * tp / max(2 * tp + fp + fn, 1)

    timings = {n: round(statistics.median(v), 3) for n, v in samples.items()}
    extra: dict = {
        "clips_per_sec": round(n_clips / timings["clip_pipeline"], 1),
        "n_clips": n_clips,
        "repeats": repeats,
        "calib_sec": calib,  # per-round VM-weather gauge (see calibrate())
        "drift_ratio": round(max(calib) / min(calib), 3) if calib else None,
        # frozen r01 workload — cross-round-comparable subtotal
        "common_total_sec": round(sum(timings[n] for n in common_set), 3),
        "ivf_recall_at_10": round(recalls[4], 3),        # n_probe=4 of 16 cells
        "ivf_recall_at_10_probe8": round(recalls[8], 3),  # n_probe=8 of 16 cells
        # 8x8-bit SRP probe (~3% of table); low on this near-random
        # table by design — see ops/similarity.lsh_topk docstring
        "lsh_recall_at_10": round(lsh_recall, 3),
        # north-rule keep/drop gauge vs the oracle (fixed 2000-clip slice)
        "keep_f1_vs_oracle": round(keep_f1, 4),
        "keep_f1_n": n_f1,
    }
    for name, n in rows_out.items():
        extra[f"{name}_rows"] = n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "end_to_end_bench_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extra": extra,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
