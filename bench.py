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


def recall_curves(sf_dir: str, k: int = 10) -> tuple[dict, dict]:
    """Machine-readable evidence behind the ANN probe defaults (round-4
    VERDICT tasks #1/#8): (a) IVF recall@10 vs n_probe 1..16 and (b)
    multi-probe LSH recall@10 + candidate fraction vs per-band probe
    depth, both for query vec_id=0 at this SF. Computed OUTSIDE Spark
    with the same deterministic kernels the Spark UDFs execute
    (ivf_oracle_params replicates training bit-exactly; lsh_probe_keys
    IS the production probe kernel; band keys/cell argmin share the
    documented ~1e-13 BLAS-order caveat), so the curves cost 20 numpy
    sweeps instead of 20 extra Spark jobs per bench run. The DEFAULT
    operating points additionally ship as real Spark-path measurements
    (ivf_recall_at_10*, lsh_recall_at_10, lsh_candidate_frac)."""
    import numpy as np
    import pyarrow.parquet as pq

    from curator_spark.ops import similarity as sim

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = tbl["vec_id"].to_numpy()
    E = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(E, axis=1)
    qi = int(np.flatnonzero(ids == 0)[0])
    qv = E[qi]
    cos = (E @ qv) / np.where(norms > 0, norms * norms[qi], np.inf)
    top = set(ids[np.lexsort((ids, -cos))[:k]].tolist())

    # IVF: exact replication of training + assignment (shared kernel)
    cent, _ = sim.ivf_oracle_params(sf_dir)
    d2 = ((E[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)
    cell_order = np.argsort(((cent - qv) ** 2).sum(axis=1)).tolist()
    ivf_curve = {}
    for n_probe in range(1, len(cent) + 1):
        cand = np.isin(assign, cell_order[:n_probe])
        got, cc = ids[cand], cos[cand]
        sel = set(got[np.lexsort((got, -cc))[:k]].tolist())
        ivf_curve[str(n_probe)] = round(len(sel & top) / k, 3)

    # LSH: band keys once, then sweep the per-band probe depth
    dots = E @ sim.ANN_PLANES.T
    bits = dots > 0
    keys = np.zeros((len(E), sim.ANN_LSH_BANDS), dtype=np.int64)
    for b in range(sim.ANN_LSH_BANDS):
        for j in range(sim.ANN_LSH_BITS):
            keys[:, b] |= bits[:, b * sim.ANN_LSH_BITS + j].astype(np.int64) << j
    lsh_curve = {}
    for depth in (0, 4, 8, 16, 32, sim.ANN_MULTIPROBE, 64):
        pairs = sim.lsh_probe_keys(qv, n_perturb=depth)
        cand = np.zeros(len(E), dtype=bool)
        for b, key in pairs:
            cand |= keys[:, b] == key
        got, cc = ids[cand], cos[cand]
        sel = set(got[np.lexsort((got, -cc))[:k]].tolist())
        lsh_curve[str(depth)] = {
            "recall": round(len(sel & top) / k, 3),
            "cand_frac": round(float(cand.sum()) / len(E), 4),
        }
    return ivf_curve, lsh_curve


def lsh_clustered_evidence(n: int = 20000, n_centers: int = 64, k: int = 10) -> dict:
    """Probe-depth sweep over a deterministic CLUSTERED corpus (n vectors
    around n_centers unit centers, sigma=0.15 noise — the geometry real
    embedding corpora have), same planes and lsh_probe_keys kernel as the
    production path. Published so the probe-depth DEFAULT is chosen on
    evidence for both corpus shapes: the candidate fraction is a function
    of the probe budget (~29% at depth 48 on either fixture), and what
    changes with geometry is the recall a given depth buys — the
    near-random driver fixture (true neighbors at cos≈0.3-0.4, SRP-LSH's
    worst case) needs the full 48 probes for recall 1.0, while HERE
    depth 4-8 already reaches 0.79-0.89 recall at a 5-8% fraction, so a
    clustered deployment would dial ANN_MULTIPROBE down and pay ~6x
    fewer candidates. Mean over 20 spread-out query vectors; pure numpy
    (the Spark path shares these exact kernels)."""
    import numpy as np

    from curator_spark.ops import similarity as sim

    rng = np.random.default_rng(20260819)
    centers = rng.standard_normal((n_centers, sim.ANN_LSH_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_centers, size=n)
    E = centers[assign] + 0.15 * rng.standard_normal((n, sim.ANN_LSH_DIM))
    norms = np.linalg.norm(E, axis=1)
    dots = E @ sim.ANN_PLANES.T
    bits = dots > 0
    keys = np.zeros((n, sim.ANN_LSH_BANDS), dtype=np.int64)
    for b in range(sim.ANN_LSH_BANDS):
        for j in range(sim.ANN_LSH_BITS):
            keys[:, b] |= bits[:, b * sim.ANN_LSH_BITS + j].astype(np.int64) << j
    ids = np.arange(n)
    curve = {}
    for depth in (0, 4, 8, 16, sim.ANN_MULTIPROBE):
        recalls, fracs = [], []
        for qi in range(0, 20 * 997, 997):  # 20 spread-out query rows
            qv = E[qi]
            cos = (E @ qv) / (norms * norms[qi])
            top = set(ids[np.lexsort((ids, -cos))[:k]].tolist())
            cand = np.zeros(n, dtype=bool)
            for b, key in sim.lsh_probe_keys(qv, n_perturb=depth):
                cand |= keys[:, b] == key
            got, cc = ids[cand], cos[cand]
            sel = set(got[np.lexsort((got, -cc))[:k]].tolist())
            recalls.append(len(sel & top) / k)
            fracs.append(float(cand.sum()) / n)
        curve[str(depth)] = {
            "recall": round(float(np.mean(recalls)), 3),
            "cand_frac": round(float(np.mean(fracs)), 4),
        }
    return {"n": n, "n_centers": n_centers, "by_depth": curve}


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
        # round-5: the same decision served from the MATERIALIZED dedup
        # keep-list index — the one-time build runs untimed below, so
        # this row records what every post-index consumer pays
        "curation_from_index": text.curation_from_index,
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

    # one-time index build (untimed): curation_from_index then measures
    # the steady-state consumer cost, which is the number that matters —
    # at scale the index is built once per corpus snapshot
    dedup.ensure_dedup_index(spark, sf_dir)

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

    # retrieval-quality artifact (round-3 VERDICT task #8, extended round
    # 5): recall@10 of the approximate paths vs exact brute-force cosine
    # at this SF — the oracles prove the plans exact, this records what
    # the approximations actually retrieve. One untimed run per default
    # config outside the sample loop; the full recall CURVES (IVF recall
    # vs n_probe 1-16, LSH recall/candidate-fraction vs probe depth) are
    # computed by recall_curves() below via the same deterministic
    # kernels the Spark UDFs run, so the probe defaults are chosen on
    # recorded evidence rather than guessed.
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
    n_emb = similarity.load(spark, sf_dir, "embeddings").count()
    lsh_cand_frac = similarity.lsh_candidates(spark, sf_dir).count() / max(n_emb, 1)
    ivf_curve, lsh_curve = recall_curves(sf_dir)

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
        # 24x12-bit SRP with per-band multi-probe (Lv et al.); the
        # candidate fraction is MEASURED on this run, not assumed — this
        # near-random fixture (true neighbors at cos≈0.3-0.4) is LSH's
        # worst case, see ops/similarity.lsh_topk docstring
        "lsh_recall_at_10": round(lsh_recall, 3),
        "lsh_candidate_frac": round(lsh_cand_frac, 4),
        # evidence curves behind the probe defaults (same deterministic
        # kernels as the Spark UDFs; see recall_curves())
        "ivf_recall_curve": ivf_curve,
        "lsh_recall_curve": lsh_curve,
        "lsh_clustered": lsh_clustered_evidence(),
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
