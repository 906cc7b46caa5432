"""Similarity search over the ``embeddings`` table (array<float> column).

- brute-force cosine top-k: the exact baseline, pure higher-order SQL
  functions (dot product via zip_with + aggregate, JVM-side).
- IVF top-k: scale path #1 — k-means-style coarse quantizer (deterministic
  seeded centroids refined with a few Lloyd iterations on a sample),
  probe the nearest ``n_probe`` cells only. At 10^9 vectors the brute-force
  scan is O(n·d) per query; IVF scans n_probe/n_cells of it.
- LSH top-k: scale path #2 — 8x8-bit signed-random-projection band
  buckets; a query probes ~bands/2^bits of the table. Both paths have
  materialized, partition-pruned index twins (``build_ivf_index`` /
  ``build_lsh_index``).

All float math is float32→float64 element casts + sequential fold, so the
brute-force results hash-match the DuckDB oracle exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load


def _cosine(x: Column, y: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nx = F.sqrt(F.aggregate(x, F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")))
    ny = F.sqrt(F.aggregate(y, F.lit(0.0), lambda a, v: a + v.cast("double") * v.cast("double")))
    # zero-norm guard: 0/0 = NaN and Spark sorts NaN GREATEST, so a single
    # all-zeros embedding would otherwise rank #1 in every desc top-k
    return F.when((nx > 0) & (ny > 0), dot / (nx * ny)).otherwise(F.lit(0.0))


def query_vectors(spark: SparkSession, sf_dir: str, vec_ids: tuple[int, ...]) -> dict[int, list[float]]:
    """All requested vectors in ONE Spark job (an isin filter), not one
    driver round-trip per id."""
    rows = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin([int(i) for i in vec_ids]))
        .select("vec_id", "embedding")
        .collect()
    )
    return {int(r[0]): list(r[1]) for r in rows}


def query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    return query_vectors(spark, sf_dir, (vec_id,))[vec_id]


def ann_cosine_topk(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Exact top-k by cosine vs the vec_id=0 embedding (ties → vec_id asc)."""
    emb = load(spark, sf_dir, "embeddings")
    q = F.array(*[F.lit(float(np.float32(v))) for v in query_vector(spark, sf_dir, 0)])
    return (
        emb.select("vec_id", F.round(_cosine(F.col("embedding"), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def lsh_topk(spark: SparkSession, sf_dir: str, k: int = 10, query_id: int = 0) -> DataFrame:
    """LSH-bucketed approximate top-k by cosine vs the ``query_id``
    embedding — the second scale path next to IVF: vectors hash into
    24x12-bit signed-random-projection band buckets; the query MULTI-PROBES
    its own bucket plus the :data:`ANN_MULTIPROBE` lowest-margin perturbed
    buckets per band (:func:`lsh_probe_keys`), and exact cosine ranks only
    the candidates sharing ≥1 probed bucket (ties → vec_id asc).

    Scale shape: the band-key pass is one vectorized ``ArrowEvalPython``
    batch matmul over the table — at 10^9+ vectors the stacked
    (vec_id, bucket) table is materialized ONCE (:func:`build_lsh_index`)
    and each query is a pruned bucket lookup, never a full-table cosine.
    The probe set is computed driver-side from the query vector (bands ·
    (1+probes) integer keys); the oracle inlines the SAME probe pairs
    (via :func:`lsh_probe_keys`) plus the planes as '%.6e' literals, so
    bucket selection cannot drift across engines. Candidate fraction is
    measured, not assumed — see :func:`lsh_candidates` and the BENCH
    ``lsh_candidate_frac`` / ``lsh_clustered`` extras (~29% at the
    default depth on either geometry; clustered corpora reach their
    recall target at much smaller depths, so deployments dial
    ``ANN_MULTIPROBE`` down against the logged curve)."""
    emb = load(spark, sf_dir, "embeddings")
    qv = np.array([np.float32(v) for v in query_vector(spark, sf_dir, query_id)], dtype=np.float64)
    q = F.array(*[F.lit(float(v)) for v in qv])
    return (
        emb.join(lsh_candidates(spark, sf_dir, query_id=query_id, _qv=qv), "vec_id")
        .select("vec_id", F.round(_cosine(F.col("embedding"), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def lsh_candidates(
    spark: SparkSession, sf_dir: str, query_id: int = 0, _qv: np.ndarray | None = None
) -> DataFrame:
    """The distinct vec_ids sharing ≥1 multi-probed band bucket with the
    ``query_id`` vector — the candidate set :func:`lsh_topk` ranks, split
    out so the bench can LOG the realized candidate fraction per run
    instead of quoting a design-time estimate."""
    emb = load(spark, sf_dir, "embeddings")
    if _qv is None:
        _qv = np.array(
            [np.float32(v) for v in query_vector(spark, sf_dir, query_id)], dtype=np.float64
        )
    probe = [f"{b}:{key}" for b, key in lsh_probe_keys(_qv)]
    band_keys = _band_keys_udf()
    stacked = emb.select(
        "vec_id",
        F.explode(
            F.transform(band_keys(F.transform("embedding", lambda x: x.cast("double"))),
                        lambda key, i: F.concat_ws(":", i, key))
        ).alias("bucket"),
    )
    return stacked.filter(F.col("bucket").isin(probe)).select("vec_id").distinct()


def _quantize6e(arr: np.ndarray) -> np.ndarray:
    """Quantize to the exact doubles that '%.6e' SQL literals parse to —
    the same trick EMB_PLANES uses (ops/dedup.py): after this, the Spark
    UDF and the DuckDB oracle hold bit-identical centroid values."""
    return np.array([[float(f"{v:.6e}") for v in row] for row in arr])


# LSH-bucketed ANN (the brief's "IVF or LSH-bucketed variant"): 24 bands
# x 12 bits with MULTI-PROBE (Lv et al. 2007, public): per band the query
# probes its own bucket plus the ``ANN_MULTIPROBE`` perturbed buckets
# reached by flipping the lowest-|margin| sign bits (the bits most likely
# to disagree with a true neighbor). Geometry chosen on measured evidence
# (BENCH extra ``lsh_recall_curve``): this table's true neighbors sit at
# cos ≈ 0.31-0.41 over a near-random background (median pairwise cos ≈
# 0.003) — the WORST case for SRP-LSH — and the round-4 single-probe 8x8
# family retrieved only recall@10 ≈ 0.3 at ~3% of the table. 24x12+48
# probes lifts query-0 recall@10 to 1.0 (sf0.1; mean over 30 queries
# 0.89) at a measured ~29% candidate fraction. The fraction is a
# function of the probe BUDGET (depth 48 costs ~29% on clustered
# geometry too — measured, bench.lsh_clustered_evidence); what geometry
# changes is the recall a given depth buys: on a clustered corpus depth
# 4-8 already reaches 0.79-0.89 recall at a 5-8% fraction, so real
# deployments dial ANN_MULTIPROBE down against the per-run logged curve
# (``lsh_recall_curve``/``lsh_candidate_frac``) instead of assuming a
# fraction.
ANN_LSH_BANDS = 24
ANN_LSH_BITS = 12
ANN_LSH_DIM = 64
# multi-probe budget: per band, the 48 lowest-score perturbations over
# subsets of ≤4 flipped bits (score = summed |margin| of the flips)
ANN_MULTIPROBE = 48
ANN_MULTIPROBE_MAXFLIPS = 4


def lsh_probe_keys(
    qv: np.ndarray,
    n_perturb: int = ANN_MULTIPROBE,
    max_flips: int = ANN_MULTIPROBE_MAXFLIPS,
) -> list[tuple[int, int]]:
    """Multi-probe bucket set for one query vector: for every band, the
    base key plus the ``n_perturb`` perturbed keys whose flipped bits have
    the smallest summed |dot margin| (Lv et al. 2007 — a bit whose
    hyperplane dot is near zero is the bit a true neighbor most likely
    disagrees on). Returns deterministic, duplicate-free, sorted
    (band, key) pairs.

    This is THE probe-set definition, shared verbatim by the in-flight
    query (:func:`lsh_topk`), the materialized-index query
    (:func:`lsh_topk_indexed`) and the DuckDB oracle generator
    (``__spark_entry__.oracle_sql`` inlines its output as literals) — one
    definition, zero cross-engine drift in bucket selection. The only
    remaining cross-engine risk stays in the per-VECTOR band keys (BLAS
    batch matmul vs the oracle's sequential fold at |dot| ~ 1e-13), the
    documented accepted risk shared with ops/dedup.embedding_near_dups."""
    import itertools

    qv = np.asarray(qv, dtype=np.float64)
    if qv.shape[0] != ANN_LSH_DIM:
        raise ValueError(
            f"embedding dim {qv.shape[0]} != ANN_LSH_DIM {ANN_LSH_DIM}: regenerate "
            "ANN_PLANES for this table's dimensionality"
        )
    dots = qv @ ANN_PLANES.T
    bits = dots > 0
    combs: list[tuple[int, ...]] = []
    for r in range(1, max_flips + 1):
        combs += list(itertools.combinations(range(ANN_LSH_BITS), r))
    pairs: set[tuple[int, int]] = set()
    for b in range(ANN_LSH_BANDS):
        base = sum(int(bits[b * ANN_LSH_BITS + j]) << j for j in range(ANN_LSH_BITS))
        pairs.add((b, base))
        m = np.abs(dots[b * ANN_LSH_BITS : (b + 1) * ANN_LSH_BITS])
        # tuple tie-break (score, flips) keeps the order total and
        # identical on every engine/platform for equal-score subsets
        scored = sorted((float(sum(m[j] for j in cb)), cb) for cb in combs)
        for _score, cb in scored[:n_perturb]:
            key = base
            for j in cb:
                key ^= 1 << j
            pairs.add((b, key))
    return sorted(pairs)


def _ann_planes() -> np.ndarray:
    """Deterministic SRP hyperplanes for the search family, quantized to
    the exact doubles the oracle's '%.6e' literals parse to (the same
    trick as ops/dedup.EMB_PLANES)."""
    rng = np.random.default_rng(20260818)
    return _quantize6e(rng.standard_normal((ANN_LSH_BANDS * ANN_LSH_BITS, ANN_LSH_DIM)))


ANN_PLANES = _ann_planes()


def _band_keys_udf():
    """The ONE SRP band-key kernel, shared by the in-flight probe path
    (:func:`lsh_topk`) and the materialized index build
    (:func:`build_lsh_index`). They must pack sign bits into band keys
    identically — a divergence would make ``lsh_topk_indexed`` probe
    buckets the index never wrote — so the kernel exists exactly once."""
    planes = ANN_PLANES

    @F.pandas_udf("array<int>")
    def band_keys(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        E = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (E @ planes.T) > 0
        keys = np.zeros((len(E), ANN_LSH_BANDS), dtype=np.int64)
        for b in range(ANN_LSH_BANDS):
            for j in range(ANN_LSH_BITS):
                keys[:, b] |= bits[:, b * ANN_LSH_BITS + j].astype(np.int64) << j
        return pd.Series([row for row in keys.astype(np.int32)])

    return band_keys


# XXH64 primes (public algorithm, Collet) — Spark's xxhash64(long) is
# XXH64 over the 8-byte value with seed 42; replicated here so the
# oracle generator can select the SAME seeded sample Spark selects.
_XXP1, _XXP2, _XXP3, _XXP4, _XXP5 = (
    0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
    0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
)
_M64 = (1 << 64) - 1


def _xxhash64_long(value: int, seed: int = 42) -> int:
    """Spark-compatible ``xxhash64`` of one LongType value (signed result).
    Parity is asserted against the real Spark expression in
    tests/test_ops.py::test_xxhash64_replica_matches_spark — the sampled
    branch of ivf_oracle_params only fires on tables > 2048 rows, so the
    replica needs its own direct coverage."""

    def rotl(x: int, r: int) -> int:
        return ((x << r) | (x >> (64 - r))) & _M64

    v = value & _M64
    h = (seed + _XXP5 + 8) & _M64
    k1 = rotl((v * _XXP2) & _M64, 31) * _XXP1 & _M64
    h = (rotl(h ^ k1, 27) * _XXP1 + _XXP4) & _M64
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _train_centroids(vecs: np.ndarray, n_cells: int, iters: int = 5) -> np.ndarray:
    """Deterministic Lloyd iterations from seeded init (public k-means).
    A sample smaller than n_cells degrades to len(sample) cells (the probe
    then simply covers a larger fraction) instead of raising."""
    n_cells = max(1, min(n_cells, len(vecs)))
    rng = np.random.default_rng(42)
    cent = vecs[rng.choice(len(vecs), size=n_cells, replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((vecs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                cent[c] = vecs[m].mean(axis=0)
    return cent


#: process-level memo of trained centroids keyed by (application, table
#: path, table mtime, n_cells) — see _trained_centroids
_CENT_CACHE: dict[tuple, np.ndarray | None] = {}


def _trained_centroids(
    spark: SparkSession, sf_dir: str, n_cells: int
) -> np.ndarray | None:
    """:func:`_train_from_table` memoized per (application, embeddings
    path, file mtime, n_cells). Training runs a count + a bounded
    collect — two real Spark jobs at DataFrame-CONSTRUCTION time, which
    plan-only consumers and repeat callers (bench runs each query ×3)
    would otherwise pay per call. Determinism makes the memo safe: the
    output is a pure function of the table contents, and the mtime key
    invalidates on rewrite (same protocol as ensure_dedup_index)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(src),
        os.path.getmtime(src) if os.path.exists(src) else None,
        n_cells,
    )
    if key not in _CENT_CACHE:
        _CENT_CACHE[key] = _train_from_table(
            spark, load(spark, sf_dir, "embeddings"), n_cells
        )
    return _CENT_CACHE[key]


def _train_from_table(spark: SparkSession, emb: DataFrame, n_cells: int) -> np.ndarray | None:
    """THE deterministic IVF training path, shared by :func:`ivf_topk`,
    :func:`build_ivf_index`, and (re-expressed outside Spark)
    :func:`ivf_oracle_params` — one definition so the three can never
    drift. Returns '%.6e'-quantized centroids, or None for an empty
    table.

    Seeded hash sample: deterministic (pure function of vec_id), unbiased
    (xxhash64 decorrelates from any id ordering), and bounded (~2048-4096
    rows collected regardless of table size). A bare limit() has no
    row-order guarantee and an orderBy().limit() trains on the lowest
    ids — non-representative at scale."""
    n = emb.count()
    rate = max(1, int(n) // 2048)
    rows = (
        emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(rate)) == 0)
        .select("vec_id", "embedding")
        .orderBy("vec_id")  # stable row order into the seeded k-means init
        .collect()
    )
    # fail LOUD on malformed vectors at the driver (the bounded sample is
    # already here — zero extra jobs): a NULL/ragged vector would
    # otherwise surface as an opaque "inhomogeneous shape" numpy error
    # from inside np.asarray, hiding which row is at fault
    bad = [r[0] for r in rows if r[1] is None]
    if bad:
        raise ValueError(
            f"embeddings table has NULL vector(s) (e.g. vec_id {bad[:3]}): "
            "IVF training has no semantics for a missing embedding — "
            "filter or impute them upstream"
        )
    sample = np.asarray([r[1] for r in rows], dtype=np.float64)
    if sample.size == 0:
        return None
    return _quantize6e(_train_centroids(sample, n_cells))


def _cell_assigner(spark: SparkSession, cent: np.ndarray):
    """Broadcast-centroid nearest-cell pandas UDF (shared by the in-flight
    query and the index builder)."""
    cent_b = spark.sparkContext.broadcast(cent)

    @F.pandas_udf("int")
    def cell_of(vecs: pd.Series) -> pd.Series:
        c = cent_b.value  # (n_cells, d)
        if len(vecs) == 0:
            return pd.Series([], dtype=np.int32)
        E = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        # argmin over squared distance via one matmul per batch:
        # ||e-c||^2 = ||e||^2 - 2 e·c + ||c||^2 (||e||^2 constant per row)
        d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (E @ c.T)
        return pd.Series(d2.argmin(axis=1).astype(np.int32))

    return cell_of


def ivf_topk(
    spark: SparkSession, sf_dir: str, k: int = 10, n_cells: int = 16, n_probe: int = 4
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid cell
    (vectorized pandas UDF, centroids broadcast), prune to the query's
    ``n_probe`` nearest cells, exact cosine within.

    At cluster scale the cell id becomes a partition column of the vector
    table, so a probe reads n_probe partitions instead of the full table
    (partition pruning does the work — no custom index server; see
    :func:`build_ivf_index` for the materialized form).

    Oracle story: training is deterministic (seeded hash sample → seeded
    Lloyd) and the trained centroids are quantized to '%.6e' doubles, so
    :func:`ivf_oracle_params` can replicate them EXACTLY outside Spark
    and the whole assign→probe→cosine plan becomes DuckDB-expressible
    (hash-compared by the driver). Residual cross-engine risk: the cell
    argmin is computed via one BLAS matmul here vs a sequential fold in
    SQL — an assignment could flip only if two centroids sit within
    ~1e-13 of equidistant from a vector, negligible for continuous data
    (same accepted risk as the SRP band keys, ops/dedup.py)."""
    emb = load(spark, sf_dir, "embeddings")
    cent = _trained_centroids(spark, sf_dir, n_cells)
    if cent is None:  # empty table: nothing to probe, empty result
        return emb.select("vec_id", F.lit(0.0).alias("cos_sim")).limit(0)
    cell_of = _cell_assigner(spark, cent)
    qvec = query_vector(spark, sf_dir, 0)  # fetched once, reused below
    qv = np.asarray(qvec, dtype=np.float64)
    probe_cells = np.argsort(((cent - qv) ** 2).sum(axis=1))[:n_probe].tolist()

    q = F.array(*[F.lit(float(np.float32(v))) for v in qvec])
    return (
        emb.withColumn("cell", cell_of("embedding"))
        .filter(F.col("cell").isin([int(c) for c in probe_cells]))
        .select("vec_id", F.round(_cosine(F.col("embedding"), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def build_ivf_index(
    spark: SparkSession, sf_dir: str, index_dir: str, n_cells: int = 16
) -> np.ndarray:
    """Materialize the IVF index the :func:`ivf_topk` docstring promises:
    the embeddings table rewritten PARTITIONED BY its centroid cell
    (hive layout ``cell=<id>/``) plus the trained centroids as JSON.
    After this, probing is *partition pruning* — a query reads n_probe
    directories out of n_cells and never opens the rest (asserted via
    ``inputFiles()`` in tests). At 10^9+ vectors this is the difference
    between scanning the table per query and scanning n_probe/n_cells
    of it; no custom index server, just catalog metadata."""
    import json
    import os

    emb = load(spark, sf_dir, "embeddings")
    cent = _trained_centroids(spark, sf_dir, n_cells)
    if cent is None:
        raise ValueError(f"cannot build an IVF index over an empty table ({sf_dir})")
    cell_of = _cell_assigner(spark, cent)

    (
        emb.withColumn("cell", cell_of("embedding"))
        # cluster rows by cell before the partitioned write: one shuffle
        # at build time buys one-file-per-cell layout (vs every input
        # task writing a sliver into every cell directory)
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(index_dir, "vectors"))
    )
    with open(os.path.join(index_dir, "centroids.json"), "w") as fh:
        json.dump([[float(v) for v in row] for row in cent], fh)
    return cent


def ivf_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Query a :func:`build_ivf_index` index: pick the ``n_probe`` nearest
    cells driver-side from the stored centroids, then let the hive
    partition filter prune the scan to those directories. Exact cosine
    within the probed cells only.

    The query vector is quantized to float32 exactly like
    :func:`ivf_topk`/:func:`ann_cosine_topk` quantize theirs (the stored
    embeddings are float32), so the indexed and in-flight paths return
    identical scores for the same query — without this, an
    externally-computed float64 query could flip a near-tie at the k
    boundary between the two paths."""
    import json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as fh:
        cent = np.asarray(json.load(fh), dtype=np.float64)
    q32 = [float(np.float32(v)) for v in query_vec]
    qv = np.asarray(q32, dtype=np.float64)
    probe = np.argsort(((cent - qv) ** 2).sum(axis=1))[:n_probe].tolist()
    q = F.array(*[F.lit(v) for v in q32])
    vecs = spark.read.parquet(os.path.join(index_dir, "vectors"))
    return (
        vecs.filter(F.col("cell").isin([int(c) for c in probe]))
        .select("vec_id", F.round(_cosine(F.col("embedding"), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


# bucket-group width for the index layout: bkey >> 6 → 64 hive
# directories per band (24·64 = 1536 total) instead of one per bucket
# (24·4096 = 98304 — pathological file counts at small scale, metadata
# pressure at large). The exact bkey stays a DATA column, sorted within
# partitions, so parquet min/max + dictionary filters prune inside a
# group — two-level pruning: hive on (band, bgrp), row-group on bkey.
ANN_LSH_BGRP_SHIFT = 6


def build_lsh_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Materialize the LSH index the :func:`lsh_topk` docstring promises:
    the embeddings table rewritten once per band, hive-PARTITIONED BY
    (band, bgrp = bkey >> 6) with the exact ``bkey`` kept as a sorted
    data column. A multi-probe query opens only the probed group
    directories (partition pruning) and inside each group the pushed
    ``bkey`` filter skips non-matching row groups (parquet min/max +
    dictionary) — no index server, just catalog metadata + parquet
    statistics. The classic LSH trade is explicit: vectors are stored
    once PER BAND (24× here) to make every probe a pruned scan; at
    petabyte scale the same layout holds with (band, bkey)→vec_id
    postings plus a vec_id-bucketed primary table when 24× full-row
    copies are too dear — the probe plan is identical, plus one
    co-partitioned join. Build is one batch-matmul pass + one
    clustering shuffle."""
    import os

    emb = load(spark, sf_dir, "embeddings")
    band_keys = _band_keys_udf()

    (
        emb.select(
            "vec_id",
            "embedding",
            F.posexplode(
                band_keys(F.transform("embedding", lambda x: x.cast("double")))
            ).alias("band", "bkey"),
        )
        .withColumn("bgrp", F.shiftright("bkey", ANN_LSH_BGRP_SHIFT))
        # cluster by group before the partitioned write (one file per
        # group directory instead of a sliver from every input task),
        # sorted by bkey so row-group min/max stats prune within a group
        .repartition("band", "bgrp")
        .sortWithinPartitions("bkey")
        .write.mode("overwrite")
        .partitionBy("band", "bgrp")
        .parquet(os.path.join(index_dir, "vectors"))
    )


def lsh_topk_indexed(
    spark: SparkSession, index_dir: str, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Query a :func:`build_lsh_index` index: the multi-probe (band, bkey)
    pairs are computed driver-side by the SAME :func:`lsh_probe_keys`
    kernel the in-flight path uses, pushed as hive partition filters on
    (band, bgrp) plus parquet-pruned bkey filters. Candidates dedup on
    vec_id (a vector can share several probed buckets with the query)
    before the exact-cosine rank, so scores match :func:`lsh_topk`
    exactly. The query vector is float32-quantized like every other
    search path."""
    import os

    q32 = [float(np.float32(v)) for v in query_vec]
    qv = np.asarray(q32, dtype=np.float64)
    q = F.array(*[F.lit(v) for v in q32])
    vecs = spark.read.parquet(os.path.join(index_dir, "vectors"))
    by_band: dict[int, list[int]] = {}
    for b, key in lsh_probe_keys(qv):
        by_band.setdefault(b, []).append(key)
    probe = None
    for b, keys in by_band.items():
        grps = sorted({key >> ANN_LSH_BGRP_SHIFT for key in keys})
        cond = (F.col("band") == b) & F.col("bgrp").isin(grps) & F.col("bkey").isin(keys)
        probe = cond if probe is None else (probe | cond)
    return (
        vecs.filter(probe)
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])
        .select("vec_id", F.round(_cosine(F.col("embedding"), q), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def lsh_oracle_probe_pairs(sf_dir: str, query_id: int = 0) -> list[tuple[int, int]]:
    """Replicate :func:`lsh_topk`'s driver-side probe-set computation
    OUTSIDE Spark (pyarrow read → the same float32 quantization
    ``query_vector`` returns → the shared :func:`lsh_probe_keys`), so the
    oracle SQL can inline the exact (band, bkey) pairs the Spark query
    will probe. Same pattern as :func:`ivf_oracle_params`."""
    import os

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    ids = tbl["vec_id"].to_numpy()
    pos = np.flatnonzero(ids == query_id)
    if len(pos) == 0:
        raise ValueError(f"query vec_id {query_id} not present in {sf_dir}")
    qv_list = tbl["embedding"].to_pylist()[int(pos[0])]
    qv = np.array([np.float32(v) for v in qv_list], dtype=np.float64)
    return lsh_probe_keys(qv)


def ivf_oracle_params(
    sf_dir: str, n_cells: int = 16, n_probe: int = 4
) -> tuple[np.ndarray, list[int]]:
    """Replicate :func:`ivf_topk`'s deterministic training OUTSIDE Spark
    (pyarrow read → xxhash64-parity sample → seeded Lloyd → '%.6e'
    quantization) so the oracle SQL can inline the exact centroid doubles
    the Spark UDF will use. Returns (centroids, probe_cell_ids)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    tbl = pq.read_table(path, columns=["vec_id", "embedding"])
    ids = tbl["vec_id"].to_numpy()
    n = len(ids)
    rate = max(1, n // 2048)
    if rate == 1:
        sel = np.ones(n, dtype=bool)
    else:
        sel = np.array([_xxhash64_long(int(i)) % rate == 0 for i in ids])
    embs = tbl["embedding"].to_pylist()
    order = np.argsort(ids[sel], kind="stable")  # Spark samples orderBy(vec_id)
    sample = np.asarray(
        [embs[i] for i in np.flatnonzero(sel)[order]], dtype=np.float64
    )
    cent = _quantize6e(_train_centroids(sample, n_cells))
    qv = np.asarray(embs[int(np.flatnonzero(ids == 0)[0])], dtype=np.float64)
    probe = np.argsort(((cent - qv) ** 2).sum(axis=1))[:n_probe].tolist()
    return cent, [int(c) for c in probe]


CENTROID_IDS = (0, 7, 19, 42)


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step (the inner loop of Lloyd / IVF training):
    nearest-centroid per vector against fixed centroids (the embeddings of
    ``CENTROID_IDS``), rolled up per cluster. Fully SQL-expressible —
    sequential-fold double math matches the DuckDB oracle bit-exactly."""
    emb = load(spark, sf_dir, "embeddings")
    cvecs = query_vectors(spark, sf_dir, CENTROID_IDS)  # one job for all four
    cents = [
        F.array(*[F.lit(float(np.float32(v))) for v in cvecs[cid]]) for cid in CENTROID_IDS
    ]

    def dist2(x: Column, c: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, c, lambda p, q: (p.cast("double") - q.cast("double")) ** 2),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    darr = F.array(*[dist2(F.col("embedding"), c) for c in cents])
    cluster = (F.array_position(darr, F.array_min(darr)) - 1).cast("int")
    dist = F.round(F.sqrt(F.array_min(darr)), 6).cast("decimal(28,6)")
    return (
        emb.select(cluster.alias("cluster"), dist.alias("dist"))
        .groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.avg("dist").cast("double").alias("mean_dist"),
        )
        .withColumn("mean_dist", F.round("mean_dist", 6))
        .orderBy("cluster")
    )


def _ensure_index(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Build-if-missing cache of :func:`build_ivf_index` /
    :func:`build_lsh_index` for the gate/bench surfaces, keyed by the
    embeddings table's path and mtime — the same marker-file protocol as
    ``dedup.ensure_dedup_index`` (marker written only after a complete
    build, so a killed build re-runs instead of serving a torn index).
    At scale the build runs once per corpus snapshot as its own job;
    this wrapper exists so (spark, sf_dir)-shaped consumers can reach
    the materialized path without orchestrating that job by hand."""
    import hashlib
    import shutil

    src = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.blake2b(
        f"{kind}|{os.path.abspath(src)}|{os.path.getmtime(src)}".encode(),
        digest_size=8,
    ).hexdigest()
    root = os.path.join("/tmp/curator_bench", f"{kind}_idx_{tag}")
    marker = os.path.join(root, "_BUILT")
    if not os.path.exists(marker):
        shutil.rmtree(root, ignore_errors=True)
        if kind == "ivf":
            build_ivf_index(spark, sf_dir, root)
        else:
            build_lsh_index(spark, sf_dir, root)
        with open(marker, "w") as fh:
            fh.write(sf_dir)
    return root


def ivf_topk_from_index(
    spark: SparkSession, sf_dir: str, k: int = 10, n_probe: int = 4
) -> DataFrame:
    """:func:`ivf_topk` served from the MATERIALIZED partition-pruned
    index (build cached per table snapshot): identical results by
    construction — same deterministic training (shared
    :func:`_trained_centroids`), same probe-cell selection, same
    float32-quantized query — so it shares ivf_topk's oracle, and a
    driver-green row attests the 100 TB form of the query, not just the
    in-flight one."""
    idx = _ensure_index(spark, sf_dir, "ivf")
    return ivf_topk_indexed(
        spark, idx, query_vector(spark, sf_dir, 0), k=k, n_probe=n_probe
    )


def lsh_topk_from_index(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """:func:`lsh_topk` served from the MATERIALIZED two-level-pruned
    index — same shared probe kernel (:func:`lsh_probe_keys`), same
    candidate set, same exact-cosine rank, so it shares lsh_topk's
    oracle. See :func:`ivf_topk_from_index` for why this gates
    separately from the in-flight path."""
    idx = _ensure_index(spark, sf_dir, "lsh")
    return lsh_topk_indexed(spark, idx, query_vector(spark, sf_dir, 0), k=k)
