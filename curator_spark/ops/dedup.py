"""Deduplication operators over the ``documents`` table.

The large-scale training-data-pipeline family: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup. All hashing is md5-based (not
xxhash64) so the MinHash/exact paths are *also* expressible in DuckDB SQL
for the driver's oracle; SimHash and embedding near-dup are Spark-side
(rows-only oracle) but deterministic.

Scale design (10^9+ docs):
- exact:   one shuffle on the 32-hex digest (groupBy), no text comparison.
- minhash: shingle→minhash is a narrow per-row map (higher-order functions,
  codegen); LSH banding turns all-pairs O(n²) into a groupBy on band keys +
  within-bucket pairing — the standard public MinHash-LSH construction
  (Broder '97; Leskovec et al. MMDS ch.3).
- pairs:   self-join only inside buckets; bucket sizes are bounded by the
  band width, and AQE skew-join splits hot buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

N_HASHES = 8
BAND_SIZE = 2  # 4 bands of 2 → catches jaccard ≳ 0.5 pairs


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest (SURVEY §2.6 O5; the reference's
    content-addressed cache identity, llm/llm.py:139-164, applied row-wise).
    Returns one canonical row per distinct text + duplicate count."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.withColumn("digest", F.md5("text"))
        .groupBy("digest")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("dup_count"))
        .orderBy("canonical_id")
    )


def _minhash_cols(k: int = 3) -> list:
    """N_HASHES minhash columns over char-3-shingles of ``text``.

    minhash_j = min over shingles of md5('<j>|' + shingle) — string-min over
    hex digests, identical semantics in Spark and DuckDB.
    """
    text = F.col("text")
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    def mk(j: int):
        # closure factory — a default-arg lambda would make PySpark treat
        # the extra parameter as the transform() index argument
        return lambda i: F.md5(F.concat(F.lit(f"{j}|"), F.substring(text, i, k)))

    return [F.array_min(F.transform(idx, mk(j))).alias(f"mh{j}") for j in range(N_HASHES)]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature (concatenated) + LSH band keys."""
    docs = load(spark, sf_dir, "documents")
    sig = docs.select("doc_id", *_minhash_cols())
    bands = [
        F.md5(
            F.concat_ws("|", *[F.col(f"mh{j}") for j in range(b * BAND_SIZE, (b + 1) * BAND_SIZE)])
        ).alias(f"band{b}")
        for b in range(N_HASHES // BAND_SIZE)
    ]
    return sig.select(
        "doc_id",
        F.concat_ws("", *[F.col(f"mh{j}") for j in range(N_HASHES)]).alias("signature"),
        *bands,
    ).orderBy("doc_id")


def minhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any LSH band bucket.
    The bucket groupBy is the only shuffle; pairing happens within buckets."""
    sigs = minhash_signatures(spark, sf_dir)
    n_bands = N_HASHES // BAND_SIZE
    stacked = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.concat_ws(":", F.lit(str(b)), F.col(f"band{b}")) for b in range(n_bands)
        ])).alias("bucket"),
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates: verify stage of the
    dedup pipeline (candidate generation above; exact set similarity here).
    jaccard = |A∩B| / |A∪B| over distinct char-3-shingle sets."""
    docs = load(spark, sf_dir, "documents")
    k = 3
    idx = F.sequence(F.lit(1), F.greatest(F.length("text") - (k - 1), F.lit(1)))
    sets = docs.select(
        "doc_id",
        F.array_distinct(F.transform(idx, lambda i: F.substring(F.col("text"), i, k))).alias("sh"),
    )
    cand = minhash_dup_pairs(spark, sf_dir)
    a = sets.alias("sa")
    b = sets.alias("sb")
    joined = (
        cand.join(a, cand.doc_a == F.col("sa.doc_id"))
        .join(b, cand.doc_b == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sa.sh", "sb.sh"))
                / F.size(F.array_union("sa.sh", "sb.sh"))
            ).alias("jaccard"),
        )
    )
    return (
        joined.filter(F.col("jaccard") >= threshold)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy("doc_a", "doc_b")
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash (Charikar '02) over whitespace tokens — vectorized
    pandas UDF (bit-vote accumulation has no clean SQL form). Deterministic:
    token hash = FNV-1a, identical across partitionings."""
    from ..synth.textgen import hash_str

    @F.pandas_udf("long")
    def simhash(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            votes = np.zeros(64, dtype=np.int64)
            shifts = np.arange(64, dtype=np.uint64)
            for tok in (t or "").split(" "):
                if not tok:
                    continue
                h = np.uint64(hash_str(tok))
                bits = (h >> shifts) & np.uint64(1)
                votes += np.where(bits == 1, 1, -1)
            fp = 0
            for b in range(64):
                if votes[b] > 0:
                    fp |= 1 << b
            out[i] = np.uint64(fp).astype(np.int64)
        return pd.Series(out)

    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", simhash("text").alias("simhash")).orderBy("doc_id")


def simhash_near_pairs(spark: SparkSession, sf_dir: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, blocked on 16-bit chunks
    (a pair within hamming<=3 of 64 bits must agree on >=1 of 4 chunks —
    pigeonhole blocking, standard public construction)."""
    fps = simhash_fingerprints(spark, sf_dir)
    chunks = fps.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(str(c)), F.shiftrightunsigned("simhash", 16 * c) % (1 << 16))
                for c in range(4)
            ])
        ).alias("block"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming).orderBy("doc_a", "doc_b")


def embedding_near_dups(spark: SparkSession, sf_dir: str, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucketed by random-hyperplane
    signs (deterministic seeded hyperplanes broadcast to executors)."""
    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").head()[0])
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((8, dim))
    planes_b = spark.sparkContext.broadcast(planes)

    @F.pandas_udf("int")
    def lsh_bucket(vecs: pd.Series) -> pd.Series:
        p = planes_b.value
        out = np.empty(len(vecs), dtype=np.int32)
        for i, v in enumerate(vecs):
            a = np.asarray(v, dtype=np.float64)
            bits = (p @ a) > 0
            out[i] = int(np.packbits(bits)[0])
        return pd.Series(out)

    bucketed = emb.select("vec_id", "embedding", lsh_bucket("embedding").alias("bucket"))
    a, b = bucketed.alias("a"), bucketed.alias("b")

    def norm_dot(x, y):
        dot = F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        nx = F.sqrt(F.aggregate(x, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
        ny = F.sqrt(F.aggregate(y, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
        return dot / (nx * ny)

    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(norm_dot(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
