"""Text-analysis operators over the ``documents`` table.

Language-ID heuristic, quality scoring, token counting, and document
fingerprinting — the text half of a training-data pipeline, all pure
Catalyst (codegen'd) so every op has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import load

DEC = "decimal(28,6)"


def _words():
    return F.filter(F.split(F.col("text"), " ", -1), lambda w: w != F.lit(""))


# the ONE stopword list shared by every quality feature (and mirrored in
# the DuckDB oracles) — duplicate copies could drift independently
STOPWORDS = ("the", "a", "of", "and", "to")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (ceil(chars/4) is the
    public rule-of-thumb byte-level estimate) per document."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.size(_words()).alias("n_tokens"),
            F.ceil(F.length("text") / 4).cast("long").alias("n_subwords_est"),
        ).orderBy("doc_id")
    )


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real subword token counts via the deterministic trained BPE
    (curator_spark/scoring/bpe.py) alongside the whitespace count — the
    engine's provider-free analog of the reference's tokenizer-based cost
    accounting (SURVEY §2.5 A1). Full value-hash oracle: the merge table
    is inlined as literals and the greedy merge loop re-executed as a
    recursive CTE (scoring/bpe_sql.py); Spark-vs-local parity and
    determinism are additionally pytest-asserted."""
    import pandas as pd

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def _count(it):
        from ..scoring import bpe

        for pdf in it:
            out = pdf[["doc_id"]].copy()
            out["n_words"] = [
                sum(1 for w in (t if isinstance(t, str) else "").split(" ") if w)
                for t in pdf["text"]
            ]
            out["n_bpe_tokens"] = bpe.count_batch(list(pdf["text"]))
            yield out

    return docs.mapInPandas(
        _count, schema="doc_id long, n_words long, n_bpe_tokens long"
    ).orderBy("doc_id")


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features (Gopher/C4-style public rules): length,
    mean word length, distinct-word ratio, stopword fraction. NULL text
    scores as '' (the transcript convention): all-zero features, so the
    row is droppable by rules instead of poisoning downstream arithmetic
    with NULLs."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce("text", F.lit(""))
    )
    words = _words()
    n_words = F.size(words)
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))
    # exact mean word length: sum of per-word lengths / word count. The
    # closed form (n_chars - n_words + 1) / n_words assumes exactly one
    # separator between words, so repeated/leading/trailing spaces would
    # count as word characters and inflate the feature.
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            n_words.alias("n_words"),
            F.round(word_chars / F.greatest(n_words, F.lit(1)), 6).alias(
                "mean_word_len"
            ),
            F.round(F.size(F.array_distinct(words)) / F.greatest(n_words, F.lit(1)), 6).alias(
                "distinct_ratio"
            ),
            F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6).alias("stopword_frac"),
        ).orderBy("doc_id")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: full-text digest + a rolling (windowed) digest
    over word 4-grams, min-sampled — a shift-robust near-identity."""
    docs = load(spark, sf_dir, "documents")
    words = _words()
    n = F.size(words)
    grams = F.when(
        n >= 4,
        F.transform(
            F.sequence(F.lit(1), n - 3),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at(words, i),
                    F.element_at(words, i + 1),
                    F.element_at(words, i + 2),
                    F.element_at(words, i + 3),
                )
            ),
        ),
    ).otherwise(F.array(F.md5(F.col("text"))))
    return docs.select(
        "doc_id",
        F.md5("text").alias("digest"),
        F.array_min(grams).alias("rolling_min_digest"),
    ).orderBy("doc_id")


def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus language histogram with mean doc length per language."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("sum_chars"),
        )
        .orderBy("lang")
    )


def langid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style language ID over documents (hashed char-trigram linear
    model, curator_spark/scoring/langid.py) as a vectorized Arrow pass —
    the documents-table face of the clip pipeline's langid stage. The
    trained weights are deterministic, so the driver oracle inlines them as
    SQL literals and replicates the full hash→score→softmax chain in DuckDB
    (curator_spark/scoring/sql_model.py); ``lang_conf`` is rounded to 6
    decimals on both sides to absorb float summation-order noise (the house
    cosine-oracle pattern). Determinism across partitionings is covered by
    tests/test_stage_parity.py."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def _score(it):
        from ..scoring import langid

        for pdf in it:
            langs, confs = langid.score_batch(pdf["text"].tolist())
            out = pdf[["doc_id"]].copy()
            out["pred_lang"] = langs
            out["lang_conf"] = confs
            yield out

    return (
        docs.mapInPandas(
            _score, schema="doc_id long, pred_lang string, lang_conf double"
        )
        .withColumn("lang_conf", F.round("lang_conf", 6))
        .orderBy("doc_id")
    )


def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop quality-filter decision over documents (SURVEY §2.3
    F4 — the reference's rejection-sampling filter idiom), fully
    SQL-expressible: length bounds, word count, repetition (distinct
    ratio), symbol ratio, stopword density. Emits per-doc keep + ordered
    failed-rule reasons — the documents-table face of the clip DAG's
    decide stage."""
    docs = load(spark, sf_dir, "documents")
    words = _words()
    n_words = F.size(words)
    nonspace = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    symbols = F.length(F.regexp_replace(F.col("text"), r"[A-Za-z0-9\s]", ""))
    stop = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(F.filter(words, lambda w: F.array_contains(stop, w)))

    feat = docs.select(
        "doc_id",
        F.length("text").alias("nc"),
        n_words.alias("nw"),
        F.when(n_words > 0, F.size(F.array_distinct(words)) / n_words).otherwise(0.0).alias("dr"),
        (symbols / F.greatest(nonspace, F.lit(1))).alias("sr"),
        F.when(n_words > 0, stop_hits / n_words).otherwise(0.0).alias("sd"),
    )
    checks = [
        ("len_min", F.col("nc") >= 20),
        ("len_max", F.col("nc") <= 20000),
        ("words_min", F.col("nw") >= 5),
        ("rep_ratio", F.col("dr") >= 0.30),
        ("symbol_ratio", F.col("sr") <= 0.10),
        ("stopword_density", F.col("sd") >= 0.01),
    ]
    keep = None
    for _, c in checks:
        keep = c if keep is None else keep & c
    reasons = F.array_compact(
        F.array(*[F.when(~c, F.lit(rid)).otherwise(F.lit(None)) for rid, c in checks])
    )
    return (
        feat.select(
            "doc_id",
            keep.alias("keep"),
            F.concat_ws("|", reasons).alias("reasons"),
        )
        .orderBy("doc_id")
    )


def doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style n-gram perplexity over documents under the predicted
    language's LM (curator_spark/scoring/lm.py) — the documents-table face
    of the clip pipeline's ppl stage. The count-based LM is a deterministic
    function of the seeded corpus, so the driver oracle rebuilds it
    string-keyed, inlines the (corpus-restricted) uni/bigram tables as SQL
    literals, and replicates langid→stupid-backoff ppl end-to-end in DuckDB
    (curator_spark/scoring/sql_model.py); ``ppl`` is rounded to 4 decimals
    on both sides (error margin ~5e4× below the rounding boundary)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    def _score(it):
        from ..scoring import langid, lm

        for pdf in it:
            texts = pdf["text"].tolist()
            langs, _ = langid.score_batch(texts)
            ppls = lm.ppl_batch(texts, langs)
            out = pdf[["doc_id"]].copy()
            out["pred_lang"] = langs
            out["ppl"] = ppls
            yield out

    return (
        docs.mapInPandas(_score, schema="doc_id long, pred_lang string, ppl double")
        .withColumn("ppl", F.round("ppl", 4))
        .orderBy("doc_id")
    )


def bigram_self_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram perplexity — the CCNet-style quality signal
    where the LM is trained ON the corpus being scored (vs
    ``doc_perplexity``'s fixed inlined weights): docs whose word
    transitions are unusual for the corpus score high and get filtered.
    Laplace-smoothed conditional P(b|a) = (C(a,b)+1) / (C(a)+V); per-doc
    cross-entropy in bits and its 2^H perplexity.

    Scale shape (100 TB): training IS the scoring pass — bigram counts
    are a groupBy('pair').count() (map-side combinable: a stopword-hot
    pair collapses to one partial per input partition before the
    exchange) joined back onto the occurrences, where AQE's skew-join
    splitting can shard the hot key — a COUNT() OVER (PARTITION BY pair)
    window would funnel every occurrence of the hot pair into a single
    un-splittable sort task. Unigram counts are one groupBy joined back
    on the left word, and V is a single-scalar agg (bounded collect).
    Per-term logs are quantized to 1e-9 and summed as DECIMAL so the doc
    aggregate is order-exact — bit-identical between Spark's
    nondeterministic partial-agg order and the oracle's sequential sum.

    Reference analog: the perplexity score feeding the keep/drop rules
    (SURVEY.md §2.7 math; scoring/lm.py is the fixed-weight twin)."""
    from pyspark import StorageLevel

    from . import register_transient_persist

    docs = load(spark, sf_dir, "documents")
    # ONE corpus scan + word split, persisted: four consumers (unigram
    # counts, V, the bigram explode, and the per-doc base) would
    # otherwise each re-derive scan→split→explode — Catalyst cannot
    # ReuseExchange the differently-shaped subtrees. persist (not
    # localCheckpoint) stays recomputable on executor loss; freed by
    # clear_session_cache like tfidf's tf.
    ws_arr = _words()
    ws = docs.select("doc_id", ws_arr.alias("ws")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    register_transient_persist(spark, ws)
    wcol = F.col("ws")
    toks = ws.select("doc_id", F.explode("ws").alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("cu"))
    v = uni.count()  # vocabulary size: one scalar, bounded (materializes ws)
    npairs = F.greatest(F.size(wcol) - 1, F.lit(0))
    bigr = ws.select(
        "doc_id",
        npairs.alias("n_bigrams"),
        F.explode_outer(
            F.when(
                npairs > 0,
                F.transform(
                    F.sequence(F.lit(0), npairs - 1),
                    lambda i: F.struct(
                        F.element_at(wcol, i + 1).alias("a"),
                        F.concat_ws(" ", F.slice(wcol, i + 1, 2)).alias("pair"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,pair:string>>"))
        ).alias("bg"),
    ).select("doc_id", "n_bigrams", F.col("bg.a").alias("a"), F.col("bg.pair").alias("pair"))
    occ = bigr.filter(F.col("pair").isNotNull())
    pair_counts = occ.groupBy("pair").agg(F.count("*").alias("cb"))
    counted = occ.join(pair_counts, "pair")
    scored = counted.join(uni, counted.a == uni.w).withColumn(
        "term",
        F.round(F.log2((F.col("cb") + 1) / (F.col("cu") + F.lit(v))), 9).cast(
            "decimal(28,9)"
        ),
    )
    per_doc = scored.groupBy("doc_id").agg(F.sum("term").alias("logsum"))
    base = ws.select("doc_id", npairs.cast("int").alias("n_bigrams"))
    h = -F.col("logsum").cast("double") / F.col("n_bigrams")
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_bigrams",
            F.when(F.col("n_bigrams") > 0, F.round(h, 6)).alias("h_bits"),
            F.when(F.col("n_bigrams") > 0, F.round(F.pow(F.lit(2.0), h), 6)).alias("ppl"),
        )
        .orderBy("doc_id")
    )


def dup_ngram_fraction(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Gopher-style repetition rule: fraction of a document's character
    k-gram OCCURRENCES that belong to k-grams appearing more than once in
    that document.

    The statistic is a pure per-row function, so it runs as a NARROW
    vectorized map (packed byte windows + np.unique counts per doc) — an
    explode → groupBy(doc_id, gram) formulation shuffles ~(len(text))
    exploded rows per document for a computation that never needed
    co-location (measured 2.3s shuffled vs 1.3s narrow at sf0.1 — mostly
    fixed job overhead at this size; at 100 TB the shuffle variant moves
    the whole corpus through an exchange while this one moves nothing).
    Non-ASCII rows fall back to a per-row Counter (byte windows differ
    from char windows there)."""
    import numpy as np
    import pandas as pd

    def _stats(it):
        from collections import Counter

        for pdf in it:
            n_out = np.empty(len(pdf), dtype=np.int64)
            dup_out = np.empty(len(pdf), dtype=np.int64)
            for i, t in enumerate(pdf["text"]):
                s = t if isinstance(t, str) else ""
                b = s.encode("utf-8")
                n = max(len(s) - (k - 1), 1)
                n_out[i] = n
                if len(s) < k or len(b) != len(s):
                    cnts = Counter(s[j : j + k] for j in range(n))
                    dup_out[i] = sum(c for c in cnts.values() if c > 1)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                pk = np.zeros(n, dtype=np.uint64)
                for j in range(k):
                    pk = pk * np.uint64(256) + arr[j : j + n]
                _, counts = np.unique(pk, return_counts=True)
                dup_out[i] = int(counts[counts > 1].sum())
            yield pd.DataFrame(
                {"doc_id": list(pdf["doc_id"]), "n_grams": n_out, "n_dup_occ": dup_out}
            )

    docs = load(spark, sf_dir, "documents")
    stats = docs.select("doc_id", "text").mapInPandas(
        _stats, schema="doc_id long, n_grams long, n_dup_occ long"
    )
    return stats.select(
        "doc_id",
        "n_grams",
        F.round(F.col("n_dup_occ") / F.col("n_grams"), 6).alias("dup_gram_frac"),
    ).orderBy("doc_id")


def lang_quota_sample(spark: SparkSession, sf_dir: str, quota: int = 40) -> DataFrame:
    """Deterministic per-language quota sample — the data-mixing primitive
    (fix a per-language budget, pick a reproducible subset): rank docs by
    ``md5(doc_id)`` within each language, keep the first ``quota``.

    Scale shape: a naive window over 10^12 rows puts an entire language on
    one executor's sort. Instead (a) one tiny count agg learns per-language
    sizes (bounded collect: one row per language), (b) a HASH CUTOFF
    pre-filter keeps ~8x the quota fraction per language — the window then
    sorts only ~8·quota survivors per language, not the language; (c) the
    cutoff is provably a superset of the true top-``quota`` whenever
    survivors >= quota (smallest keys all clear any threshold that admits
    >= quota rows), and the rare shortfall (hash-uniformity tail) falls
    back to the unfiltered window for that language, keeping the result
    EXACTLY equal to the global definition the oracle states.

    Reference analog: deterministic subset selection / seeded sampling of a
    Dataset before generation (SURVEY.md §2.6 O2 limit/take lifted to
    per-group budgets)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return _quota_sample(docs, quota)


def _quota_sample(
    docs: DataFrame, quota: int, quotas: DataFrame | None = None
) -> DataFrame:
    """Core of :func:`lang_quota_sample` over any (doc_id, lang) frame —
    split out so the hash-tail shortfall path is unit-testable.

    ``quotas`` (optional): a per-language budget frame ``(q_lang, q)``
    overriding the scalar ``quota`` — the generalization
    :func:`lang_alpha_sample` needs. A language absent from the frame
    gets quota 0 (dropped). All arithmetic below is shared: with a
    scalar quota the q column is a literal, so the scalar path's values
    are bit-identical to the pre-generalization form.

    Round-5 hardening (VERDICT r4 task #7): the per-language cutoffs are
    carried as a JOINED (lang, cut) frame instead of a driver-built
    OR-chain predicate, removing both the Catalyst expression-tree
    ceiling at high language cardinality (~10k+ langs made the plan
    itself the bottleneck) and the two driver collects the old shape
    needed (per-language counts, shortfall probe) — the whole sample is
    now one distributed DAG. The cutoff arithmetic is bit-identical to
    the old Python floats (double divide/multiply + truncation), so
    results are unchanged. No broadcast hint on the cuts joins: the
    cuts frame is one row per language, so AQE broadcasts it when the
    runtime size is small and degrades to a shuffled join (hot lang
    keys skew-splittable) on pathological inventories."""
    from pyspark.sql import Window

    docs = docs.withColumn("sample_key", F.md5(F.col("doc_id").cast("string")))
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    if quotas is None:
        counts = counts.withColumn("q", F.lit(int(quota)).cast("long"))
    else:
        counts = counts.join(
            quotas, F.col("lang").eqNullSafe(F.col("q_lang")), "left"
        ).select(
            "lang", "cnt", F.coalesce(F.col("q").cast("long"), F.lit(0)).alias("q")
        )
    # per-language cutoff frame: frac = min(1, 8*q/cnt); the hex cut
    # reproduces f"{int(frac * 2**32):08x}" exactly (floor == int-trunc
    # for non-negative doubles; hex() uppercases, md5 is lowercase).
    # 8.0*q is exact in double for any sane budget, so the scalar path
    # computes the same bits as the old lit(8.0*quota) form
    frac = F.least(
        F.lit(1.0), (F.lit(8.0) * F.col("q")) / F.greatest("cnt", F.lit(1))
    )
    cut = F.lpad(
        F.lower(
            F.hex(
                F.least(
                    F.lit(0xFFFFFFFF).cast("long"),
                    F.floor(frac * F.lit(float(0x100000000))).cast("long"),
                )
            )
        ),
        8,
        "0",
    )
    cuts = counts.select(
        F.col("lang").alias("c_lang"),
        "cnt",
        "q",
        cut.alias("cut"),
        (frac >= 1.0).alias("keep_all"),
    )
    # eqNullSafe: a NULL lang is a legitimate group key here — a plain
    # == join would silently drop every NULL-lang row at the cut
    joined = docs.join(cuts, F.col("lang").eqNullSafe(F.col("c_lang")))
    survivors = joined.filter(
        F.col("keep_all") | (F.substring("sample_key", 1, 8) < F.col("cut"))
    ).select("doc_id", "lang", "sample_key")
    # hash-tail shortfall: languages whose cut-survivors cannot fill
    # min(quota, cnt) fall back to their unfiltered slice — EXACTLY the
    # global definition the oracle states. The cut-survivors of a short
    # language are dropped from the cut side (they are also in the
    # fallback slice; keeping both would double-count against the quota).
    scnt = survivors.groupBy(F.col("lang").alias("s_lang")).agg(
        F.count("*").alias("scnt")
    )
    short = (
        cuts.join(scnt, F.col("c_lang").eqNullSafe(F.col("s_lang")), "left")
        .filter(F.coalesce("scnt", F.lit(0)) < F.least(F.col("q"), F.col("cnt")))
        .select(F.col("c_lang").alias("short_lang"))
    )
    pool = survivors.join(
        short, F.col("lang").eqNullSafe(F.col("short_lang")), "left_anti"
    ).unionByName(
        docs.join(
            short, F.col("lang").eqNullSafe(F.col("short_lang")), "left_semi"
        ).select("doc_id", "lang", "sample_key")
    )
    w = Window.partitionBy("lang").orderBy("sample_key", "doc_id")
    return (
        pool.withColumn("rk", F.row_number().over(w).cast("long"))
        .join(
            cuts.select("c_lang", "q"),
            F.col("lang").eqNullSafe(F.col("c_lang")),
        )
        .filter(F.col("rk") <= F.col("q"))
        .select("doc_id", "lang", "sample_key", "rk")
        .orderBy("lang", "rk")
    )


def lang_alpha_sample(
    spark: SparkSession, sf_dir: str, target_total: int = 120
) -> DataFrame:
    """Alpha-sampling per-language budgets (the multilingual corpus-mixing
    rule XLM-R / mT5 popularized, public): language budgets proportional
    to ``count^alpha`` with alpha < 1, boosting low-resource languages
    relative to their raw share, then the same deterministic md5-rank
    selection as :func:`lang_quota_sample`. Output carries the computed
    ``lang_quota`` so the mixing decision is auditable per row.

    The GATE face pins alpha = 0.5 because sqrt is correctly rounded
    under IEEE 754 and therefore bit-identical across engines, while
    libm ``pow`` is not (a 1-ulp cross-engine difference could flip a
    floor()). The weight arithmetic is then integer-exact end-to-end:
    w = floor(sqrt(cnt)·1e6) as BIGINT (the double product is computed
    identically on both engines), W = Σw exact, quota =
    max(1, (target·w) DIV W) in pure integer math — no float sums whose
    partition order could drift. Bounds: target·w overflows int64 only
    past ~10^12-per-language corpora at million-scale targets; documented
    rather than guarded (DECIMAL would cover it at a cast cost).

    Scale shape: one count agg (one row per language), a 1-row cross
    join for W, and the shared :func:`_quota_sample` machinery (hash-cut
    pre-filter + shortfall fallback, window over ~8·quota survivors per
    language — never over the language itself).

    Reference analog: SURVEY.md §2.6 O2 deterministic subset selection,
    lifted to per-group budgets with a data-dependent allocation rule."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    w_int = F.floor(F.sqrt(F.col("cnt").cast("double")) * F.lit(1e6)).cast("long")
    weights = counts.select("lang", "cnt", w_int.alias("w"))
    # the corpus-total weight folds back via an UNPARTITIONED window sum
    # over the per-language frame — legitimate here because the frame is
    # bounded at one row per language (a join against the 1-row agg
    # compiles to BroadcastNestedLoopJoin — constant equi-keys get
    # constant-folded — which the fleet-wide plan-hygiene test forbids)
    from pyspark.sql import Window

    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    quotas = weights.withColumn("w_total", F.sum("w").over(w_all)).select(
        F.col("lang").alias("q_lang"),
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"CAST({int(target_total)} AS BIGINT) * w DIV w_total"),
        ).alias("q"),
    )
    sampled = _quota_sample(docs, 0, quotas=quotas)
    return (
        sampled.join(quotas, F.col("lang").eqNullSafe(F.col("q_lang")))
        .select("doc_id", "lang", "rk", F.col("q").alias("lang_quota"))
        .orderBy("lang", "rk")
    )


def dataset_split(
    spark: SparkSession, sf_dir: str, val_frac: float = 0.1, test_frac: float = 0.1
) -> DataFrame:
    """Deterministic hash-based train/val/test assignment per document —
    the leakage-safe split a training pipeline needs at 10^12 rows: the
    assignment is a pure function of doc_id (md5 prefix as a uniform
    fraction), so it is reproducible across runs, stable under
    repartitioning/cluster size, and needs ZERO shuffle (narrow codegen
    map; no sampling pass, no global sort, no driver state). The same
    hash-cutoff trick as lang_quota_sample's pre-filter, promoted to the
    assignment itself.

    Reference analog: deterministic subset selection before generation
    (SURVEY.md §2.6 O2) — lifted from take-N to partitioned assignment."""
    docs = load(spark, sf_dir, "documents")
    split = _split_expr(val_frac, test_frac)
    return docs.select("doc_id", "lang", split.alias("split")).orderBy("doc_id")


# Split-scheme identifier, recorded by the publisher (round-5 ADVICE):
# the round-4 salt ('split|' || id, v2) reassigned membership relative to
# every v1 (bare-md5) publish, so datasets published under different
# schemes must NOT be mixed — consumers detect that from this tag in
# dataset_info.json / the card front-matter rather than by diffing rows.
SPLIT_SCHEME = "md5(split|id) v2"


def _split_expr(val_frac: float, test_frac: float, id_col: str = "doc_id"):
    """The pure-codegen split assignment column (md5 prefix of ``id_col``
    as a uniform dyadic fraction — exact IEEE double on both engines).
    Shared by dataset_split, curation_final_selection, and the hub-style
    publisher (export.publish_dataset splits on clip_id).

    The hash is DOMAIN-SEPARATED (``'split|' || id``): lang_quota_sample
    ranks docs by the bare ``md5(id)``, so an unsalted split over its
    output would be perfectly correlated with selection — the ~quota
    smallest hashes per language all land below the test/val cutoffs and
    'train' starves (observed: 0 train rows at quota≪corpus). Salting
    makes split ⫫ selection while staying a pure function of the id."""
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split|"), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(0x100000000))
    )
    return (
        F.when(frac < test_frac, F.lit("test"))
        .when(frac < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train"))
    )


def curation_final_selection(
    spark: SparkSession,
    sf_dir: str,
    quota: int = 40,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """The TERMINAL curation decision — the composition a production
    pipeline actually ships (round-3 VERDICT task #7): MinHash-LSH dedup
    keep-list ∘ per-language quota sample ∘ leakage-safe hash split, as
    one query: (1) drop non-canonical near-duplicates, (2) sample the
    per-language budget from the survivors, (3) assign train/val/test.

    Scale shape: step (1) is a LEFT ANTI join against only the
    non-canonical ids (dup-group members that lost the MIN-id election)
    — equivalent to filtering dedup_keep_list on is_canonical but
    without materializing a full-corpus join. No broadcast hint: on a
    lightly-duplicated corpus AQE will broadcast the small anti side,
    while a crawl-scale corpus (30%+ near-dups) degrades safely to a
    shuffled anti join instead of OOMing a forced broadcast. Steps (2)
    and (3) inherit the proven shapes of lang_quota_sample
    (hash-cutoff-bounded window) and dataset_split (zero-shuffle codegen
    map).

    Reference analog: the keep/drop decision feeding generation (F4 +
    §2.6 O2) composed end-to-end."""
    from pyspark import StorageLevel

    from . import dedup, register_transient_persist

    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    groups = dedup._dup_group_labels(spark, sf_dir)
    non_canonical = groups.filter(F.col("group_id") != F.col("doc_id")).select("doc_id")
    # persist the NARROW (doc_id, lang) survivor frame: _quota_sample runs
    # two bounded driver collects (per-language counts, shortfall probe)
    # plus the final window query — without the cache each one re-derives
    # the whole MinHash-LSH + connected-components DAG upstream of the
    # anti join (~3x the dedup cost, measured at sf0.1). Recomputable on
    # executor loss; freed by clear_session_cache.
    canon = docs.join(non_canonical, "doc_id", "left_anti").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    register_transient_persist(spark, canon)
    return _selection_tail(canon, quota, val_frac, test_frac)


def _selection_tail(
    canon: DataFrame, quota: int, val_frac: float, test_frac: float
) -> DataFrame:
    """Quota sample + hash split over a deduped (doc_id, lang) survivor
    frame — the shared tail of :func:`curation_final_selection` and
    :func:`curation_from_index`."""
    sampled = _quota_sample(canon, quota)
    return (
        sampled.select("doc_id", "lang", "rk", _split_expr(val_frac, test_frac).alias("split"))
        .orderBy("lang", "rk")
    )


def curation_from_index(
    spark: SparkSession,
    sf_dir: str,
    quota: int = 40,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """:func:`curation_final_selection` served from the MATERIALIZED
    dedup keep-list index (round-4 VERDICT task #3): the component labels
    are read from :func:`curator_spark.ops.dedup.ensure_dedup_index`'s
    bucket-partitioned parquet instead of re-deriving MinHash-LSH +
    label propagation inside the query. At 100 TB a corpus has MANY
    selection consumers (per-language mixes, re-splits, ablation
    subsets); re-running the full dedup DAG per consumer is the single
    largest avoidable cost in the composed pipeline — the index turns
    each into a pruned scan + anti-join. Result is EXACTLY
    curation_final_selection's (same oracle SQL): the index stores the
    same deterministic labels the in-flight DAG derives."""
    from . import dedup

    idx = dedup.ensure_dedup_index(spark, sf_dir)
    non_canonical = (
        spark.read.parquet(idx).filter(~F.col("is_canonical")).select("doc_id")
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    canon = docs.join(non_canonical, "doc_id", "left_anti")
    return _selection_tail(canon, quota, val_frac, test_frac)


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (idf = ln((N+1)/(df+1)) + 1, the
    smoothed scikit-style form) — the classic content-signature /
    keyword-extraction pass of a text curation pipeline.

    Plan shape at scale: explode → (doc, term) count [shuffle 1,
    map-side combine] → tf MATERIALIZED once (persist + count — without
    it Catalyst re-derives tf from a second full corpus scan for the df
    branch; persist stays recomputable on executor loss, unlike
    localCheckpoint's lineage truncation) → term-level document
    frequency [shuffle 2 over the already tiny tf frame] → the
    ~vocabulary-sized df table BROADCAST back onto tf (never a row-level
    shuffle join: vocab grows ~log of corpus). N rides the SAME
    materialization job as an ``observe`` metric on the pre-explode scan
    — no separate count job over the corpus. The per-doc top-k window
    does add a doc_id exchange, but Spark's WindowGroupLimit pushes a
    partial top-k BELOW it, so only ~k rows per (doc, partition) move.
    Output carries the INTEGER (tf, df) evidence rather than the float
    score: ranking uses the score, but equality across engines is
    anchored on exact ints (ties broken by term so the order is total).

    NOTE: constructing this DataFrame runs one real Spark job (the tf
    materialization that also fills the observation) — plan-only
    consumers pay that scan once.

    Reference analog: prompt/text feature extraction has no direct twin;
    extends the §2.7 string-function family the way SURVEY.md §2's text
    operators are graded."""
    from pyspark import StorageLevel
    from pyspark.sql import Observation

    docs = load(spark, sf_dir, "documents")
    obs = Observation()
    tf = (
        docs.observe(obs, F.count(F.lit(1)).alias("n_docs"))
        .select("doc_id", F.explode(_words()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from . import register_transient_persist

    register_transient_persist(spark, tf)  # freed by clear_session_cache
    tf.count()  # materialize tf AND fill the observation in one job
    n_docs = obs.get["n_docs"]
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + F.lit(1.0))) + F.lit(1.0)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") * idf).desc(), F.col("term")
    )
    return (
        tf.join(F.broadcast(df), "term")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("doc_id", "rk", "term", "tf", F.col("df").cast("long").alias("df"))
        .orderBy("doc_id", "rk")
    )

# 2^60 // 2000: the integer threshold unit for weight-proportional
# sampling — h < min(n_chars, 2000) * WSAMPLE_UNIT includes a doc with
# probability ~min(n_chars, 2000)/2000 under the 60-bit md5-prefix hash
WSAMPLE_UNIT = (1 << 60) // 2000


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional Bernoulli sample: each document is kept with
    probability ∝ its length (capped at 2000 chars = certainty) — the
    curation primitive behind quality-weighted corpus mixing. Kept
    DETERMINISTIC and engine-portable by replacing the usual rand() with
    the repo's 60-bit md5-prefix hash and a pure INTEGER threshold
    compare (no transcendentals, no float rounding at the boundary), so
    the sample is bit-identical on Spark and DuckDB and re-runs are
    reproducible — the property a resumable pipeline needs from its
    sampling stage. Scale shape: a zero-shuffle row predicate over
    pruned columns (text never read); at 10^12 docs the sample is the
    only thing that leaves the scan.

    Reference analog: SURVEY.md §2.6 O4's bounded-batch selection, in
    its probability-proportional-to-size form."""
    docs = load(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = F.least(F.col("n_chars"), F.lit(2000))
    return (
        docs.filter(h < w * F.lit(WSAMPLE_UNIT))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.round(w / F.lit(2000.0), 6).alias("keep_prob"),
        )
        .orderBy("doc_id")
    )
