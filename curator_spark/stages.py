"""Pipeline stages as DataFrame→DataFrame transforms.

Stage layering (Spark-first, SURVEY.md §2 mapping):

- ``decode``  — the ONLY stage that touches ``bytes``. ``mapInPandas``
  decodes audio once per Arrow batch, emits float features, and *drops the
  binary column* so no downstream shuffle ever carries audio payloads
  (at 100 TB the bytes column IS the table; projecting it away after decode
  is the single biggest scale lever). [ref: media load, types/prompt.py:21-103]
- ``score``   — langid + perplexity in ONE ``mapInPandas`` pass (ppl needs
  the predicted lang, and one Python round-trip beats two chained
  ArrowEvalPython nodes). Models are process-level singletons.
  [ref: generate map, base_online_request_processor.py:304-449]
- ``scrub``   — pure Catalyst ``regexp_replace`` chain + match counting via
  ``split`` (whole-stage codegen, zero Python).
  [ref: per-row executor map, code_executor/code_executor.py:99-181]
- ``rules`` / ``decide`` — pure Catalyst expressions; ``keep`` boolean +
  ordered ``reasons`` array. [ref: filter idiom, SURVEY.md §2.3 F4]

Every rule expression mirrors :mod:`curator_spark.scoring.rules`
token-for-token (split on single space, identical regex classes) so the
Spark labels and the oracle labels agree bit-exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import RULE_IDS, RuleThresholds
from .scoring.scrub import SCRUB_PATTERNS
from .synth import textgen

def transcript_digest() -> Column:
    """THE content-identity expression (≙ the reference's cache identity,
    llm/llm.py:139-164), shared by the batch dedup stage and the streaming
    stateful dedup so the two faces can never disagree. Null transcripts
    hash a NUL-byte sentinel (no real transcript can collide with it) so
    they dedupe among themselves under a non-null key."""
    return F.md5(F.coalesce("transcript", F.lit("\x00null")))


# ---------------------------------------------------------------- decode

_DECODE_ADDED = "rms_db double, silence_ratio double, clip_ratio double, decode_ok boolean"


def decode_stage(df: DataFrame) -> DataFrame:
    """bytes → audio features; drops ``bytes`` from the schema."""
    out_cols = [c for c in df.columns if c != "bytes"]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != "bytes")
    schema = f"{schema}, {_DECODE_ADDED}"

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield _with_decode_features(pdf, pdf[out_cols].copy())

    return df.mapInPandas(_decode, schema=schema)


def _with_decode_features(pdf: pd.DataFrame, out: pd.DataFrame) -> pd.DataFrame:
    """Append the decode feature columns to ``out`` — the ONE definition
    shared by the standalone decode stage and the fused decode+score path
    (a copy in each would silently desync the physical paths tests assert
    are identical)."""
    from .scoring import audio as audio_scoring

    # raw (possibly NULL) metadata goes straight in: decode_features
    # coerces inside its quarantine try, so a NULL sr_hz/dur_ms row
    # becomes decode_ok=false instead of failing the task on int(NaN)
    feats = [
        audio_scoring.decode_features(b, c, sr, d)
        for b, c, sr, d in zip(pdf["bytes"], pdf["codec"], pdf["sr_hz"], pdf["dur_ms"])
    ]
    out["rms_db"] = np.array([f["rms_db"] for f in feats], dtype=np.float64)
    out["silence_ratio"] = np.array([f["silence_ratio"] for f in feats], dtype=np.float64)
    out["clip_ratio"] = np.array([f["clip_ratio"] for f in feats], dtype=np.float64)
    out["decode_ok"] = [not np.isnan(f["rms_db"]) for f in feats]
    return out


# ----------------------------------------------------------------- score


def score_stage(df: DataFrame) -> DataFrame:
    """+ (lang, lang_conf, ppl) via one vectorized Python pass."""
    schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
        + ", lang string, lang_conf double, ppl double"
    )

    def _score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .scoring import langid, lm

        for pdf in it:
            texts = [t if isinstance(t, str) else "" for t in pdf["transcript"]]
            langs, confs = langid.score_batch(texts)
            ppls = lm.ppl_batch(texts, langs)
            out = pdf.copy()
            out["transcript"] = texts  # nulls normalized (see score_clip_pdf)
            out["lang"] = langs
            out["lang_conf"] = confs
            out["ppl"] = ppls
            yield out

    return df.mapInPandas(_score, schema=schema)


# ---------------------------------------------------- fused decode+score


def decode_score_stage(df: DataFrame) -> DataFrame:
    """decode + score in ONE ``mapInPandas`` pass.

    Semantically identical to ``score_stage(decode_stage(df))`` (asserted by
    tests/test_stage_parity.py) but physically one Arrow round-trip instead
    of two: the audio ``bytes`` and the transcript cross the JVM→Python
    boundary once, features come back once. At 100 TB the bytes column IS
    the table, so halving Python-boundary traffic on the decode path is the
    single biggest constant-factor lever after dropping ``bytes`` early.
    """
    out_cols = [c for c in df.columns if c != "bytes"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != "bytes"
    )
    schema = f"{schema}, {_DECODE_ADDED}, lang string, lang_conf double, ppl double"

    def _decode_score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield score_clip_pdf(pdf, out_cols)

    return df.mapInPandas(_decode_score, schema=schema)


def score_clip_pdf(pdf: pd.DataFrame, out_cols: list[str]) -> pd.DataFrame:
    """Decode + langid + perplexity over one pandas batch of clip rows.

    Pure function of the rows (models are process-level singletons), shared
    by the column-scan stage above and the manifest scan
    (:mod:`curator_spark.manifest`), so both physical paths produce
    bit-identical scores."""
    from .scoring import langid, lm

    # null transcripts normalize to "" here (and in the Catalyst suffix):
    # scoring models and the scrub/rules chain are total over strings, and
    # a NULL would otherwise poison Catalyst arithmetic downstream
    # (size(split(NULL)) = -1 → negative scrub_hits, NULL keep)
    texts = [t if isinstance(t, str) else "" for t in pdf["transcript"]]
    langs, confs = langid.score_batch(texts)
    ppls = lm.ppl_batch(texts, langs)
    out = pdf[out_cols].copy()
    out["transcript"] = texts
    out = _with_decode_features(pdf, out)
    out["lang"] = langs
    out["lang_conf"] = confs
    out["ppl"] = ppls
    return out


# ----------------------------------------------------------------- scrub


def _java_unicode(pattern: str) -> str:
    """Prefix for Java-side use only: (?U) (UNICODE_CHARACTER_CLASS) makes
    Java's \\s/\\d/\\w/\\b match Unicode like Python's str patterns do by
    default — without it a transcript containing e.g. '\\xa0' or Unicode
    digits scores differently in the pipeline than in the oracle. Python
    re rejects the uppercase flag, so the shared SCRUB_PATTERNS strings
    stay flagless and the prefix is applied at the Java call sites."""
    return f"(?U){pattern}"


def _count_and_replace(col: Column, pattern: str, rep: str) -> tuple[Column, Column]:
    """(hits, replaced). Java split(limit=-1) keeps trailing empties, so
    size(split)-1 == match count — same as Python ``subn``."""
    pattern = _java_unicode(pattern)
    hits = F.size(F.split(col, pattern, -1)) - F.lit(1)
    return hits, F.regexp_replace(col, pattern, rep)


def scrub_stage(df: DataFrame) -> DataFrame:
    """+ scrubbed_transcript, scrub_hits, tox_hits — pure Catalyst chain,
    applied in the fixed oracle order (EMAIL → SSN → PHONE → TOX)."""
    cur = F.col("transcript")
    hit_cols: dict[str, Column] = {}
    for rid, pat, rep in SCRUB_PATTERNS:
        hits, cur = _count_and_replace(cur, pat, rep)
        hit_cols[rid] = hits
    total = None
    for c in hit_cols.values():
        total = c if total is None else total + c
    return (
        df.withColumn("scrubbed_transcript", cur)
        .withColumn("scrub_hits", total.cast("int"))
        .withColumn("tox_hits", hit_cols["tox"].cast("int"))
    )


def scrub_detail_stage(df: DataFrame) -> DataFrame:
    """+ scrubbed_transcript and PER-RULE hit counts (email_hits, ssn_hits,
    phone_hits, tox_hits) — the audit-table face of the scrub: a PII
    review needs to know WHICH pattern fired, not just the total.
    Same fixed chain and counting trick as :func:`scrub_stage`; NULL
    transcripts coalesce to '' so the counts are total (0, never -1
    from ``split(NULL)``).

    Reference analog: per-row transform surface (SURVEY.md §2.2 M7)."""
    cur = F.coalesce(F.col("transcript"), F.lit(""))
    hit_cols: dict[str, Column] = {}
    for rid, pat, rep in SCRUB_PATTERNS:
        hits, cur = _count_and_replace(cur, pat, rep)
        hit_cols[rid] = hits
    out = df.withColumn("scrubbed_transcript", cur)
    for rid, hits in hit_cols.items():
        out = out.withColumn(f"{rid}_hits", hits.cast("int"))
    return out


# ----------------------------------------------------------------- rules

def _words() -> Column:
    return F.filter(F.split(F.col("transcript"), " ", -1), lambda w: w != F.lit(""))


def _stop_hits() -> Column:
    """Occurrences of the predicted language's stopwords — static array
    literals dispatched on ``lang``; stays in codegen."""
    def _in(stops: Column):
        return lambda w: F.array_contains(stops, w)

    expr = None
    for lang in textgen.LANGS:
        stops = F.array(*[F.lit(w) for w in sorted(textgen.stopwords(lang))])
        cnt = F.size(F.filter(_words(), _in(stops)))
        cond = F.col("lang") == F.lit(lang)
        expr = F.when(cond, cnt) if expr is None else expr.when(cond, cnt)
    return expr.otherwise(F.lit(0))


def rules_stage(df: DataFrame) -> DataFrame:
    """+ rule feature columns (all built-in SQL functions)."""
    from .scoring.rules import NON_ALNUM_CLASS, WS_CLASS

    n_words = F.size(_words())
    # explicit classes (not \s): Java's (?U)\s and Python's \s disagree on
    # U+001C-U+001F; the enumerated class is identical in both engines
    nonspace = F.length(F.regexp_replace(F.col("transcript"), WS_CLASS, ""))
    symbols = F.length(F.regexp_replace(F.col("transcript"), NON_ALNUM_CLASS, ""))
    return (
        df.withColumn("n_chars", F.length("transcript"))
        .withColumn("n_words", n_words)
        .withColumn(
            "distinct_ratio",
            F.when(n_words > 0, F.size(F.array_distinct(_words())) / n_words).otherwise(F.lit(0.0)),
        )
        .withColumn("symbol_ratio", symbols / F.greatest(nonspace, F.lit(1)))
        .withColumn(
            "stopword_density",
            F.when(n_words > 0, _stop_hits() / n_words).otherwise(F.lit(0.0)),
        )
    )


def _rule_checks(t: RuleThresholds) -> list[tuple[str, Column]]:
    """(rule_id, pass-condition) in the fixed RULE_IDS order."""
    c = F.col
    checks = [
        ("len_min", c("n_chars") >= t.len_min),
        ("len_max", c("n_chars") <= t.len_max),
        ("words_min", c("n_words") >= t.words_min),
        ("rep_ratio", c("distinct_ratio") >= t.distinct_ratio_min),
        ("symbol_ratio", c("symbol_ratio") <= t.symbol_ratio_max),
        ("stopword_density", c("stopword_density") >= t.stopword_density_min),
        ("lang_conf", c("lang_conf") >= t.lang_conf_min),
        ("ppl_max", c("ppl") <= t.ppl_max),
        ("tox_max", c("tox_hits") <= t.tox_hits_max),
        ("dur_min", c("dur_ms") >= t.dur_ms_min),
        ("dur_max", c("dur_ms") <= t.dur_ms_max),
        ("audio_rms", c("decode_ok") & (c("rms_db") >= t.rms_db_min)),
        ("audio_silence", c("silence_ratio") <= t.silence_ratio_max),
        ("audio_clip", c("clip_ratio") <= t.clip_ratio_max),
    ]
    assert [rid for rid, _ in checks] == list(RULE_IDS)
    return checks


def decide_stage(df: DataFrame, t: RuleThresholds) -> DataFrame:
    """+ keep boolean, reasons array<string> (ordered failed rule ids)."""
    checks = _rule_checks(t)
    keep = None
    for _, ok in checks:
        keep = ok if keep is None else keep & ok
    reasons = F.array_compact(
        F.array(*[F.when(~ok, F.lit(rid)).otherwise(F.lit(None)) for rid, ok in checks])
    )
    return df.withColumn("keep", keep).withColumn("reasons", reasons)


def catalyst_suffix(df: DataFrame, t: RuleThresholds) -> DataFrame:
    """scrub → rules → decide — the pure-Catalyst tail, shared by the
    column-scan, manifest-scan, and streaming paths. Normalizes NULL
    transcripts to '' first (callers that bypass the scoring stages would
    otherwise feed NULL into split/size arithmetic → negative scrub_hits
    and NULL keep with no recorded reason)."""
    df = df.withColumn("transcript", F.coalesce("transcript", F.lit("")))
    return decide_stage(rules_stage(scrub_stage(df)), t)


def apply_all(df: DataFrame, t: RuleThresholds) -> DataFrame:
    """decode+score (fused, one Python pass) → scrub → rules → decide."""
    return catalyst_suffix(decode_score_stage(df), t)
