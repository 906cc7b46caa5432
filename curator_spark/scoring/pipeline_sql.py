"""DuckDB-SQL oracle for the COMPLETE keep/drop pipeline.

Composes the already-proven per-stage SQL oracles into the full
north-rule DAG — decode → langid + perplexity → scrub → rules → decide —
so ``clip_keep_summary`` (the flagship query) graduates from rows-only to
a full value-hash oracle row:

- **audio**    — :func:`curator_spark.scoring.audio_sql._samples_cte`
  decodes the WAV/μ-law bytes in SQL; rms/silence/clip ratios are
  recomputed here UNROUNDED because the keep thresholds act on raw
  values (the standalone ``audio_decode_features`` oracle rounds for
  display).  The quarantine constants mirror
  ``audio.decode_features`` (bad payload → NaN/1.0/1.0) and
  ``audio.features`` (zero samples → -120 dB/1.0/0.0).
- **langid**   — :func:`curator_spark.scoring.sql_model._langid_ctes`
  over a ``documents(doc_id, text)`` CTE aliasing the clip transcripts;
  the threshold uses the UNROUNDED softmax confidence (``pred`` rounds
  to 6 for display, but the pipeline compares raw).
- **ppl**      — the ``doc_perplexity`` LM chain with the final
  ``round(…, 4)`` dropped, again because ``ppl <= ppl_max`` compares raw.
- **scrub**    — the fixed EMAIL → SSN → PHONE → TOX chain as chained
  ``regexp_replace(…, 'g')`` CTEs; only ``tox_hits`` feeds the rules but
  it must count on the post-PII text (a tox word inside an email local
  part is scrubbed before TOX runs).  Patterns are written in the
  Java/Python/RE2-coincident subset (scoring/scrub.py); the explicit
  whitespace classes need one mechanical rewrite (``\\uXXXX`` →
  ``\\x{XXXX}``) because RE2 lacks the ``\\u`` escape.
- **rules**    — length / words / repetition / symbol / stopword-density
  as exact integer counts with single float divisions, token-for-token
  against scoring/rules.py; stopword lists inlined per language.
- **decide**   — the 14-rule conjunction (config.RULE_IDS order is
  irrelevant for the boolean) with thresholds inlined from
  :class:`curator_spark.config.RuleThresholds` via ``repr`` literals.

Float discipline is the house pattern: every model weight is a
shortest-round-trip literal, every count is exact integer arithmetic,
and the only order-sensitive float sums (trigram logp, LM logp, x²
energy) sit behind threshold comparisons on irrational values or the
final ``round(avg, 4)`` — the same absorption argument every existing
oracle already relies on.

Reference analog: the end-to-end curation DAG this replicates is the
reference's full request→score→filter pipeline (SURVEY.md §2.2-2.3;
``base_online_request_processor.py:304-449`` for scoring,
``llm/llm.py:139-164`` for the filter/identity idiom).
"""

from __future__ import annotations

import re

from ..config import RuleThresholds
from ..synth import textgen
from . import audio_sql, sql_model
from .rules import NON_ALNUM_CLASS, WS_CLASS
from .scrub import SCRUB_PATTERNS

N_FIXTURE_PIPE_CLIPS = 300


def _re2(pattern: str) -> str:
    """Java/Python ``\\uXXXX`` escapes → RE2 ``\\x{XXXX}`` (DuckDB = RE2)."""
    return re.sub(r"\\u([0-9a-fA-F]{4})", r"\\x{\g<1>}", pattern)


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _stopword_rows() -> str:
    rows = []
    for lang in textgen.LANGS:
        for w in sorted(textgen.stopwords(lang)):
            rows.append(f"({_q(lang)}, {_q(w)})")
    return ",\n".join(rows)


def ensure_pipe_fixture(n: int = N_FIXTURE_PIPE_CLIPS) -> str:
    """The clip batch ``clip_keep_summary`` scores, as parquet."""
    return audio_sql.ensure_clip_fixture(n)


def clip_keep_summary_sql(path: str) -> str:
    """Full-DAG oracle for the ``clip_keep_summary`` gate query."""
    return f"""{_pipeline_ctes(path)}
SELECT lang, keep, COUNT(*) AS n,
  round(AVG(ppl), 4) AS mean_ppl,
  round(AVG(silence_ratio), 4) AS mean_silence
FROM decide
GROUP BY lang, keep
ORDER BY lang, keep
"""


def clip_keep_labels_sql(path: str) -> str:
    """Per-clip (clip_id, lang, keep) from the same DAG — the fine-grained
    face of the rollup above; tests/test_scoring_core.py asserts it against
    ``oracle.golden_labels`` row-by-row, so a compensating label flip inside
    a rollup group cannot hide."""
    return f"""{_pipeline_ctes(path)}
SELECT doc_id AS clip_id, lang, keep FROM decide ORDER BY doc_id
"""


def pii_scrub_detail_sql(path: str) -> str:
    """Oracle for ``pii_scrub_detail``: the EMAIL → SSN → PHONE → TOX
    chain replayed step-by-step in RE2 — each step counts on the text the
    PREVIOUS step already scrubbed (so an SSN inside a replaced email can
    never double-count), exactly like ``stages.scrub_detail_stage``. The
    scrubbed string itself is a hash-compared column."""
    (_, p_email, r_email), (_, p_ssn, r_ssn), (_, p_phone, r_phone), (_, p_tox, r_tox) = (
        SCRUB_PATTERNS
    )
    return f"""WITH d AS (
  SELECT clip_id, COALESCE(transcript, '') AS t0 FROM read_parquet('{path}')
), s1 AS (
  SELECT clip_id, len(regexp_extract_all(t0, {_q(p_email)})) AS email_hits,
         regexp_replace(t0, {_q(p_email)}, {_q(r_email)}, 'g') AS t1
  FROM d
), s2 AS (
  SELECT clip_id, email_hits,
         len(regexp_extract_all(t1, {_q(p_ssn)})) AS ssn_hits,
         regexp_replace(t1, {_q(p_ssn)}, {_q(r_ssn)}, 'g') AS t2
  FROM s1
), s3 AS (
  SELECT clip_id, email_hits, ssn_hits,
         len(regexp_extract_all(t2, {_q(p_phone)})) AS phone_hits,
         regexp_replace(t2, {_q(p_phone)}, {_q(r_phone)}, 'g') AS t3
  FROM s2
), s4 AS (
  SELECT clip_id, email_hits, ssn_hits, phone_hits,
         len(regexp_extract_all(t3, {_q(p_tox)})) AS tox_hits,
         regexp_replace(t3, {_q(p_tox)}, {_q(r_tox)}, 'g') AS scrubbed_transcript
  FROM s3
)
SELECT clip_id, scrubbed_transcript,
  CAST(email_hits AS INT) AS email_hits,
  CAST(ssn_hits AS INT) AS ssn_hits,
  CAST(phone_hits AS INT) AS phone_hits,
  CAST(tox_hits AS INT) AS tox_hits
FROM s4 ORDER BY clip_id
"""


def _pipeline_ctes(path: str) -> str:
    """The shared WITH-chain ending in ``decide(doc_id, lang, ppl,
    silence_ratio, keep)``."""
    import pyarrow.parquet as pq

    t = RuleThresholds()
    texts = [
        x if isinstance(x, str) else ""
        for x in pq.read_table(path, columns=["transcript"]).column("transcript").to_pylist()
    ]
    words, bigrams = sql_model.doc_probe_sets(texts)
    uni_rows, bi_rows, lc_rows = sql_model.lm_literals_for_docs(words, bigrams)
    (_, p_email, r_email), (_, p_ssn, r_ssn), (_, p_phone, r_phone), (_, p_tox, _) = SCRUB_PATTERNS
    ws_q, na_q = _q(_re2(WS_CLASS)), _q(_re2(NON_ALNUM_CLASS))
    return f"""WITH {audio_sql._samples_cte(path)},
afeat AS (
  SELECT clip_id,
    20.0 * log10(GREATEST(sqrt(SUM(x * x) / COUNT(*)), 1e-6)) AS rms_db,
    COUNT(*) FILTER (WHERE abs(x) < 0.01) / CAST(COUNT(*) AS DOUBLE) AS silence_ratio,
    COUNT(*) FILTER (WHERE abs(x) > 0.985) / CAST(COUNT(*) AS DOUBLE) AS clip_ratio
  FROM sampx GROUP BY clip_id
), audio AS (
  -- ok AND dur_ms IS NOT NULL: decode_stage coerces int(dur_ms) inside
  -- its quarantine try, so NULL dur is decode_ok=false (reason 'decode')
  -- on the Spark side even when the payload itself decodes
  SELECT m.clip_id, m.dur_ms, (m.ok AND m.dur_ms IS NOT NULL) AS decode_ok,
    CASE WHEN NOT (m.ok AND m.dur_ms IS NOT NULL) THEN CAST('nan' AS DOUBLE)
         ELSE COALESCE(f.rms_db, -120.0) END AS rms_db,
    CASE WHEN NOT (m.ok AND m.dur_ms IS NOT NULL) THEN 1.0
         ELSE COALESCE(f.silence_ratio, 1.0) END AS silence_ratio,
    CASE WHEN NOT (m.ok AND m.dur_ms IS NOT NULL) THEN 1.0
         ELSE COALESCE(f.clip_ratio, 0.0) END AS clip_ratio
  FROM meta m LEFT JOIN afeat f USING (clip_id)
), documents AS (
  SELECT clip_id AS doc_id, COALESCE(transcript, '') AS text
  FROM read_parquet('{path}')
), {sql_model._langid_ctes()},
confx AS (
  SELECT doc_id, greatest(e0, e1, e2) / (e0 + e1 + e2) AS conf_raw FROM soft
), uni(lang, w, lp) AS (VALUES
{uni_rows}
), bi(lang, wa, wb, lp) AS (VALUES
{bi_rows}
), lc(lang, oov, bk) AS (VALUES
{lc_rows}
), wrds AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS words
  FROM documents
), pairs AS (
  SELECT doc_id,
    CASE WHEN i = 1 THEN '<s>' ELSE words[CAST(i - 1 AS INT)] END AS wa,
    words[CAST(i AS INT)] AS wb
  FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i
        FROM wrds WHERE len(words) > 0)
), plp AS (
  SELECT p.doc_id,
    SUM(COALESCE(b.lp, l.bk + COALESCE(u.lp, l.oov))) AS lp_sum,
    COUNT(*) AS nw
  FROM pairs p
  JOIN pred ON pred.doc_id = p.doc_id
  JOIN lc l ON l.lang = pred.pred_lang
  LEFT JOIN bi b ON b.lang = pred.pred_lang AND b.wa = p.wa AND b.wb = p.wb
  LEFT JOIN uni u ON u.lang = pred.pred_lang AND u.w = p.wb
  GROUP BY p.doc_id
), pplx AS (
  SELECT d.doc_id, COALESCE(exp(-plp.lp_sum / plp.nw), exp(-l.oov)) AS ppl
  FROM documents d
  JOIN pred ON pred.doc_id = d.doc_id
  JOIN lc l ON l.lang = pred.pred_lang
  LEFT JOIN plp ON plp.doc_id = d.doc_id
), s1 AS (
  SELECT doc_id, regexp_replace(text, {_q(p_email)}, {_q(r_email)}, 'g') AS tx
  FROM documents
), s2 AS (SELECT doc_id, regexp_replace(tx, {_q(p_ssn)}, {_q(r_ssn)}, 'g') AS tx FROM s1
), s3 AS (SELECT doc_id, regexp_replace(tx, {_q(p_phone)}, {_q(r_phone)}, 'g') AS tx FROM s2
), toxh AS (
  SELECT doc_id, len(regexp_extract_all(tx, {_q(p_tox)})) AS tox_hits FROM s3
), feats AS (
  SELECT d.doc_id, length(d.text) AS n_chars, w.words, len(w.words) AS n_words,
    CASE WHEN len(w.words) > 0
         THEN len(list_distinct(w.words)) / CAST(len(w.words) AS DOUBLE)
         ELSE 0.0 END AS distinct_ratio,
    length(regexp_replace(d.text, {ws_q}, '', 'g')) AS nonspace,
    length(regexp_replace(d.text, {na_q}, '', 'g')) AS symbols
  FROM documents d JOIN wrds w USING (doc_id)
), stw(lang, w) AS (VALUES
{_stopword_rows()}
), stoph AS (
  SELECT fw.doc_id, COUNT(s.w) AS stop_hits
  FROM (SELECT doc_id, unnest(words) AS w FROM feats) fw
  JOIN pred p ON p.doc_id = fw.doc_id
  LEFT JOIN stw s ON s.lang = p.pred_lang AND s.w = fw.w
  GROUP BY fw.doc_id
), decide AS (
  SELECT p.doc_id, p.pred_lang AS lang, px.ppl, a.silence_ratio,
    (f.n_chars >= {t.len_min} AND f.n_chars <= {t.len_max}
     AND f.n_words >= {t.words_min}
     AND f.distinct_ratio >= {t.distinct_ratio_min!r}
     AND (f.symbols / CAST(GREATEST(f.nonspace, 1) AS DOUBLE)) <= {t.symbol_ratio_max!r}
     AND (CASE WHEN f.n_words > 0
               THEN COALESCE(sh.stop_hits, 0) / CAST(f.n_words AS DOUBLE)
               ELSE 0.0 END) >= {t.stopword_density_min!r}
     AND COALESCE(c.conf_raw, 0.0) >= {t.lang_conf_min!r}
     AND px.ppl <= {t.ppl_max!r}
     AND tx.tox_hits <= {t.tox_hits_max}
     AND a.dur_ms >= {t.dur_ms_min} AND a.dur_ms <= {t.dur_ms_max}
     AND a.decode_ok AND a.rms_db >= {t.rms_db_min!r}
     AND a.silence_ratio <= {t.silence_ratio_max!r}
     AND a.clip_ratio <= {t.clip_ratio_max!r}) AS keep
  FROM pred p
  JOIN audio a ON a.clip_id = p.doc_id
  JOIN pplx px ON px.doc_id = p.doc_id
  JOIN toxh tx ON tx.doc_id = p.doc_id
  JOIN feats f ON f.doc_id = p.doc_id
  LEFT JOIN confx c ON c.doc_id = p.doc_id
  LEFT JOIN stoph sh ON sh.doc_id = p.doc_id
)"""
