"""SQL-literal exports of the deterministic scoring models.

The langid trigram table and the per-language bigram LMs are pure
functions of the seeded synthetic corpus (:mod:`curator_spark.synth.textgen`),
so — exactly like the IVF centroid inlining
(``curator_spark/ops/similarity.py:ivf_oracle_params``) — their weights can
be emitted as SQL ``VALUES`` literals and the whole scoring algorithm
replicated inside DuckDB.  That turns ``langid_docs`` and ``doc_perplexity``
from rows-only driver checks into full value-hash oracle rows.

Reference analog: the generate-map scoring stage
(``base_online_request_processor.py:304-449``); the "model file" here is a
deterministic training run, which is what makes an independent SQL
re-implementation possible at all.

Float discipline: every weight is emitted with ``repr(float)`` (shortest
round-trip), so DuckDB parses the *identical* double the numpy model holds.
The only remaining divergence is floating-point summation order, which both
query sides absorb by rounding the final score (``round(conf, 6)`` /
``round(ppl, 4)`` — the house pattern every cosine oracle already uses).
"""

from __future__ import annotations

import numpy as np

from ..synth import textgen
from . import langid as _langid
from . import lm as _lm

_L = textgen.LANGS  # SQL literals derive from the ONE language tuple


def _prior_fallback() -> str:
    """Empty/NULL-text fallback language — the SAME argmax(log_prior) the
    Python side takes (langid.score_text), derived rather than hardcoded
    so reordering LANG_PROBS cannot desync the engines on exactly the
    hard-to-localize empty-document rows."""
    return textgen.LANGS[int(np.argmax(textgen.LANG_PROBS))]

_BOS = "<s>"


def langid_model_literals() -> tuple[str, list[float], list[float]]:
    """→ (VALUES rows for (bucket, lp0, lp1, lp2), per-lang default logp,
    per-lang log prior).

    Only buckets with a non-default weight in ANY language are emitted
    (~1.7k of 65 536); everything else is the per-language add-0.5
    smoothing constant, inlined as the ``COALESCE`` fallback.
    """
    logpT, log_prior = _langid.model()  # (N_BUCKETS, n_langs), (n_langs,)
    n_langs = logpT.shape[1]
    defaults: list[float] = []
    for li in range(n_langs):
        vals, counts = np.unique(logpT[:, li], return_counts=True)
        defaults.append(float(vals[np.argmax(counts)]))
    nondef = np.nonzero((logpT != np.asarray(defaults)).any(axis=1))[0]
    rows = ",\n".join(
        f"({int(b)}, {', '.join(repr(float(logpT[b, li])) for li in range(n_langs))})"
        for b in nondef
    )
    return rows, defaults, [float(v) for v in log_prior]


def _string_keyed_lms() -> dict[str, tuple[dict[str, float], dict[tuple[str, str], float], float, float]]:
    """Rebuild each language LM keyed by word STRINGS instead of FNV hashes.

    The hash-keyed model (:func:`curator_spark.scoring.lm.model`) defines
    the semantics; this mirror recomputes the same counts with the same
    float expressions and asserts table-size parity, so a hash collision
    between two distinct vocabulary words (which would silently merge
    counts) is detected instead of producing a diverging oracle.
    """
    out = {}
    ref = _lm.model()
    for lang in textgen.LANGS:
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        ctx: dict[str, int] = {}
        total = 0
        for sent in textgen.training_corpus(lang):
            ws = [_BOS] + [w for w in sent.split(" ") if w != ""]
            for w in ws[1:]:
                uni[w] = uni.get(w, 0) + 1
                total += 1
            for a, b in zip(ws[:-1], ws[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
                ctx[a] = ctx.get(a, 0) + 1
        r = ref[lang]
        if len(uni) != len(r.uni_logp) or len(bi) != len(r.bi_count):
            raise AssertionError(
                f"hash collision in {lang} LM vocabulary: "
                f"uni {len(uni)}/{len(r.uni_logp)} bi {len(bi)}/{len(r.bi_count)}"
            )
        v = len(uni)
        denom = total + 0.1 * (v + 1)
        uni_logp = {w: float(np.log((c + 0.1) / denom)) for w, c in uni.items()}
        bi_logp = {k: float(np.log(c / ctx[k[0]])) for k, c in bi.items()}
        oov = float(np.log(0.1 / denom))
        if oov != r.oov_logp:
            raise AssertionError(f"{lang} oov mismatch: {oov} != {r.oov_logp}")
        out[lang] = (uni_logp, bi_logp, oov, r.backoff_logp)
    return out


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def lm_literals_for_docs(
    doc_words: "set[str]", doc_bigrams: "set[tuple[str, str]]"
) -> tuple[str, str, str]:
    """→ (uni VALUES rows, bi VALUES rows, per-lang constants rows).

    Tables are restricted to keys that can actually be probed by the target
    documents (``doc_words`` / ``doc_bigrams`` include the ``<s>``-prefixed
    first-word pair), keeping the inlined SQL proportional to the corpus
    overlap instead of the full ~13k-bigram model.  A sentinel row keyed by
    a single space (never a word: the tokenizer splits on spaces) keeps the
    ``VALUES`` clause non-empty when the overlap is empty.
    """
    lms = _string_keyed_lms()
    uni_rows = ["('~none', ' ', 0.0)"]
    bi_rows = ["('~none', ' ', ' ', 0.0)"]
    lc_rows = []
    for lang in textgen.LANGS:
        uni_logp, bi_logp, oov, backoff = lms[lang]
        for w in sorted(doc_words):
            if w in uni_logp:
                uni_rows.append(f"({_q(lang)}, {_q(w)}, {uni_logp[w]!r})")
        for a, b in sorted(doc_bigrams):
            if (a, b) in bi_logp:
                bi_rows.append(f"({_q(lang)}, {_q(a)}, {_q(b)}, {bi_logp[(a, b)]!r})")
        lc_rows.append(f"({_q(lang)}, {oov!r}, {backoff!r})")
    return ",\n".join(uni_rows), ",\n".join(bi_rows), ",\n".join(lc_rows)


def _langid_ctes() -> str:
    """Shared CTE chain: documents → hashed char trigrams → per-lang scores
    → softmax(T=0.5) → ``pred(doc_id, pred_lang, lang_conf)``.

    Replicates :func:`curator_spark.scoring.langid.trigram_buckets` exactly:
    lowercase, ``^``/``$`` boundary markers, latin-1 byte codes with
    codepoints > 255 mapped to ``?`` (63), hash
    ``(c1*17161 + c2*131 + c3) % 65536``.  DuckDB's character-indexed
    ``substring``/``unicode`` match Python string indexing on the same text.
    Argmax tie-break (first language wins) mirrors ``np.argmax``.
    """
    rows, (d0, d1, d2), (p0, p1, p2) = langid_model_literals()
    code = (
        "(CASE WHEN unicode(substring(t, CAST({i} AS INT), 1)) > 255 THEN 63 "
        "ELSE unicode(substring(t, CAST({i} AS INT), 1)) END)"
    )
    h = (
        f"({code.format(i='i')} * 17161 + {code.format(i='i + 1')} * 131 "
        f"+ {code.format(i='i + 2')}) % 65536"
    )
    return f"""mdl(bucket, lp0, lp1, lp2) AS (VALUES
{rows}
), base AS (
  SELECT doc_id, '^' || lower(text) || '$' AS t FROM documents
), tri AS (
  SELECT doc_id, unnest(list_transform(range(1, length(t) - 1), i -> {h})) AS bucket
  FROM base WHERE length(t) >= 3
), smry AS (
  SELECT doc_id, COUNT(*) AS n,
    SUM(COALESCE(m.lp0, {d0!r})) AS s0,
    SUM(COALESCE(m.lp1, {d1!r})) AS s1,
    SUM(COALESCE(m.lp2, {d2!r})) AS s2
  FROM tri LEFT JOIN mdl m USING (bucket) GROUP BY doc_id
), sc AS (
  SELECT doc_id,
    s0 / n + ({p0!r}) / n AS a0,
    s1 / n + ({p1!r}) / n AS a1,
    s2 / n + ({p2!r}) / n AS a2
  FROM smry
), soft AS (
  SELECT doc_id, a0, a1, a2,
    exp((a0 - greatest(a0, a1, a2)) * 0.5) AS e0,
    exp((a1 - greatest(a0, a1, a2)) * 0.5) AS e1,
    exp((a2 - greatest(a0, a1, a2)) * 0.5) AS e2
  FROM sc
), pred AS (
  SELECT d.doc_id,
    COALESCE(CASE WHEN s.a0 IS NULL THEN NULL
                  WHEN s.a0 >= s.a1 AND s.a0 >= s.a2 THEN '{_L[0]}'
                  WHEN s.a1 >= s.a2 THEN '{_L[1]}'
                  ELSE '{_L[2]}' END, '{_prior_fallback()}') AS pred_lang,
    COALESCE(round(greatest(s.e0, s.e1, s.e2) / (s.e0 + s.e1 + s.e2), 6), 0.0) AS lang_conf
  FROM documents d LEFT JOIN soft s USING (doc_id)
)"""


def langid_docs_sql() -> str:
    """Full DuckDB oracle for the ``langid_docs`` gate query."""
    return f"""WITH {_langid_ctes()}
SELECT doc_id, pred_lang, lang_conf FROM pred ORDER BY doc_id
"""


def doc_perplexity_sql(doc_texts: "list[str]") -> str:
    """Full DuckDB oracle for ``doc_perplexity``: langid-predicted language
    → that language's bigram LM with stupid backoff
    (:func:`curator_spark.scoring.lm.ppl`), keyed by word strings (exactly
    equivalent to the hash-keyed model absent FNV collisions, which
    :func:`_string_keyed_lms` asserts away)."""
    words, bigrams = doc_probe_sets(doc_texts)
    uni_rows, bi_rows, lc_rows = lm_literals_for_docs(words, bigrams)
    return f"""WITH {_langid_ctes()},
uni(lang, w, lp) AS (VALUES
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
)
SELECT d.doc_id, pred.pred_lang,
  round(COALESCE(exp(-plp.lp_sum / plp.nw), exp(-l.oov)), 4) AS ppl
FROM documents d
JOIN pred ON pred.doc_id = d.doc_id
JOIN lc l ON l.lang = pred.pred_lang
LEFT JOIN plp ON plp.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def doc_probe_sets(texts: "list[str]") -> tuple["set[str]", "set[tuple[str, str]]"]:
    """Word + (BOS-prefixed) bigram sets a document corpus can probe."""
    words: set[str] = set()
    bigrams: set[tuple[str, str]] = set()
    for t in texts:
        ws = [w for w in (t or "").split(" ") if w != ""]
        words.update(ws)
        seq = [_BOS, *ws]
        bigrams.update(zip(seq[:-1], seq[1:]))
    return words, bigrams
