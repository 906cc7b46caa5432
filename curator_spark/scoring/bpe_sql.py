"""DuckDB-SQL re-implementation of the greedy BPE apply.

Turns ``token_count_bpe`` from a rows-only driver check into a full
value-hash oracle row.  The split follows the house pattern for model-
backed ops (langid/LM/IVF): the trained MODEL — the 200 merge ranks,
a pure function of the seeded corpus — is inlined as ``VALUES``
literals, and the ALGORITHM — the greedy lowest-rank-pair merge loop of
:func:`curator_spark.scoring.bpe.encode_word` — is re-executed inside
DuckDB as a recursive CTE over the distinct words of the target table:

- seed: each word becomes its codepoint list + the ``</w>`` marker
  (DuckDB ``string_split(w, '')`` yields codepoints, same as Python
  ``tuple(w)``);
- step: among adjacent pairs present in the merge table, merge the one
  with the lowest ``(rank, position)`` — ``arg_min(i, rank * 1000000 +
  i)`` over an unnested position range (positions are < 1e6, so the
  composite scalar key orders exactly like the tuple);
- stop: no applicable pair (``bi IS NULL``) or a single symbol left —
  the same two exits as the Python ``while`` loop.

Per-document counts then join each word OCCURRENCE back to its encoded
length and sum.  Cost is bounded by the unique vocabulary × word length,
exactly the LRU-cache argument the Python side makes.
"""

from __future__ import annotations

from . import bpe

END_LIT = "'</w>'"


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def merge_rows() -> str:
    """(a, b, rank) VALUES rows for the trained merge table, rank order."""
    return ",\n".join(
        f"({_q(a)}, {_q(b)}, {int(r)})"
        for (a, b), r in sorted(bpe.merges().items(), key=lambda kv: kv[1])
    )


def token_count_bpe_sql() -> str:
    """Full oracle for the ``token_count_bpe`` gate query (over the
    driver-registered ``documents`` view)."""
    return f"""WITH RECURSIVE mrg(a, b, r) AS (VALUES
{merge_rows()}
), dw AS (
  SELECT doc_id,
    list_filter(string_split(COALESCE(text, ''), ' '), x -> x <> '') AS words
  FROM documents
), uw AS (
  SELECT DISTINCT unnest(words) AS word FROM dw
), enc(word, syms, done) AS (
  SELECT word, list_append(string_split(word, ''), {END_LIT}), FALSE FROM uw
  UNION ALL
  SELECT word,
    CASE WHEN bi IS NULL THEN syms
         ELSE list_concat(list_concat(
                syms[1:CAST(bi - 1 AS INT)],
                [syms[CAST(bi AS INT)] || syms[CAST(bi + 1 AS INT)]]),
                syms[CAST(bi + 2 AS INT):]) END,
    bi IS NULL OR len(syms) - 1 <= 1
  FROM (
    SELECT e.word, e.syms,
      (SELECT arg_min(p.i, m.r * 1000000 + p.i)
       FROM (SELECT unnest(range(1, len(e.syms))) AS i) p
       JOIN mrg m ON m.a = e.syms[CAST(p.i AS INT)]
                 AND m.b = e.syms[CAST(p.i + 1 AS INT)]) AS bi
    FROM enc e
    WHERE NOT e.done AND len(e.syms) > 1
  )
), wtok AS (
  SELECT word, len(syms) AS n_tok FROM enc WHERE done
), occ AS (
  SELECT doc_id, unnest(words) AS word FROM dw
), dsum AS (
  SELECT o.doc_id, SUM(t.n_tok) AS n_bpe
  FROM occ o JOIN wtok t USING (word) GROUP BY o.doc_id
)
SELECT d.doc_id,
  CAST(len(d.words) AS BIGINT) AS n_words,
  CAST(COALESCE(s.n_bpe, 0) AS BIGINT) AS n_bpe_tokens
FROM dw d LEFT JOIN dsum s USING (doc_id)
ORDER BY d.doc_id
"""
