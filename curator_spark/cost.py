"""Per-stage cost accounting — completes the SURVEY §2 A1 analogy.

The reference prices every request from a per-model USD map
(``src/bespokelabs/curator/cost.py:16-143``: ``in_mtok_cost/out_mtok_cost``
→ per-token rates, with a batch-mode discount) and folds the running total
into its tracker. Offline there is no provider bill, but the pipeline has
the same two cost questions, so this module gives both faces over the
SAME rate card:

- :func:`estimate_stage_costs` — the *budget* face: a deterministic
  pre-run estimate from pure row/char/token counts of the input table.
  Being a pure function of the data, it is gate-queryable against a
  DuckDB oracle (``stage_cost_estimate``).
- :func:`measured_stage_costs` — the *bill* face: a post-run rollup over
  the pipeline's audit table (rows actually processed, wall-clock
  actually spent), priced by the same card plus a compute rate. Wall
  time is nondeterministic, so this face is pytest-reconciled rather
  than hash-gated.

Scale shape: both are single aggregations over already-small frames (the
audit table is O(partitions × stages); the estimator is one map-side
combinable agg over a 2-column pruned scan). The rate card rides the
closure — no driver loop, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ops import load

#: chars-per-token divisor for the token-priced stages. The reference
#: prices real tokenizer counts; offline the public ~4-chars/token
#: heuristic keeps the estimate deterministic and tokenizer-free.
CHARS_PER_TOKEN = 4.0


@dataclass(frozen=True)
class RateCard:
    """USD rates, per stage. ``usd_per_1m_rows`` prices per-row overhead
    (request shaping, scheduling); ``usd_per_1m_tokens`` prices
    content-proportional work (≙ the reference's ``in_mtok_cost``);
    ``usd_per_cpu_hour`` prices measured wall time (measured face only).
    Stages absent from a map cost 0 for that component."""

    usd_per_1m_rows: tuple = ()
    usd_per_1m_tokens: tuple = ()
    usd_per_cpu_hour: float = 0.0

    def rows_rate(self, stage: str) -> float:
        return dict(self.usd_per_1m_rows).get(stage, 0.0)

    def tokens_rate(self, stage: str) -> float:
        return dict(self.usd_per_1m_tokens).get(stage, 0.0)


#: Pinned default card — the gate query's determinism depends on these
#: exact literals (the DuckDB oracle inlines them). Values are arbitrary
#: but plausible: scoring stages price tokens, row-shaped stages price
#: rows.
DEFAULT_RATES = RateCard(
    usd_per_1m_rows=(("decode", 0.20), ("score", 0.05), ("scrub", 0.05), ("decide", 0.01)),
    usd_per_1m_tokens=(("score", 0.40), ("scrub", 0.10)),
    usd_per_cpu_hour=0.049,  # an on-demand vCPU-hour ballpark
)

STAGES = ("decode", "score", "scrub", "decide")


def estimate_stage_costs(
    spark: SparkSession,
    sf_dir: str,
    rates: RateCard = DEFAULT_RATES,
) -> DataFrame:
    """Deterministic pre-run cost estimate per pipeline stage over the
    ``documents`` table: (stage, n_rows, n_tokens, est_usd), est_usd =
    rows/1e6·row_rate + tokens/1e6·token_rate with tokens =
    ceil(length(text)/4) per doc (NULL text counts 0 tokens but still a
    row — a NULL clip still occupies a decode/decide slot).

    One 2-column pruned scan, one map-side-combinable global agg; the
    4-stage fan-out happens on the AGGREGATED scalars (a 4-row frame),
    not per input row."""
    docs = load(spark, sf_dir, "documents")
    tok = F.ceil(F.length("text") / F.lit(CHARS_PER_TOKEN)).cast("long")
    tot = docs.agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.sum(tok), F.lit(0)).alias("n_tokens"),
    )
    # the 4-stage fan-out is an EXPLODE of a literal rate array over the
    # 1-row aggregate — no join node at all (a 4-way union of `tot`
    # selects would re-derive the corpus scan per branch since Catalyst
    # does not ReuseExchange differently-projected branches, and a cross
    # join against a rate frame compiles to BroadcastNestedLoopJoin,
    # which the fleet-wide plan-hygiene test rightly forbids)
    card = F.array(
        *[
            F.struct(
                F.lit(s).alias("stage"),
                F.lit(rates.rows_rate(s)).alias("r_rows"),
                F.lit(rates.tokens_rate(s)).alias("r_tok"),
            )
            for s in STAGES
        ]
    )
    est = (
        F.col("n_rows") / F.lit(1e6) * F.col("c.r_rows")
        + F.col("n_tokens") / F.lit(1e6) * F.col("c.r_tok")
    )
    return (
        tot.select(F.explode(card).alias("c"), "n_rows", "n_tokens")
        .select(F.col("c.stage").alias("stage"), "n_rows", "n_tokens", F.round(est, 8).alias("est_usd"))
        .orderBy("stage")
    )


def estimate_stage_costs_sql(rates: RateCard = DEFAULT_RATES) -> str:
    """The DuckDB twin of :func:`estimate_stage_costs` — same pinned
    literals, same rounding, same NULL-token contract."""
    stage_select = ", ".join(
        f"({r_rows!r}::DOUBLE, {r_tok!r}::DOUBLE, '{s}')"
        for s, r_rows, r_tok in (
            (s, rates.rows_rate(s), rates.tokens_rate(s)) for s in STAGES
        )
    )
    return f"""
WITH tot AS (
  -- outer ::BIGINT: DuckDB sums BIGINT into HUGEINT, which would
  -- schema-mismatch Spark's long
  SELECT count(*) AS n_rows,
         coalesce(sum(ceil(length(text) / {CHARS_PER_TOKEN})::BIGINT), 0)::BIGINT AS n_tokens
  FROM documents
), card(r_rows, r_tok, stage) AS (
  VALUES {stage_select}
)
SELECT stage, n_rows, n_tokens,
       round(n_rows / 1e6 * r_rows + n_tokens / 1e6 * r_tok, 8) AS est_usd
FROM tot CROSS JOIN card
ORDER BY stage
"""


def measured_stage_costs(
    audit: DataFrame, rates: RateCard = DEFAULT_RATES
) -> DataFrame:
    """Price the audit table: per (run_fingerprint, stage) USD from rows
    actually processed plus wall-clock actually spent. ``wall_ms`` in the
    audit table is recorded per commit GROUP and repeated on each of the
    group's (partition, stage) rows, so the compute component divides it
    across the run's stage rows (sum(wall_ms)/n_stage_rows·n would
    double-price; we price each row's share once).

    No token component here: the audit table records row counts, not
    content sizes — content-proportional pricing belongs to the estimator
    (or to a metrics entry a stage chooses to record)."""
    n_stages = F.lit(len(STAGES))
    per_stage = (
        audit.groupBy("run_fingerprint", "stage")
        .agg(
            F.sum("rows_in").alias("rows_in"),
            F.sum("rows_out").alias("rows_out"),
            F.sum(F.col("wall_ms") / n_stages).alias("wall_ms_share"),
        )
    )
    rate_rows = F.create_map(
        *[x for s in STAGES for x in (F.lit(s), F.lit(rates.rows_rate(s)))]
    )
    usd = (
        F.col("rows_in") / F.lit(1e6) * F.coalesce(rate_rows[F.col("stage")], F.lit(0.0))
        + F.col("wall_ms_share") / F.lit(3_600_000.0) * F.lit(rates.usd_per_cpu_hour)
    )
    return per_stage.select(
        "run_fingerprint",
        "stage",
        "rows_in",
        "rows_out",
        F.round("wall_ms_share", 3).alias("wall_ms_share"),
        F.round(usd, 8).alias("usd"),
    ).orderBy("run_fingerprint", "stage")
