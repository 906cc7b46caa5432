"""Physical-plan assertions — the PLANS.md claims, locked by tests.

Every table row in PLANS.md says "this query compiles to that plan".
These tests pin the load-bearing properties so a refactor that silently
loses a pushdown, a broadcast, or the single-Python-pass shape fails CI
instead of surfacing as a 10x regression at scale.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    # formatted mode: full ReadSchema/PushedFilters (plain toString
    # truncates the schema at ~100 chars)
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q1_filter_pushed_to_scan(spark):
    from curator_spark.ops import relational

    plan = _plan(relational.q1_pricing_summary(spark, SF_DIR))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters", 1)[1][:200]
    # column pruning: the scan must not read all 16 lineitem columns
    read = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "l_comment" not in read and "l_shipdate" in read


def test_q3_dims_broadcast(spark):
    from curator_spark.ops import relational

    plan = _plan(relational.q3_top_revenue(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # top-10 must be a per-partition top-k merge, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_resume_anti_join_is_broadcast_anti(spark):
    from curator_spark.ops import relational

    plan = _plan(relational.resume_anti_join(spark, SF_DIR))
    assert "LeftAnti" in plan


def test_no_gate_query_compiles_to_cartesian_or_row_python(spark):
    """Fleet-wide plan hygiene: NO driver-gate query may compile to a
    CartesianProduct (all-pairs — the scale killer every dedup op here
    exists to avoid), a BroadcastNestedLoopJoin (its broadcast twin), or
    BatchEvalPython (row-at-a-time Python). Catches a regressed join key
    or a UDF downgrade anywhere in the 60+ query surface."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    flagged = {}
    for name, fn in entry.queries().items():
        plan = _plan(fn(spark, SF_DIR))
        hits = [
            p
            for p in ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
            if p in plan
        ]
        if hits:
            flagged[name] = hits
    assert not flagged, flagged


def test_decontaminate_eval_side_semi_join_no_python(spark):
    """The eval-gram membership test is a LEFT-SEMI join with NO forced
    broadcast hint (round-3 ADVICE: the gate's stand-in eval slice grows
    with the corpus, so AQE must be free to fall back to a shuffled
    semi-join instead of OOMing a forced broadcast) and the whole op
    stays JVM-side."""
    from curator_spark.ops import dedup

    plan = _plan(dedup.decontaminate_ngrams(spark, SF_DIR))
    assert "LeftSemi" in plan
    for node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert node not in plan


def test_clip_stages_single_python_pass(spark):
    """The fused decode+score stage is the ONLY Python node in the clip
    DAG — the scrub/rules/decide suffix must stay JVM-side."""
    from curator_spark import stages
    from curator_spark.config import PipelineConfig
    from curator_spark.synth import clips

    plan = _plan(stages.apply_all(clips.generate_clips(spark, 50, 2), PipelineConfig().rules))
    # two MapInPandas NODES (formatted mode lists each node twice — tree +
    # details): the seeded generator itself + the fused stage — and
    # nothing else Python
    assert plan.count("MapInPandas") == 2 * 2
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python anywhere


def test_text_family_has_no_python(spark):
    from curator_spark.ops import text

    plan = _plan(text.quality_scores(spark, SF_DIR))
    for node in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
        assert node not in plan


def test_cross_doc_dup_spans_single_scan(spark):
    """Round-5 shape (VERDICT r4 task #4): window-free, totals-without-
    explode, and NO persist by default. Per-doc totals come straight
    from length(text) — only the two dup-side consumers run the
    explode+md5 (Generate nodes) — and the cross-doc test is a
    map-side-combinable groupBy joined back, never a count window over
    the gram partitioning, whose hot boilerplate key would be
    un-splittable (PLANS.md r3/r4/r5 rows). The A/B'd-off persist stays
    available behind _SPAN_PERSIST for storage-rich deployments."""
    from curator_spark.ops import dedup

    plan = _plan(dedup.cross_doc_dup_spans(spark, SF_DIR))
    assert "Window" not in plan
    assert plan.count("InMemoryTableScan") == 0  # persist is off by default
    # explode runs ONLY on the dup side: one Generate per consumer branch,
    # none on the totals branch (it reads length(text) directly)
    assert plan.count("explode(") == 2
    try:
        dedup._SPAN_PERSIST = True
        plan_p = _plan(dedup.cross_doc_dup_spans(spark, SF_DIR))
        assert plan_p.count("InMemoryTableScan") >= 2  # knob restores the cache
    finally:
        dedup._SPAN_PERSIST = False
        dedup.clear_session_cache(spark)


@pytest.mark.parametrize(
    "name",
    [
        "distinct_users_daily",
        "events_asof_join",
        "events_range_join",
        "approx_distinct_kmv",
        "events_hopping_window",
    ],
)
def test_new_relational_oracle(spark, name):
    import duckdb

    import __spark_entry__ as entrymod
    from tools.verify_oracles import TABLES, norm, value_hash

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    got = norm(entrymod.queries()[name](spark, SF_DIR).toPandas())
    exp = norm(con.sql(entrymod.oracle_sql()[name]).df())
    assert len(got) == len(exp) and value_hash(got) == value_hash(exp)


def test_asof_join_single_shuffle_no_python(spark):
    """events_asof_join must stay the union-tag + ONE-window-pass plan:
    a single user_id exchange above the two scans (AQE may add a final
    rebalance for the output sort, so the assertion counts exchanges
    BELOW the Window node), no real Join operator, no Python."""
    from curator_spark.ops import relational

    plan = _plan(relational.events_asof_join(spark, SF_DIR))
    assert "Window" in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "MapInPandas", "BatchEvalPython"):
        assert node not in plan
    below_window = plan.split("Window", 1)[1]
    assert "hashpartitioning(user_id" in below_window


def test_range_join_is_equi_bucketed(spark):
    """events_range_join must compile to an EQUI join on (user_id,
    bucket) — never the BroadcastNestedLoopJoin the naive inequality
    form produces."""
    from curator_spark.ops import relational

    plan = _plan(relational.events_range_join(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan and "bucket" in plan
